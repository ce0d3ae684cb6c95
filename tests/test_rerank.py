"""MMR diversified rerank: behavioral checks on planted near-dups."""

from __future__ import annotations

from nano_vectordb_spark.operators.rerank import mmr_rerank


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_mmr_prefers_diversity_over_redundancy(spark):
    # candidates: two near-identical vectors aligned with the query
    # (ids 1, 2) and one orthogonal zero-score vector (id 3). With
    # lambda=0.5 the near-dup's objective is 0.5*(0.999 - ~1) < 0 while
    # the orthogonal one's is 0.5*(0 - 0) = 0, so diversity wins.
    base = _df(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.001]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    queries = _df(
        spark, [(0, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    out = mmr_rerank(base, queries, k=2, pool=3).orderBy("mmr_rank").collect()
    # rank 1 is always the pure-relevance winner
    assert out[0].vec_id == 1 and out[0].mmr_rank == 1
    # pure top-2 would take the near-duplicate (id 2); MMR takes the
    # diverse candidate instead
    assert out[1].vec_id == 3


def test_mmr_rank1_matches_topk_and_is_deterministic(spark):
    from nano_vectordb_spark.operators.topk import topk_multi
    from nano_vectordb_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.limit(3).selectExpr("vec_id AS query_id", "embedding")
    a = mmr_rerank(emb, q, k=5, pool=20)
    b = mmr_rerank(emb.repartition(7), q, k=5, pool=20)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb  # partition-independent
    top1 = {
        (r.query_id, r.vec_id)
        for r in topk_multi(emb, q, 1).collect()
    }
    mmr1 = {(r.query_id, r.vec_id) for r in a.collect() if r.mmr_rank == 1}
    assert mmr1 == top1  # rank 1 is the pure-relevance winner
