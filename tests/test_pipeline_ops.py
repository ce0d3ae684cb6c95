"""Semantic invariants for the training-pipeline operators
(operators/pipeline.py, operators/lexical.py) — the cross-engine value
parity is covered by test_oracle_parity; these pin the *contracts*:
stratum counts, mixture realization error, pack budget discipline,
BM25 ranking sanity, and partitioning-independence of the packing fold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.operators import lexical, pipeline
from nano_vectordb_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return (
        load_table(spark, SF_CORRECT, "documents")
        .withColumn(
            "n_tokens",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).cast("long"),
        )
        .cache()
    )


def test_stratified_sample_counts_and_membership(spark, docs):
    n = 15
    s = pipeline.stratified_sample(docs, "lang", n).cache()
    per = {r["lang"]: r["c"] for r in s.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    sizes = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, c in per.items():
        assert c == min(n, sizes[lang])
    # sample is a subset of the source (anti join empty)
    assert s.join(docs, "doc_id", "left_anti").count() == 0
    # seeded -> rerun identical
    again = pipeline.stratified_sample(docs, "lang", n)
    assert s.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_stratified_sample_seed_changes_sample(spark, docs):
    a = pipeline.stratified_sample(docs, "lang", 10, seed=1).select("doc_id")
    b = pipeline.stratified_sample(docs, "lang", 10, seed=2).select("doc_id")
    assert a.exceptAll(b).count() > 0


def test_mixture_weights_invariants(spark, docs):
    shares = {f"src{i}": float(i + 1) for i in range(20)}
    w = pipeline.mixture_weights(docs, shares).toPandas()
    assert len(w) == 20
    assert abs(w.natural_share.sum() - 1.0) < 1e-9
    assert abs(w.target_share.sum() - 1.0) < 1e-9
    # downsample-only: all rates in (0, 1], and exactly one source at 1.0
    assert (w.keep_rate > 0).all() and (w.keep_rate <= 1.0).all()
    assert (w.keep_rate == 1.0).sum() == 1


def test_mixture_sample_realizes_target(spark, docs):
    """After thinning, the realized token mixture should be close to the
    target shares (hash-Bernoulli noise at ~5k docs: allow 3x relative)."""
    shares = {f"src{i}": float(i + 1) for i in range(20)}
    w = pipeline.mixture_weights(docs, shares)
    s = pipeline.mixture_sample(docs, w)
    got = {
        r["source"]: r["t"]
        for r in s.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    total = sum(got.values())
    tgt_total = sum(shares.values())
    devs = []
    for src, weight in shares.items():
        target = weight / tgt_total
        realized = got.get(src, 0) / total
        devs.append((target, abs(realized - target) / target))
        # per-doc Bernoulli realization measured in tokens: only sources
        # keeping enough docs have low variance — assert tightly there
        if target >= 0.04:
            assert realized == pytest.approx(target, rel=0.55), (src, realized, target)
    # aggregate: target-weighted mean relative deviation is small
    assert sum(t * d for t, d in devs) / sum(t for t, _ in devs) < 0.25


def test_pack_sequences_budget_and_coverage(spark, docs):
    budget, buckets = 256, 8
    p = pipeline.pack_sequences(docs, budget, buckets).toPandas()
    # every doc packed exactly once
    packed_ids = [int(d) for row in p.doc_ids for d in row.split(",")]
    assert sorted(packed_ids) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # a pack over budget must be a single oversize doc
    over = p[p.pack_tokens > budget]
    assert (over.n_docs == 1).all()
    # greedy packing should fill reasonably: mean fill >= 60% of budget
    normal = p[p.pack_tokens <= budget]
    assert normal.pack_tokens.mean() >= 0.6 * budget
    # pack ids are dense 0..max per bucket
    for b, grp in p.groupby("bucket"):
        assert sorted(grp.pack_id) == list(range(len(grp)))


def test_pack_sequences_partitioning_independent(spark, docs):
    """The fold is defined over the bucket's sorted doc list, so the
    result must not depend on the input partitioning."""
    a = pipeline.pack_sequences(docs, 256, 4)
    b = pipeline.pack_sequences(docs.repartition(13), 256, 4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bm25_ranks_matching_docs(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    res = lexical.bm25_search(
        spark, docs, [(0, ["hash", "join"])], k=5
    ).collect()
    assert 0 < len(res) <= 5
    assert all(r["score"] > 0 for r in res)
    # every hit actually contains a query term; ranks are 1..n by score desc
    top_ids = [r["doc_id"] for r in res]
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(top_ids)).collect()
    }
    for r in res:
        toks = texts[r["doc_id"]].split()
        assert "hash" in toks or "join" in toks
    scores = [r["score"] for r in sorted(res, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_bm25_rare_term_outweighs_common(spark):
    """idf ordering: a doc matching only a rarer term must outscore a
    doc matching only a more common term, at equal tf and length."""
    rows = [(0, "alpha beta beta beta")] + [(i, "beta gamma delta eps") for i in range(1, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = lexical.bm25_search(spark, docs, [(0, ["alpha", "beta"])], k=9)
    top = res.filter(F.col("rank") == 1).first()
    assert top["doc_id"] == 0  # 'alpha' appears in 1/9 docs -> dominates


def test_user_value_ewma_recurrence_and_segment_merge(spark, tmp_path):
    """Pin the EWMA recurrence on a hand corpus, and verify the
    docstring's scale claim: the recurrence merges by segments via
    (contribution, decay^len) combination."""
    import datetime as dt

    from nano_vectordb_spark import registry

    a = 0.25
    xs = [10.0, 2.0, 4.0, 8.0, 1.0]
    rows = [
        (i, dt.datetime(2025, 1, 1, 0, i), 7, "click", x, "{}")
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = registry.REGISTRY["user_value_ewma"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_events"] == 5

    y = xs[0]
    for x in xs[1:]:
        y = a * x + (1 - a) * y
    assert out[0]["ewma_value"] == y

    # segment merge: fold [x0,x1,x2] and [x3,x4] separately, combine as
    # y = y_R + decay^n_R * (y_L - y_R_seeded_contribution) ... i.e. the
    # right segment folded with seed y_L equals the full fold; and the
    # seedless combination uses contribution + decay^len:
    def fold(seed, seg):
        acc = seed
        for x in seg:
            acc = x if acc is None else a * x + (1 - a) * acc
        return acc

    y_l = fold(None, xs[:3])
    assert fold(y_l, xs[3:]) == fold(None, xs)
    # (contrib, decay) pair form: seg -> (fold with seed 0, (1-a)^len)
    contrib_r = fold(0.0, xs[3:])
    decay_r = (1 - a) ** len(xs[3:])
    assert abs((contrib_r + decay_r * y_l) - fold(None, xs)) < 1e-12
