"""Graph-ANN build/search wall-time profile (r7 VERDICT item 3).

Builds the realistic hash-embed fixture at a chosen node count from
sf0.1 documents (50k docs — no scale fixture needed) or from the sf10
fixture via tests/graph_recall_realistic.py for the 200k headline, and
times the build phases plus the search ladder. Used to verify the r8
optimizations (CSR beam search, broadcast-hash joins in the repair
rounds) against the r7 baselines: 492.6 s build / 9.8-87.3 s searches
at 200k nodes.

Run: python tests/graph_build_profile.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_PROFILE_SRC", "/root/testdata/sf0.1")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
DIM = 64


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import graphann
    from nano_vectordb_spark.operators import sample as sample_ops
    from nano_vectordb_spark.operators import textops
    from nano_vectordb_spark.operators.gt import gt_build, recall_at_k
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-graph-build-profile", cpus="32")
    docs = spark.read.parquet(f"{SRC}/documents.parquet").limit(N_DOCS)

    t0 = time.time()
    emb = (
        textops.hash_embed(docs, DIM, text_col="text")
        .filter(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .persist()
    )
    n = emb.count()
    print(f"fixture: {n} hash-embedded docs (dim={DIM}) in {time.time()-t0:.1f}s")

    t0 = time.time()
    g = graphann.build_knn_graph(emb, k=16).persist()
    n_edges = g.count()
    t_build = time.time() - t0
    print(f"graph: {n_edges} edges in {t_build:.1f}s")

    queries = sample_ops.sample_queries(emb, 100, seed=42).select(
        "query_id", "embedding"
    )
    gt = gt_build(emb, queries, k=10, metric="l2")
    t0 = time.time()
    idx = graphann.graph_collect(g, emb)
    print(f"index collect: {time.time() - t0:.1f}s")
    for ef in (64, 128, 256):
        t0 = time.time()
        pred = graphann.graph_search(g, emb, queries, k=10, ef=ef, index=idx)
        pids = pred.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("pred_ids")
        )
        r = recall_at_k(gt, pids, 10).first()
        print(
            f"ef={ef}: recall@10={float(r['recall_at_k']):.4f} "
            f"n_queries={int(r['n_queries'])} ({time.time() - t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
