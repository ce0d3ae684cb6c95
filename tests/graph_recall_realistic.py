"""Graph-ANN recall at 200k nodes on a REALISTICALLY CLUSTERED fixture
(r6 VERDICT item 5a).

The r6 sf10 ladder measured recall@10 = 0.862 @ ef=64 at 200k nodes on
the rotated-replica embeddings — a deliberately adversarial
near-uniform distribution (rotations preserve the pairwise-distance
histogram, so cluster structure never grows with n). The reference's
0.98 band (Performance.md §5) is measured on real-embedding
distributions, which cluster. This script substantiates that claim by
building the SAME graph (operators/graphann.build_knn_graph, default
auto-coverage) over embeddings with realistic cluster structure:
hash-projection embeddings of the scale fixture's document text —
exactly the O33 pipeline's encode step (operators/textops.hash_embed),
so the distribution is "what this engine's own text pipeline feeds the
ANN index", not a synthetic favorable case.

Run (after SPARK_GRAFT_SF1_DIR=/tmp/nvdb_sf10 SPARK_GRAFT_SCALE_REPLICAS=100
     python tests/make_sf1.py):
    python tests/graph_recall_realistic.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/nvdb_sf10")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = 64
# doc_id replica stride in make_sf1 (_OFFSETS["documents"]["doc_id"])
_STRIDE = 1_000_000


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import graphann
    from nano_vectordb_spark.operators import sample as sample_ops
    from nano_vectordb_spark.operators import textops
    from nano_vectordb_spark.operators.gt import gt_build, recall_at_k
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-graph-recall-realistic", cpus="32")
    docs = spark.read.parquet(f"{SF10}/documents.parquet")
    per_replica = docs.filter(F.col("doc_id") < _STRIDE).count()
    n_replicas = -(-N_DOCS // per_replica)  # ceil
    picked = docs.filter(F.col("doc_id") < n_replicas * _STRIDE)

    t0 = time.time()
    emb = (
        textops.hash_embed(picked, DIM, text_col="text")
        .filter(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .persist()
    )
    n = emb.count()
    t_embed = time.time() - t0
    print(f"fixture: {n} hash-embedded docs (dim={DIM}) in {t_embed:.1f}s")

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
