"""Sharded graph-ANN recall ABOVE the broadcast clamp, with and
without SPANN boundary replication (r8 VERDICT item 2).

The r6 sf10 sweep measured shard_graph_search recall capped at the
IVF coarse-probe ceiling (0.530 @ nprobe=8, 0.831 @ nprobe=32 of
nlist=256): a true neighbor in an unprobed list is unreachable no
matter how good the per-list graph is. ivf_replicate multi-assigns
each vector to its top centroids within (1+eps) of the nearest
(operators/ivf.py — SPANN's closure assignment, Chen et al. NeurIPS
2021 §4.1), so the probed lists already CONTAIN the frontier; this
script measures how far that lifts the ceiling at ≥1M realistic
nodes (hash-projection embeddings of scale-fixture document text —
the engine's own O33 encode step, same fixture recipe as
graph_recall_realistic.py).

Run (after SPARK_GRAFT_SCALE_REPLICAS=200 SPARK_GRAFT_SCALE_TABLES=documents
     SPARK_GRAFT_SF1_DIR=/tmp/nvdb_docs1m python tests/make_sf1.py):
    python tests/shard_recall_replicated.py [n_docs] [nlist] [replicas] [eps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/nvdb_docs1m")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NLIST = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
EPS = float(sys.argv[4]) if len(sys.argv) > 4 else 0.15
DIM = 64
EF = int(os.environ.get("SPARK_GRAFT_SHARD_EF", "128"))
K_GRAPH = 16
_STRIDE = 1_000_000  # make_sf1 doc_id replica stride


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import graphann
    from nano_vectordb_spark.operators import sample as sample_ops
    from nano_vectordb_spark.operators import textops
    from nano_vectordb_spark.operators.gt import gt_build, recall_at_k
    from nano_vectordb_spark.operators.ivf import ivf_build, ivf_replicate
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-shard-recall-replicated", cpus="32")
    t0 = time.time()
    if os.environ.get("SPARK_GRAFT_SHARD_ADVERSARIAL"):
        # rotated-replica embeddings (near-uniform, no cluster growth
        # with n) — the distribution where r6 measured the IVF probe
        # ceiling (0.530 @ np8); replication must lift THIS case
        src = os.environ["SPARK_GRAFT_SHARD_ADVERSARIAL"]
        all_emb = spark.read.parquet(f"{src}/embeddings.parquet")
        per_replica = all_emb.filter(F.col("vec_id") < _STRIDE).count()
        n_replicas = -(-N_DOCS // per_replica)
        emb = (
            all_emb.filter(F.col("vec_id") < n_replicas * _STRIDE)
            .select("vec_id", "embedding")
            .persist()
        )
        n = emb.count()
        print(f"fixture: {n} ADVERSARIAL rotated-replica vectors in {time.time()-t0:.1f}s")
    else:
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        per_replica = docs.filter(F.col("doc_id") < _STRIDE).count()
        n_replicas = -(-N_DOCS // per_replica)  # ceil
        picked = docs.filter(F.col("doc_id") < n_replicas * _STRIDE)
        emb = (
            textops.hash_embed(picked, DIM, text_col="text")
            .filter(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) > 0)
            .select(F.col("doc_id").alias("vec_id"), "embedding")
            .persist()
        )
        n = emb.count()
        print(f"fixture: {n} hash-embedded docs (dim={DIM}) in {time.time()-t0:.1f}s")

    t0 = time.time()
    idx = ivf_build(emb, nlist=NLIST)
    idx.assigned = idx.assigned.persist()
    n_single = idx.assigned.count()
    print(f"ivf_build nlist={NLIST}: {time.time()-t0:.1f}s")

    single_only = bool(os.environ.get("SPARK_GRAFT_SHARD_SINGLE_ONLY"))
    if single_only:
        rep = None
    else:
        t0 = time.time()
        rep = ivf_replicate(idx, replicas=REPLICAS, eps=EPS)
        rep.assigned = rep.assigned.persist()
        n_rep = rep.assigned.count()
        print(
            f"ivf_replicate replicas={REPLICAS} eps={EPS}: factor "
            f"{n_rep/n_single:.3f} in {time.time()-t0:.1f}s"
        )

    queries = sample_ops.sample_queries(emb, 100, seed=42).select(
        "query_id", "embedding"
    )
    t0 = time.time()
    gt = gt_build(emb, queries, k=10, metric="l2").persist()
    gt.count()
    print(f"gt_build: {time.time()-t0:.1f}s")

    variants = (("single", idx),) if single_only else (
        ("single", idx), ("replicated", rep)
    )
    for label, index in variants:
        t0 = time.time()
        g = graphann.shard_graph_build(index, k=K_GRAPH).persist()
        n_edges = g.count()
        print(f"[{label}] shard graph: {n_edges} edges in {time.time()-t0:.1f}s")
        for nprobe in (8, 16, 32):
            t0 = time.time()
            pred = graphann.shard_graph_search(
                index, g, queries, k=10, ef=EF, nprobe=nprobe
            )
            pids = pred.groupBy("query_id").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                    lambda s: s["vec_id"],
                ).alias("pred_ids")
            )
            r = recall_at_k(gt, pids, 10).first()
            print(
                f"[{label}] nprobe={nprobe} ef={EF}: recall@10 = "
                f"{r['recall_at_k']:.4f} ({time.time()-t0:.1f}s)",
                flush=True,
            )
        g.unpersist()


if __name__ == "__main__":
    main()
