"""Adaptive re-probe recall/scan frontier on the ADVERSARIAL 1M fixture
(r9 VERDICT item 2): rotated-replica embeddings are the distribution
where static probing measured 0.848 @ np8 / 0.881 @ np32 (replicated
x7.99, r9 PERF.md) — the gap to the reference's 0.9931 @ ef=64. This
script measures what query-adaptive expansion (triangle bound on
per-list covering radii, graphann.shard_graph_search_adaptive) buys at
matched scan budgets, and records the recall-vs-effective-probes
frontier either way.

Run (fixture: SPARK_GRAFT_SCALE_REPLICAS=1000 SPARK_GRAFT_SCALE_TABLES=embeddings
     SPARK_GRAFT_SF1_DIR=/tmp/nvdb_2m python tests/make_sf1.py):
    python tests/adaptive_probe_sweep.py [n_vecs] [nlist] [replicas] [eps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SHARD_ADVERSARIAL", "/tmp/nvdb_2m")
N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NLIST = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
EPS = float(sys.argv[4]) if len(sys.argv) > 4 else 0.15
EF = int(os.environ.get("SPARK_GRAFT_SHARD_EF", "128"))
K_GRAPH = 16
_STRIDE = 1_000_000


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import graphann
    from nano_vectordb_spark.operators import sample as sample_ops
    from nano_vectordb_spark.operators.gt import gt_build, recall_at_k
    from nano_vectordb_spark.operators.ivf import ivf_build, ivf_replicate
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-adaptive-sweep", cpus="32")
    t0 = time.time()
    all_emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    per_replica = all_emb.filter(F.col("vec_id") < _STRIDE).count()
    n_replicas = -(-N_VECS // per_replica)
    emb = (
        all_emb.filter(F.col("vec_id") < n_replicas * _STRIDE)
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    print(f"fixture: {n} adversarial rotated-replica vectors in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    idx = ivf_build(emb, nlist=NLIST)
    idx.assigned = idx.assigned.persist()
    n_single = idx.assigned.count()
    print(f"ivf_build nlist={NLIST}: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    rep = ivf_replicate(idx, replicas=REPLICAS, eps=EPS)
    rep.assigned = rep.assigned.persist()
    factor = rep.assigned.count() / n_single
    print(f"ivf_replicate r={REPLICAS} eps={EPS}: factor {factor:.3f} in {time.time()-t0:.1f}s", flush=True)

    queries = sample_ops.sample_queries(emb, 100, seed=42).select(
        "query_id", "embedding"
    )
    t0 = time.time()
    gt = gt_build(emb, queries, k=10, metric="l2").persist()
    gt.count()
    print(f"gt_build: {time.time()-t0:.1f}s", flush=True)

    def pids(pred):
        return pred.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("pred_ids")
        )

    for label, index in (("single", idx), ("replicated", rep)):
        t0 = time.time()
        g = graphann.shard_graph_build(index, k=K_GRAPH).persist()
        n_edges = g.count()
        print(f"[{label}] shard graph: {n_edges} edges in {time.time()-t0:.1f}s", flush=True)
        for nprobe in (8, 16, 32):
            t0 = time.time()
            pred = graphann.shard_graph_search(
                index, g, queries, k=10, ef=EF, nprobe=nprobe
            )
            r = recall_at_k(gt, pids(pred), 10).first()
            print(
                f"[{label}] STATIC   np={nprobe:<3}          recall@10 = "
                f"{r['recall_at_k']:.4f} ({time.time()-t0:.1f}s)",
                flush=True,
            )
        for np_init, np_max in ((8, 16), (8, 32), (8, 64), (16, 64)):
            t0 = time.time()
            pred, st = graphann.shard_graph_search_adaptive(
                index, g, queries, k=10, ef=EF, nprobe=np_init,
                nprobe_max=np_max, return_stats=True,
            )
            r = recall_at_k(gt, pids(pred), 10).first()
            print(
                f"[{label}] ADAPTIVE np={np_init}->max{np_max:<3} recall@10 = "
                f"{r['recall_at_k']:.4f} mean_probes={st['mean_probes']:.1f} "
                f"expanded={st['expanded_queries']} ({time.time()-t0:.1f}s)",
                flush=True,
            )
        g.unpersist()


if __name__ == "__main__":
    main()
