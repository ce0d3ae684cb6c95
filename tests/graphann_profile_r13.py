"""Phase-level profile of graph_ann_adaptive_probe /
graph_ann_replicated at sf0.1 (guide §1: measure the cost split before
touching the checkpointed beam loop).

Usage: python tests/graphann_profile_r13.py [adaptive|replicated|...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_T0 = time.time()
_LAST = [time.time()]


def mark(label: str) -> None:
    now = time.time()
    print(f"  {label}: +{now - _LAST[0]:.2f}s (t={now - _T0:.1f}s)", flush=True)
    _LAST[0] = now


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "adaptive"

    from pyspark.sql import functions as F

    from nano_vectordb_spark import registry
    from nano_vectordb_spark.operators import graphann
    from nano_vectordb_spark.operators import sample as sample_ops
    from nano_vectordb_spark.operators.gt import gt_build, recall_at_k
    from nano_vectordb_spark.operators.ivf import ivf_build
    from nano_vectordb_spark.registry_parts.p00_base import SEED, load_table
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="graphann-profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mark("session")

    if which == "entry":
        # whole-entry timing, 3 reps (first = cold incl. index build)
        for name in ("graph_ann_adaptive_probe", "graph_ann_replicated",
                     "graph_ann_sharded", "graph_ann_recall"):
            for rep in range(3):
                t0 = time.time()
                df = registry.REGISTRY[name].fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                print(f"{name} rep{rep}: {time.time() - t0:.2f}s", flush=True)
        spark.stop()
        return

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").persist()
    emb.count()
    mark("emb persist+count")
    idx = ivf_build(emb, nlist=8)
    idx.assigned = idx.assigned.persist()
    mark("ivf_build")
    g = graphann.shard_graph_build(idx, k=16).persist()
    g.count()
    mark("shard_graph_build + count")
    maxlist = int(idx.assigned.groupBy("cluster_id").count().agg(F.max("count")).first()[0])
    mark(f"maxlist probe ({maxlist})")

    queries = sample_ops.sample_queries(emb, 100, seed=SEED, mode="random").select(
        "query_id", "embedding"
    )
    mark("sample_queries build")
    gt = gt_build(emb, queries, k=10, metric="l2")
    gt.count()
    mark("gt_build + count")

    def pred_ids(pred):
        return pred.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("pred_ids")
        )

    for np_init in (1, 2):
        print(f"-- np_init={np_init}", flush=True)
        exact_pred, st = graphann.shard_graph_search_adaptive(
            idx, g, queries, k=10, ef=maxlist, nprobe=np_init,
            nprobe_max=idx.nlist, n_entry=maxlist, coarse=maxlist,
            return_stats=True,
        )
        mark("adaptive exact: build (incl. eager work)")
        (
            gt.join(pred_ids(exact_pred), "query_id")
            .filter(F.col("gt_ids") != F.col("pred_ids"))
            .count()
        )
        mark("adaptive exact: diff count")
        static_pred = graphann.shard_graph_search(idx, g, queries, k=10, ef=64, nprobe=np_init)
        mark("static: build")
        recall_at_k(gt, pred_ids(static_pred), 10).first()
        mark("static: recall first()")
        budget = min(np_init + 2, idx.nlist)
        adapt_pred = graphann.shard_graph_search_adaptive(
            idx, g, queries, k=10, ef=64, nprobe=np_init, nprobe_max=budget
        )
        mark("adaptive budget: build (incl. eager work)")
        recall_at_k(gt, pred_ids(adapt_pred), 10).first()
        mark("adaptive budget: recall first()")
    spark.stop()


if __name__ == "__main__":
    main()
