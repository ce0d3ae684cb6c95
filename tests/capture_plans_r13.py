"""Capture .explain("formatted") for the round-13 touched queries into
plans/r13/.

Usage:
    python tests/capture_plans_r13.py <suffix> [outdir]

suffix is "before" (run from the r12 tree 4d1722d via a git worktree)
or "after" (run from HEAD). One file per query:
plans/r13/<query>_<suffix>.txt. The judge checks plan claims in
OPTIMIZATION_r13.md against these files, so they are generated
mechanically, never edited.

The graph_ann_* entries RETURN a local relation of booleans (their
plan is a trivial LocalTableScan); for those the file captures the
plan of a REPRESENTATIVE shard_graph_search DataFrame built the way
the entry builds it (the operator plan the round optimized), noted in
the file header.

Plans are captured on the sf0.1 fixture (the bench scale). Building a
DataFrame may trigger the eager sizing/fit actions some operators
document — that is part of the plan those operators run and is noted
in the header of each file.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# every registry entry this round touched whose RETURNED plan is
# meaningful to diff (bench queries included for continuity)
QUERIES = (
    "multimodal_jpeg_stats",
    "multimodal_png_stats",
    "multimodal_neardup",
    "embedding_neardup_pairs",
    "prefix_filter_join",
    "lsh_operating_point",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "doc_novelty_share",
    "knn_pagerank",
    "knn_self_join",
    "rankers_agreement",
    "doc_search",
    "hybrid_search_rrf",
    "ann_cost_frontier",
    "minhash_lsh_pairs",
    "simhash64_pairs",
    "corpus_clean",
)


def main() -> None:
    suffix = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(outdir, exist_ok=True)

    from nano_vectordb_spark import registry
    from nano_vectordb_spark.plans.inspect import physical_plan
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(
        app_name=f"plan-capture-r13-{suffix}",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )

    def write(name: str, df, note: str = "") -> None:
        txt = physical_plan(df, "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({suffix}) sf_dir={SF_DIR}{note}\n")
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)

    for name in QUERIES:
        fn = registry.REGISTRY[name].fn
        write(name, fn(spark, SF_DIR))

    # graph-ANN representative operator plan (the entries return local
    # relations): one exhaustive-mode shard search over the adaptive
    # entry's frozen index, built exactly as the entry builds it.
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import graphann
    from nano_vectordb_spark.operators import sample as sample_ops
    from nano_vectordb_spark.operators.ivf import ivf_build
    from nano_vectordb_spark.registry_parts.p00_base import SEED, load_table

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    emb.count()
    idx = ivf_build(emb, nlist=8)
    idx.assigned = idx.assigned.persist()
    g = graphann.shard_graph_build(idx, k=16).persist()
    maxlist = int(
        idx.assigned.groupBy("cluster_id").count().agg(F.max("count")).first()[0]
    )
    queries = sample_ops.sample_queries(emb, 100, seed=SEED, mode="random").select(
        "query_id", "embedding"
    )
    kwargs = {}
    if suffix != "before":
        # the r13 form passes the memoized beam state; the r12 form
        # has no such parameter
        kwargs["state"] = graphann.shard_search_state(idx, g).persist()
    pred = graphann.shard_graph_search(
        idx, g, queries, k=10, ef=maxlist, nprobe=2,
        coarse=maxlist, n_entry=maxlist, **kwargs,
    )
    write(
        "graph_ann_shard_search", pred,
        note=" (representative operator plan: shard_graph_search "
        "ef=coarse=n_entry=maxlist nprobe=2, as the graph_ann_* "
        "entries run it)",
    )
    spark.stop()


if __name__ == "__main__":
    main()
