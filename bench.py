#!/usr/bin/env python
"""Benchmark harness (reference O34, apps/nvdb_bench.cpp:254-432).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference harness shape: warmup pass to prime caches
(apps/nvdb_bench.cpp:317-322), then timed runs that fully materialize
results (anti-DCE: we count+collect, apps/nvdb_bench.cpp:332,358).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the reference's own benchmark surface (flat scan /
# quantized scan / ANN+refine) plus one representative from each
# pipeline-extension family (dedup, text, relational, streaming).
BENCH_QUERIES = (
    "topk_dot",
    "topk_multi_twophase",
    "topk_multi_window",
    "topk_i8",
    "refine_i8",
    "gt_build",
    "ivf_search",
    "minhash_lsh_pairs",
    "simhash64_pairs",
    "corpus_clean",
    "pipeline_chunks_embed",
    "pricing_summary",
    "shipping_priority",
    "stream_event_counts",
)


def main() -> None:
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-bench", cpus=CPUS)

    # warmup: prime the file cache + JVM + Python UDF workers (the
    # reference warmup loop primes the same per-process one-time costs)
    for t in ("embeddings", "documents"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    import pandas as pd  # noqa: F401  (workers import it on first use)

    spark.range(int(CPUS) * 4, numPartitions=int(CPUS)).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # REPS timed runs per query, report the min — the reference harness
    # also loops timed runs per config (apps/nvdb_bench.cpp:332,358);
    # min is the standard de-noised single-node estimator.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry.REGISTRY[name].fn
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()  # materialize the full result
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
