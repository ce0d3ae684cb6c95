"""Third scaling decade (r5 VERDICT item 5): bench the DATA-BOUND
family at sf100 — documents+events only (the fixture
tests/make_sf1.py builds with SPARK_GRAFT_SCALE_TABLES=documents,
events, SPARK_GRAFT_SCALE_REPLICAS=1000 → /tmp/nvdb_sf100, ~5M docs /
100M events).

sf10 showed most queries are fixed-overhead-bound at local scale;
the dedup/text family is where work actually grows with data (banded
LSH shuffles, signature scans, token pipelines), so the third decade
stresses exactly those shuffle sizes. Prints one JSON line
{entry: sec} (min-of-N, default 2).

Run: python tests/sf100_bench.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/nvdb_sf100")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

# the data-bound set: every entry here reads ONLY documents or events
DATA_BOUND_ENTRIES = (
    # dedup family — banded/bucketed joins whose shuffle grows with data
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash64_pairs",
    "dedup_components",
    # text pipeline — token explode + aggregates
    "token_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "repetition_stats",
    "token_length_histogram",
    # events/streaming — watermark agg + sessionize at 100M events
    "stream_event_counts",
    "events_sessionize",
    "stream_heavy_hitters",
)


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    if not os.path.exists(os.path.join(SF100, "_DONE")):
        print(f"sf100 fixture missing — build it first ({SF100})")
        sys.exit(2)

    from nano_vectordb_spark import registry
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-sf100-bench", cpus="32")
    for t in ("documents", "events"):
        spark.read.parquet(f"{SF100}/{t}.parquet").count()  # warm file cache

    names = tuple(sys.argv[1:]) or DATA_BOUND_ENTRIES
    timings: dict[str, float] = {}
    for name in names:
        fn = registry.REGISTRY[name].fn
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, SF100)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(best, 2)
        print(f"{name:28s} {timings[name]:8.2f}s  ({n} rows)", flush=True)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
