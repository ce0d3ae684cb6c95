"""Small-files compaction — the ingest-maintenance op the r6 sf100
decade run showed is a production prerequisite for streaming replays.

Measured motivation (PERF.md round 6): the sf100 fixture ships events
as 1000 x 1.6 MB parquet files; the streaming file source pays
per-file task overhead that batch scans avoid by bin-packing
(spark.sql.files.maxPartitionBytes), so stream_event_counts took
46 s over the raw layout vs 9.15 s over the same rows compacted to
44 x 36 MB files. At 100 TB this is the OPTIMIZE/bin-packing
compaction step every table-format deployment (Delta/Iceberg/Hudi)
schedules; here it is a plain parquet rewrite sized by bytes.

Scale shape: one distributed read + one round-robin repartition + one
distributed write — a single shuffle whose width is chosen so output
files land near ``target_mb``. No driver-side data movement; the only
driver work is the file-size listing.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    # The size listing is local-filesystem only; a silent 0 here would
    # make plan_compaction funnel an arbitrarily large table through a
    # single output partition, so fail loudly (r6 ADVICE).
    if "://" in path:
        raise ValueError(
            f"_dir_bytes lists the local filesystem only, got URI {path!r}; "
            "plan compaction from a driver-side listing of the object store "
            "(e.g. the table format's file manifest) instead"
        )
    if os.path.isfile(path):
        return os.path.getsize(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no such file or directory: {path!r}")
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(path: str, target_mb: int = 128) -> int:
    """Number of output files so each lands near ``target_mb`` of the
    SOURCE's on-disk (compressed) size. Parquet re-encodes on write, so
    this is an estimate — exact enough for layout hygiene, which only
    needs file sizes within ~2x of target."""
    if target_mb <= 0:
        raise ValueError("target_mb must be positive")
    return max(1, math.ceil(_dir_bytes(path) / (target_mb * (1 << 20))))


def compact_table(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    table: str,
    target_mb: int = 128,
) -> DataFrame:
    """Rewrite ``{src_dir}/{table}.parquet`` into
    ``{dst_dir}/{table}.parquet`` as ~``target_mb`` files. Lossless by
    construction (full-fidelity read -> write of the same rows); the
    round-trip is asserted row-identical in tests/test_compact.py.

    Uses the RAW parquet schema (spark.read on the path), not
    load_table's normalized view, so the rewritten table is
    byte-compatible with whatever readers consumed the original —
    compaction must never change a table's schema contract.
    """
    src = os.path.join(src_dir, f"{table}.parquet")
    dst = os.path.join(dst_dir, f"{table}.parquet")
    n_files = plan_compaction(src, target_mb)
    df = spark.read.parquet(src)
    # round-robin repartition: size-balanced output regardless of the
    # source's partitioning or skew (hash-repartition on a column would
    # inherit that column's skew into the file sizes)
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)
