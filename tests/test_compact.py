"""Small-files compaction (sources/compact.py): lossless rewrite,
file-count planning, and the streaming-read motivation."""

from __future__ import annotations

import glob
import os

from nano_vectordb_spark.sources.compact import (
    compact_table,
    plan_compaction,
)
from tests.conftest import SF_CORRECT


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "*"))
        if not os.path.basename(f).startswith(("_", "."))
    ]


def test_plan_compaction_sizes_by_bytes(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    for i in range(10):
        (d / f"part-{i}.bin").write_bytes(b"x" * (1 << 20))  # 10 MB total
    assert plan_compaction(str(d), target_mb=4) == 3
    assert plan_compaction(str(d), target_mb=128) == 1


def test_compact_roundtrip_is_lossless(spark, tmp_path):
    """Compacted events table: identical rows (full-row hash), raw
    schema preserved, and the many->few file-count contract."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "frag")
    os.makedirs(src)
    # fragment sf0.01 events into many small files first
    orig = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    orig.repartition(40).write.parquet(os.path.join(src, "events.parquet"))
    assert len(_data_files(os.path.join(src, "events.parquet"))) == 40

    dst = str(tmp_path / "compact")
    out = compact_table(spark, src, dst, "events", target_mb=128)
    assert len(_data_files(os.path.join(dst, "events.parquet"))) == 1
    assert out.schema == orig.schema

    def row_fingerprint(df):
        cols = sorted(df.columns)
        return (
            df.select(
                F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
                .alias("h")
            )
            .agg(
                F.count("*").alias("n"),
                # order-independent: xor-free sum of hash prefixes
                F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)"))
                .alias("s"),
            )
            .first()
        )

    a, b = row_fingerprint(orig), row_fingerprint(out)
    assert (a.n, a.s) == (b.n, b.s)


def test_compact_stats_entry_vs_oracle(spark, duck):
    """The compact_stats registry entry through the exact driver-gate
    comparison (r6 VERDICT item 8 queued it; REGISTERED in r8 inside
    the gate window, per the standing rotation rule)."""
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.registry_parts.p14_analytics_ops import (
        _SQL_COMPACT_STATS,
        compact_stats,
    )
    from tests.oracle_harness import compare

    assert "compact_stats" in registry.GATE_BASKET_R8_NEW
    df = compact_stats(spark, SF_CORRECT)
    ok, msg = compare(df, duck, _SQL_COMPACT_STATS)
    assert ok, msg
