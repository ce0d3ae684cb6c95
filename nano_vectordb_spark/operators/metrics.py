"""Latency / throughput / recall metrics aggregation.

Reference surface (SURVEY.md §2.1):
  O18 latency stats: sorted percentiles with linear interpolation
      (p50/p95/p99), avg, QPS (apps/nvdb_bench.cpp:368-408,
       apps/nvdb_ivf_eval.cpp:136-168)
  O19 bytes/query + effective bandwidth (apps/nvdb_bench.cpp:414-423)

Spark's exact ``percentile`` aggregate uses the same linear
interpolation as the reference's hand-rolled quantiles (and DuckDB's
quantile_cont), so values match bit-for-bit. ``percentile_approx`` is
offered for the 100 TB path where an exact sort per group is not worth
it (SURVEY.md §2.2 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latency_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-group latency stats: n, p50/p95/p99, avg (rounded: averages
    are summation-order dependent), qps = n / total_seconds assuming
    the value column is milliseconds.

    Percentiles carry the repo's round-6 contract: the interpolation
    between adjacent DOUBLE-valued order statistics is computed as
    (1-f)*a + f*b by Spark but a + (b-a)*f by DuckDB — identical in
    real arithmetic, one ulp apart in floats once the rank fraction f
    is long (caught by the r5 sf1 parity run at n≈200k; integer-valued
    columns like doc lengths don't hit it at these magnitudes)."""
    g = df.groupBy(*(group_cols or []))
    pct = F.percentile(value_col, F.lit([0.5, 0.95, 0.99])) if exact else (
        F.percentile_approx(value_col, F.lit([0.5, 0.95, 0.99]))
    )
    out = g.agg(
        F.count("*").alias("n"),
        pct.alias("__pct"),
        F.round(F.avg(value_col), 6).alias("avg_ms"),
    )
    return out.select(
        *(group_cols or []),
        "n",
        F.round(F.col("__pct")[0], 6).alias("p50"),
        F.round(F.col("__pct")[1], 6).alias("p95"),
        F.round(F.col("__pct")[2], 6).alias("p99"),
        "avg_ms",
        F.round(F.col("n") / (F.col("avg_ms") * F.col("n") / 1000.0), 6).alias("qps"),
    )


def bytes_per_query(
    n_rows: int, dim: int, dtype_bytes: int, with_i8_scales: bool = False
) -> int:
    """Payload bytes a single full scan reads (reference O19,
    vecbin_format.h:45-59): rows * dim * width (+ 4-byte scale per row
    for int8)."""
    total = n_rows * dim * dtype_bytes
    if with_i8_scales:
        total += 4 * n_rows
    return total


def effective_bandwidth_gbps(payload_bytes: int, avg_latency_ms: float) -> float:
    """bytes/query / avg latency, in GB/s (reference O19)."""
    return payload_bytes / (avg_latency_ms / 1000.0) / 1e9
