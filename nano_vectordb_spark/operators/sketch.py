"""Engine-independent HyperLogLog built from native expressions.

A "novel sketch as a composition of built-ins" (pipeline-extension
surface next to the DataSketches-backed entry): the register updates
are pure md5 arithmetic, so any engine with md5 reproduces the sketch
— and the estimate — bit-for-bit. That is what makes it the
oracle-checkable sibling of `distinct_users_sketch` (whose library
estimator internals have no SQL form).

Scale shape (the reason sketches exist at 100 TB):
  * the (group, register) -> max(rho) table IS the sketch; max is
    associative/commutative, so partial aggregation happens map-side
    and re-aggregation (day -> month, partition -> global) never
    rescans raw data;
  * the register table is tiny (m = 2^p rows per group) and the
    estimator is a single second-stage aggregation;
  * the harmonic sum adds dyadic rationals with denominator 2^33 whose
    total stays far below 2^53 — the double sum is EXACT and therefore
    order-independent, which is what lets two engines hash-match it.

Estimator: Flajolet et al. 2007 HLL with the standard small-range
linear-counting correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P_BITS = 12           # 3 hex chars -> 2^12 = 4096 registers
M_REGISTERS = 1 << P_BITS
W_BITS = 32           # 8 hex chars scored for leading zeros
# alpha_m for m >= 128 (Flajolet et al. 2007)
ALPHA = 0.7213 / (1.0 + 1.079 / M_REGISTERS)


def hll_register_expr(key):
    """(register, rho) from md5(key): register = first 3 hex digits,
    rho = leading-zero count of the next 32 bits + 1 (position of the
    highest set bit from the top)."""
    h = F.md5(F.col(key).cast("string"))
    reg = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    w = F.conv(F.substring(h, 4, 8), 16, 10).cast("bigint")
    rho = F.when(w == 0, F.lit(W_BITS + 1)).otherwise(
        F.lit(W_BITS) - F.floor(F.log2(w.cast("double"))).cast("int")
    )
    return reg.alias("hll_register"), rho.cast("int").alias("hll_rho")


def hll_registers(
    df: DataFrame, key: str, group_cols: list[str]
) -> DataFrame:
    """The mergeable sketch: max(rho) per (group, register). Re-merge
    across any partitioning of the input by taking max again."""
    reg, rho = hll_register_expr(key)
    return (
        df.select(*group_cols, reg, rho)
        .groupBy(*group_cols, "hll_register")
        .agg(F.max("hll_rho").alias("hll_rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches that were built over finer groups (e.g. per day)
    down to coarser ones — max per register, never touching raw data."""
    return registers.groupBy(*group_cols, "hll_register").agg(
        F.max("hll_rho").alias("hll_rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """HLL estimate per group from a register table, with the standard
    small-range linear-counting correction. Absent registers count as
    zero (2^0 = 1 in the harmonic sum)."""
    m = float(M_REGISTERS)
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("__present"),
        F.sum(F.pow(F.lit(2.0), -F.col("hll_rho"))).alias("__s_present"),
    )
    s = F.col("__s_present") + (F.lit(m) - F.col("__present"))
    raw = F.lit(ALPHA * m * m) / s
    v = F.lit(m) - F.col("__present")  # zero registers (rho >= 1 if present)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        # round(…, 6): ln is the one step libm implementations may
        # disagree on in the last ulp (everything else here is exact)
        F.round(est, 6).alias("approx_distinct"),
    )


# --------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter / frequency summary
# --------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def cm_bucket_expr(term, row: int):
    """Bucket of `term` in sketch row `row`: 28-bit md5 prefix of
    'row:term' mod width — pure md5 arithmetic, reproducible in any
    engine (same recipe as the HLL registers above)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), term)), 1, 7), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(CM_WIDTH)).cast("int")


def cm_sketch(term_counts: DataFrame) -> DataFrame:
    """(row, bucket, n): the count-min table from exact per-term counts.

    Scale shape: the upstream term count already partially aggregates
    map-side; the sketch itself is a second, TINY aggregation onto at
    most depth x width cells. sum is associative/commutative, so
    per-partition (or per-day) sketches merge by cell-wise addition
    without rescanning — the same mergeability argument as the HLL
    register table.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), cm_bucket_expr(F.col("term"), r).alias("bucket")
            )
            for r in range(CM_DEPTH)
        ]
    )
    return (
        term_counts.select("n", F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("n").alias("n"))
    )


def cm_estimate(sketch: DataFrame, terms: DataFrame) -> DataFrame:
    """Point queries against the sketch: est(term) = min over rows of
    the term's bucket cell. The sketch is <= depth x width rows, so the
    join broadcasts; count-min never underestimates (est >= true)."""
    lookups = terms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_bucket_expr(F.col("term"), r).alias("bucket"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("term", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    # LEFT join: a queried term whose (row,bucket) cell is absent from
    # the sketch hit zero items there — the count-min estimate for that
    # cell is 0, and min() must see it (an inner join would silently
    # take min over fewer than CM_DEPTH cells and overestimate, or drop
    # unseen terms entirely).
    joined = lookups.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0).cast("long"))).alias("est_n")
    )
