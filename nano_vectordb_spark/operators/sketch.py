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
