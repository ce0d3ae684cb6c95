"""Skew-mitigation utilities for hot keys.

At 100 TB, a handful of hot join/group keys (a viral document id, an
empty-string token, a default cluster) can put one reducer days behind
the fleet. AQE's skew-join splitting handles sort-merge joins at
runtime; these helpers cover the aggregation side and make the salting
pattern explicit and testable.

``salted_count`` demonstrates the two-stage shape:
  stage 1: group by (key, salt) — hot keys fan out over `salt_buckets`
           reducers (partial aggregate);
  stage 2: group by key — combines `salt_buckets` partials per key.
Any associative aggregate composes the same way (sum, min, max,
count-distinct via HLL merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, salt_buckets). Salt only routes rows
    to reducers — results never depend on its values."""
    return df.withColumn(
        salt_col, (F.rand(seed=0) * salt_buckets).cast("int")
    )


def salted_count(
    df: DataFrame, key: str | Column, salt_buckets: int = 16
) -> DataFrame:
    """count(*) per key via two-stage salted aggregation: equivalent to
    ``df.groupBy(key).count()`` but a hot key spreads over
    salt_buckets partial aggregates before the tiny final combine."""
    keyed = df.select(F.col(key) if isinstance(key, str) else key.alias("key"))
    kc = keyed.columns[0]
    salted = with_salt(keyed, salt_buckets)
    partial = salted.groupBy(kc, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(kc).agg(F.sum("__c").alias("n"))


def salted_sum(
    df: DataFrame, key: str, value: str, salt_buckets: int = 16
) -> DataFrame:
    """sum(value) per key, two-stage salted (DECIMAL-safe if the caller
    casts value first)."""
    salted = with_salt(df.select(key, value), salt_buckets)
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__s"))
    return partial.groupBy(key).agg(F.sum("__s").alias("total"))
