"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the fact-to-fact join (lineitem ⋈ orders) cannot broadcast;
re-shuffling both sides on every query is the dominant cost. Writing
both tables bucketed (and sorted) by the join key makes the join
exchange-free: each task reads matching buckets from both sides —
Spark's equivalent of the co-located layout the reference gets for free
from single-machine mmap.

Used by tests/test_bucketing.py to pin the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])
