"""Salted aggregation equivalence: salting must never change results,
only routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from nano_vectordb_spark.operators import skew
from tests.conftest import SF_CORRECT


def test_salted_count_equals_plain(spark):
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    plain = {
        r.event_type: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    salted = {r.event_type: r.n for r in skew.salted_count(ev, "event_type").collect()}
    assert salted == plain


def test_salted_sum_equals_plain(spark):
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").withColumn(
        "v", F.col("value").cast("decimal(18,6)")
    )
    plain = {
        r.event_type: r.s for r in ev.groupBy("event_type").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r.event_type: r.total for r in skew.salted_sum(ev, "event_type", "v").collect()
    }
    assert salted == plain
