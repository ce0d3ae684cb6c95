"""Sketch-based distinct counting: union-of-daily-sketches estimate
must land within HLL error bounds of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from nano_vectordb_spark import registry
from tests.conftest import SF_CORRECT


def test_hll_union_estimate_within_bounds(spark):
    res = {
        r.event_type: (r.approx_distinct_users, r.n_daily_sketches)
        for r in registry.REGISTRY["distinct_users_sketch"].fn(spark, SF_CORRECT).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(res) == set(exact)
    for et, (approx, n_days) in res.items():
        assert n_days >= 1
        # default lgK=12 HLL: rse ~1.6%; allow 5% headroom
        assert abs(approx - exact[et]) <= max(1, 0.05 * exact[et]), (et, approx, exact[et])
