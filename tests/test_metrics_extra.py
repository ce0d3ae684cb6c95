"""Sketch-based distinct counting: union-of-daily-sketches estimate
must land within HLL error bounds of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from nano_vectordb_spark import registry
from tests.conftest import SF_CORRECT


def test_hll_union_estimate_within_bounds(spark):
    res = {
        r.event_type: (r.exact_distinct_users, r.n_daily_sketches, r.within_5pct)
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
    for et, (exact_out, n_days, within) in res.items():
        assert n_days >= 1
        assert exact_out == exact[et]
        # default lgK=12 HLL: rse ~1.6%; the entry asserts 2% in-plan
        assert within is True, et


def test_md5_hll_accuracy_and_mergeability(spark):
    """The engine-independent md5 HLL (operators/sketch.py): estimate
    within HLL error bounds, and the sketch merges associatively —
    building per-day then merging must equal building directly."""
    from nano_vectordb_spark.operators import sketch as sk
    from nano_vectordb_spark.sources.tables import load_table

    ev = load_table(spark, SF_CORRECT, "events")

    rows = registry.REGISTRY["distinct_users_hll"].fn(spark, SF_CORRECT).collect()
    assert len(rows) >= 1
    for r in rows:
        # lgK=12 -> rse ~1.6%; allow 5% headroom
        assert r.rel_err <= 0.05, (r.event_type, r.approx_distinct, r.exact_distinct)

    daily = sk.hll_registers(
        ev.withColumn("day", F.date_trunc("day", "ts")),
        "user_id",
        ["day", "event_type"],
    )
    merged = sk.hll_merge(daily, ["event_type"])
    direct = sk.hll_registers(ev, "user_id", ["event_type"])
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b  # merge of finer sketches == sketch built directly
