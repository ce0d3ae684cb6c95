"""Mathematical invariants for the statistics/finance operator wave —
definition-level sanity the oracle-equality hash cannot express."""

from __future__ import annotations

import math

from nano_vectordb_spark import registry
from tests.conftest import SF_SMOKE


def _run(spark, name):
    return registry.REGISTRY[name].fn(spark, SF_SMOKE)


def test_gini_in_unit_interval(spark):
    r = _run(spark, "revenue_gini").collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    assert r["total_revenue"] > 0


def test_xcorr_bounded_and_symmetric_support(spark):
    rows = _run(spark, "error_purchase_xcorr").collect()
    assert len(rows) == 7
    for r in rows:
        assert -1.0 - 1e-9 <= r["xcorr"] <= 1.0 + 1e-9
        # lag L uses 30-|L| overlapping days
        assert r["n_pairs"] == 30 - abs(r["lag"])


def test_cusum_nonnegative_and_resets(spark):
    rows = _run(spark, "volume_cusum_chart").collect()
    assert len(rows) == 30
    for r in rows:
        assert r["cusum_hi"] >= 0.0 and r["cusum_lo"] >= 0.0


def test_entropy_rate_bounded_by_alphabet(spark):
    r = _run(spark, "event_entropy_rate").collect()[0]
    assert 0.0 <= r["entropy_rate_bits"] <= math.log2(5) + 1e-6


def test_dispersion_positive(spark):
    r = _run(spark, "order_count_dispersion").collect()[0]
    assert r["mean_orders"] > 0 and r["var_orders"] >= 0
    assert r["dispersion_index"] >= 0


def test_heaps_beta_finite_nonnegative(spark):
    r = _run(spark, "vocab_growth_heaps").collect()[0]
    assert 0.0 <= r["hapax_rate"] <= 1.0
    assert r["heaps_beta"] is not None and r["heaps_beta"] >= 0.0
    assert r["vocab_half"] <= r["vocab_size"]


def test_attribution_shares_sum_to_one_per_model(spark):
    rows = _run(spark, "attribution_model_compare").collect()
    by_model: dict[str, float] = {}
    for r in rows:
        by_model[r["model"]] = by_model.get(r["model"], 0.0) + r["share"]
    for model, s in by_model.items():
        assert abs(s - 1.0) < 1e-4, (model, s)


def test_holt_level_within_series_range(spark):
    from pyspark.sql import functions as F

    from nano_vectordb_spark.sources.tables import load_table

    r = _run(spark, "holt_forecast_daily").collect()[0]
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.col("ts").cast("date"))
        .count()
        .agg(F.min("count").alias("mn"), F.max("count").alias("mx"))
        .collect()[0]
    )
    # a convex-ish smoother of the series stays comfortably inside an
    # expanded range of the observations
    span = daily["mx"] - daily["mn"]
    assert daily["mn"] - span <= r["level"] <= daily["mx"] + span


def test_frontier_monotone_recall_and_bytes(spark):
    rows = sorted(
        _run(spark, "ann_cost_frontier").collect(), key=lambda r: r["nprobe"]
    )
    for a, b in zip(rows, rows[1:]):
        assert b["recall_at_k"] >= a["recall_at_k"] - 1e-9
        assert b["bytes_f32"] >= a["bytes_f32"]


def test_gdpr_residual_zero(spark):
    for r in _run(spark, "gdpr_erasure_audit").collect():
        assert r["n_residual"] == 0
        assert r["n_before"] == r["n_deleted"] + r["n_after"]


def test_waterfill_exhausts_budget_fairly(spark):
    rows = _run(spark, "mixture_waterfill").collect()
    total = sum(r["available_tokens"] for r in rows)
    budget = total * 9 // 10
    allocated = sum(r["allocated_tokens"] for r in rows)
    assert abs(allocated - budget) < 1e-3 * budget
    levels = {
        round(r["allocated_tokens"], 3) for r in rows if r["saturated"] == 0
    }
    assert len(levels) == 1  # every unsaturated source sits at ONE level
    for r in rows:
        assert r["allocated_tokens"] <= r["available_tokens"] + 1e-6
