"""Standing guard for the driver-gate basket (round-2 VERDICT items 1+6).

The driver's correctness gate checks only the FIRST 50 registry entries,
so the top-50 must stay a deliberate covering set:
  * every SURVEY.md §2 operator has a representative inside the window,
  * the 9 round-1 failures stay inside until officially re-verdicted,
  * every top-50 entry ships a DuckDB oracle (rows-only entries may not
    silently land in the gated window),
  * registry-wide, any oracle-less entry must be explicitly declared.
"""

from __future__ import annotations

from nano_vectordb_spark import registry

# the only entry allowed to skip the value-hash oracle, with the reason
# recorded here (library HLL internals have no SQL form; error-bound
# tested in tests/test_sketch.py instead)
ROWS_ONLY_DECLARED = {"distinct_users_sketch"}

R1_FAILURES = {
    "pricing_summary",
    "top_revenue_customers",
    "events_running_window",
    "events_sessionize",
    "events_asof_purchase",
    "events_range_join",
    "events_salted_agg",
    "latency_percentiles",
    "embedding_neardup_lsh",
}

# entry -> SURVEY §2 operators it certifies (coverage map; O1 is the
# shared source layer every entry loads through, O13 is internal to the
# two-phase merge, O15/O30 are justified skips, O25 native, O31 a
# documented substitution evidenced in tests/test_ann_recall_parity.py,
# O34 is bench.py itself)
SURVEY_S2_REPS = {
    "slice_first_n": ("O2", "O20"),
    "quant_error_stats": ("O3",),
    "topk_dot": ("O4", "O8", "O9"),
    "topk_f16": ("O5", "O22"),
    "topk_i8": ("O6",),
    "topk_l2": ("O7",),
    "topk_multi_twophase": ("O10", "O11", "O12", "O14"),
    "gt_build": ("O16",),
    "recall_i8_vs_f32": ("O17",),
    "latency_percentiles": ("O18",),
    "scan_cost_model": ("O19",),
    "sample_queries": ("O21",),
    "quantize_i8": ("O23",),
    "sanity_stats": ("O24",),
    "ivf_search": ("O26", "O28"),
    "pq_adc_search": ("O27",),
    "opq_learned_refine_search": ("O27",),
    "ivfpq_refine_search": ("O27",),
    "refine_i8": ("O29", "O32"),
    "csv_chunks_embed": ("O33",),
}


def _top50() -> list[str]:
    return list(registry.REGISTRY)[:50]


def test_basket_is_the_top_50():
    assert len(registry.GATE_BASKET_R3) == 50
    assert len(set(registry.GATE_BASKET_R3)) == 50
    assert _top50() == list(registry.GATE_BASKET_R3)


def test_top50_all_oracle_backed():
    missing = [
        n
        for n in _top50()
        if registry.resolve_oracle(registry.REGISTRY[n]) is None
        and n not in ROWS_ONLY_DECLARED
    ]
    assert not missing, f"gated entries without an oracle: {missing}"


def test_registry_wide_oracle_presence_declared():
    undeclared = [
        n
        for n, e in registry.REGISTRY.items()
        if registry.resolve_oracle(e) is None and n not in ROWS_ONLY_DECLARED
    ]
    assert not undeclared, (
        f"entries without oracle SQL and without a declared rows-only "
        f"justification: {undeclared}"
    )


def test_r1_failures_inside_gate_window():
    top = set(_top50())
    assert R1_FAILURES <= top, f"missing: {R1_FAILURES - top}"


def test_survey_s2_coverage_inside_gate_window():
    top = set(_top50())
    missing = {n: ops for n, ops in SURVEY_S2_REPS.items() if n not in top}
    assert not missing, f"§2 representatives outside the gate window: {missing}"
