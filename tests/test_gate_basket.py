"""Standing guard for the driver-gate basket (round-2 VERDICT items 1+6;
round-3 VERDICT item 1 — the r4 rotation).

The driver's correctness gate checks only the FIRST 50 registry entries.
Round 3 proved the curated covering set (GATE_BASKET_R3) 50/50 green, so
round 4 rotates the next 50 never-officially-gated entries (r3-order
positions 51-100) into the window, per the plan in COVERAGE.md.  The
guards:
  * the top-50 is exactly GATE_BASKET_R4 (rotation 1 of 3),
  * r4 basket entries have NO prior official driver row (no wasted slots),
  * every top-50 entry ships a DuckDB oracle (rows-only entries may not
    silently land in the gated window) — except the one declared case,
  * registry-wide, any oracle-less entry must be explicitly declared,
  * the union of officially-gated baskets (r3 ∪ r4) still covers every
    SURVEY §2 representative and all 9 round-1 failures (their official
    rows are CORRECTNESS_r03; they must never silently drop from the
    record),
  * the rotation queue right after the window holds only never-gated
    entries so GATE_BASKET_R5 is simply positions 51-100 next round.
"""

from __future__ import annotations

from nano_vectordb_spark import registry

# entries allowed to skip the value-hash oracle, with the reason
# recorded here.  Empty since round 5: distinct_users_sketch (the one
# r4 declaration — library HLL internals have no SQL form) now hashes
# the exact count plus an in-plan within_5pct estimator assertion, so
# every registry entry is oracle-backed.
ROWS_ONLY_DECLARED: set[str] = set()

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
# O34 is bench.py itself).  All hold official CORRECTNESS_r03 rows.
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
    assert len(registry.GATE_BASKET_R6) == 50
    assert len(set(registry.GATE_BASKET_R6)) == 50
    assert _top50() == list(registry.GATE_BASKET_R6)


def test_r6_basket_spends_no_slot_on_verdicted_entries():
    prior = (
        set(registry.GATE_BASKET_R3)
        | set(registry.GATE_BASKET_R4)
        | set(registry.GATE_BASKET_R5)
    )
    assert not set(registry.GATE_BASKET_R6) & prior


def test_r5_basket_spends_no_slot_on_verdicted_entries():
    prior = set(registry.GATE_BASKET_R3) | set(registry.GATE_BASKET_R4)
    assert not set(registry.GATE_BASKET_R5) & prior


def test_r4_basket_spends_no_slot_on_verdicted_entries():
    assert not set(registry.GATE_BASKET_R4) & set(registry.GATE_BASKET_R3)


def test_r7_plan_is_pinned_and_closes_the_rotation():
    """r5 VERDICT item 7: the final gate window is named now so the r7
    rotation is mechanical.  20 never-gated entries (= the rotation
    queue, exactly) + 30 re-gate slots on the oldest official rows."""
    never = registry.GATE_BASKET_R7_NEVER_GATED
    regates = registry.GATE_BASKET_R7_REGATES
    assert len(never) == 20 and len(regates) == 30
    assert len(registry.GATE_BASKET_R7) == 50
    assert len(set(registry.GATE_BASKET_R7)) == 50
    # the never-gated tranche is exactly the post-window rotation queue
    names = list(registry.REGISTRY)
    assert names[50:70] == list(never)
    # every re-gate slot targets an entry whose official row is r3-era
    # (all of GATE_BASKET_R3) or the one r4 rows-only declaration
    eligible = set(registry.GATE_BASKET_R3) | {"distinct_users_sketch"}
    assert set(regates) <= eligible
    # the priority picks are present: the rows-only retiree, all nine
    # round-1 failures, and the r5-reworked streaming representative
    assert "distinct_users_sketch" in regates
    assert R1_FAILURES <= set(regates)
    assert "stream_event_counts" in regates
    # after r7 every registry entry holds an official driver row
    all_gated = (
        set(registry.GATE_BASKET_R3)
        | set(registry.GATE_BASKET_R4)
        | set(registry.GATE_BASKET_R5)
        | set(registry.GATE_BASKET_R6)
        | set(never)
    )
    assert all_gated == set(registry.REGISTRY)


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


def test_officially_gated_union_covers_r1_failures():
    gated = set(registry.GATE_BASKET_R3) | set(registry.GATE_BASKET_R4)
    assert R1_FAILURES <= gated, f"missing: {R1_FAILURES - gated}"


def test_officially_gated_union_covers_survey_s2():
    gated = set(registry.GATE_BASKET_R3) | set(registry.GATE_BASKET_R4)
    missing = {n: ops for n, ops in SURVEY_S2_REPS.items() if n not in gated}
    assert not missing, f"§2 representatives outside the official record: {missing}"


def test_rotation_queue_holds_only_never_gated_entries():
    """Positions 51..70 must be the final 20 never-gated entries in
    stable order (they close the record in r7); the r3+r4+r5-verdicted
    baskets park at the tail."""
    names = list(registry.REGISTRY)
    gated = (
        set(registry.GATE_BASKET_R3)
        | set(registry.GATE_BASKET_R4)
        | set(registry.GATE_BASKET_R5)
        | set(registry.GATE_BASKET_R6)
    )
    n_tail = (
        len(registry.GATE_BASKET_R3)
        + len(registry.GATE_BASKET_R4)
        + len(registry.GATE_BASKET_R5)
    )
    queue = names[50 : len(names) - n_tail]
    tail = names[len(names) - n_tail :]
    assert not set(queue) & gated, "rotation queue polluted by gated entries"
    assert set(tail) == (
        set(registry.GATE_BASKET_R3)
        | set(registry.GATE_BASKET_R4)
        | set(registry.GATE_BASKET_R5)
    ), "tail must be the r3+r4+r5 baskets"


def test_registry_growth_frozen_until_rotation_closes():
    """The COVERAGE.md schedule (r5: 50, r6: 50, r7: 20) only closes if
    the registry stays at exactly 220 entries until every one holds an
    official driver row. New entries may be added again after r7."""
    assert len(registry.REGISTRY) == 220
