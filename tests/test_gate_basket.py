"""Standing guard for the driver-gate basket (round-2 VERDICT items 1+6;
round-3 VERDICT item 1; round-6 VERDICT items 1+4 — the r7 rotation;
round-7 VERDICT item 1 — the r8+ standing rotation rule: new
registrations first, then re-gates of the oldest official rows,
mechanically ordered by registry.stale_regate_order()).

The driver's correctness gate checks only the FIRST 50 registry entries.
Rounds 3-6 rotated curated 50-entry windows through the gate
(GATE_BASKET_R3..R6, all 50/50 green).  Round 7 is the final rotation:
the last 20 never-officially-gated entries, the 2 newly registered O31
graph-ANN entries (r6 VERDICT item 1 — swapped in for two re-gate
slots), and 28 re-gate slots refreshing the oldest official rows.  The
guards:
  * the top-50 is exactly GATE_BASKET_R7 (rotation 4 of 4),
  * the never-gated + graph-ANN tranches have NO prior official driver
    row (no wasted slots); every re-gate slot targets an official row,
  * every top-50 entry ships a DuckDB oracle (rows-only entries may not
    silently land in the gated window),
  * registry-wide, any oracle-less entry must be explicitly declared,
  * the union of officially-gated baskets still covers every SURVEY §2
    representative and all 9 round-1 failures (their official rows are
    CORRECTNESS_r03; they must never silently drop from the record),
  * after the r7 window gates, every registry entry holds an official
    driver row (222/222) — the rotation's designed endpoint.
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
# two-phase merge, O15/O30 are justified skips, O25 native, O31 holds
# its own entries since r7 (graph_ann_recall / graph_ann_sharded), O34
# is bench.py itself).  All hold official CORRECTNESS_r03 rows.
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
    assert len(registry.GATE_BASKET_R12) == 50
    assert len(set(registry.GATE_BASKET_R12)) == 50
    assert _top50() == list(registry.GATE_BASKET_R12)


def test_r10_window_follows_the_standing_rotation_rule():
    """Third application of the standing rule: 2 new registrations
    (graph_ann_adaptive_probe, multimodal_mp3_stats — r9 VERDICT items
    2 + 7), then 48 re-gate slots on the oldest official rows — which
    after the r9 basket entered the history are the 31 remaining
    r5-era rows plus the oldest 17 r6-era rows."""
    new = registry.GATE_BASKET_R10_NEW
    regates = registry.GATE_BASKET_R10_REGATES
    assert list(registry.GATE_BASKET_R10) == list(new) + list(regates)
    gated = set(registry.stale_regate_order(before_round=10))
    assert not set(new) & gated
    assert set(regates) <= gated
    assert list(regates) == registry.stale_regate_order(before_round=10)[
        : 50 - len(new)
    ]
    # every r5-era official row (as of the r10 window) was refreshed
    # that round — replayed against the pre-r10 history
    r5_stale = {
        n
        for n, r in _official_rounds_before(10).items()
        if r == 5
    }
    assert r5_stale <= set(regates)


def _official_rounds_before(round_no: int) -> dict[str, int]:
    """official_rounds() replayed as of a PAST round (same filter
    stale_regate_order(before_round=...) applies)."""
    out: dict[str, int] = {}
    for rnd, basket in registry._BASKET_HISTORY:
        if rnd < round_no:
            for n in basket:
                out[n] = rnd
    return out


def test_r11_window_follows_the_standing_rotation_rule():
    """Fourth application of the standing rule: 2 new registrations
    (minhash_band_occupancy, neardup_first_band_profile — the LSH
    observability witnesses of the r11 exactly-once kernel rebuild),
    then 48 re-gate slots on the oldest official rows — after the r10
    basket entered the history, the 33 remaining r6-era rows plus the
    oldest 15 r7-era rows."""
    new = registry.GATE_BASKET_R11_NEW
    regates = registry.GATE_BASKET_R11_REGATES
    assert list(registry.GATE_BASKET_R11) == list(new) + list(regates)
    gated = set(registry.stale_regate_order(before_round=11))
    assert not set(new) & gated
    assert set(regates) <= gated
    assert list(regates) == registry.stale_regate_order(before_round=11)[
        : 50 - len(new)
    ]
    # every r6-era official row (as of the r11 window) was refreshed
    # that round — replayed against the pre-r11 history
    rounds = _official_rounds_before(11)
    r6_stale = {n for n, r in rounds.items() if r == 6}
    assert r6_stale <= set(regates)


def test_r12_window_follows_the_standing_rotation_rule():
    """Fifth application of the standing rule: 2 new registrations
    (token_profile_counts, minhash_dispatch_decision — the witnesses
    of the r12 vectorized-scoring and dispatch builds), then 48
    re-gate slots on the oldest official rows — after the r11 basket
    entered the history, the remaining r7-era rows first."""
    new = registry.GATE_BASKET_R12_NEW
    regates = registry.GATE_BASKET_R12_REGATES
    assert list(registry.GATE_BASKET_R12) == list(new) + list(regates)
    gated = set(registry.stale_regate_order(before_round=12))
    assert not set(new) & gated
    assert set(regates) <= gated
    assert list(regates) == registry.stale_regate_order(before_round=12)[
        : 50 - len(new)
    ]
    # the window occupies the registry's first 50 positions
    assert list(registry.REGISTRY)[:50] == list(registry.GATE_BASKET_R12)
    # the oldest official rows (r7-era) fill the regate slots first
    rounds = registry.official_rounds()
    r7_stale = [n for n, r in rounds.items() if r == 7]
    assert set(regates[: len(r7_stale)]) <= set(r7_stale) or set(
        r7_stale
    ) <= set(regates)
    # staleness bound: nothing in the registry is older than 5 rounds
    assert min(rounds.values()) >= 7


def test_r9_window_follows_the_standing_rotation_rule():
    """Second application of the standing rule (r8 VERDICT item 3):
    4 new registrations, then 46 re-gate slots on the oldest official
    rows — which after the r8 basket entered the history are the 27
    remaining r4-era rows plus the oldest 19 r5-era rows."""
    new = registry.GATE_BASKET_R9_NEW
    regates = registry.GATE_BASKET_R9_REGATES
    assert list(registry.GATE_BASKET_R9) == list(new) + list(regates)
    # the before_round replay keeps this pinned after the r9 basket
    # itself entered the history in r10
    gated = set(registry.stale_regate_order(before_round=9))
    assert not set(new) & gated
    assert set(regates) <= gated
    # the re-gate list IS the standing priority order as of r9
    assert list(regates) == registry.stale_regate_order(before_round=9)[
        : 50 - len(new)
    ]
    # every remaining r4-era official row is refreshed this round
    rounds = registry.official_rounds()
    r4_stale = {n for n, r in rounds.items() if r == 4}
    assert r4_stale <= set(regates)
    # staleness bound: nothing in the registry is older than 4 rounds
    assert min(rounds.values()) >= 4


def test_r8_window_follows_the_standing_rotation_rule():
    """r7 VERDICT item 1: with the 222/222 record closed, the window
    becomes mechanical — new registrations first (their first official
    row lands the round they register), then re-gate slots spent on the
    entries whose official rows are OLDEST (round, then basket
    position).  GATE_BASKET_R8 must be exactly that."""
    new = registry.GATE_BASKET_R8_NEW
    regates = registry.GATE_BASKET_R8_REGATES
    assert list(registry.GATE_BASKET_R8) == list(new) + list(regates)
    # new entries had NO official row AS OF r8; regates ALL did (the
    # officially-gated set before r8 == the r8 stale order's universe)
    gated = set(registry.stale_regate_order(before_round=8))
    assert not set(new) & gated
    assert set(regates) <= gated
    # the re-gate list IS the standing priority order as of r8 (the
    # before_round replay keeps this pinned after later rounds append
    # to the basket history)
    assert list(regates) == registry.stale_regate_order(before_round=8)[
        : 50 - len(new)
    ]
    # r7 VERDICT item 7: the two §2 lines parked on r3 rows since their
    # slots were donated to graph ANN re-gate now
    assert {"topk_f16", "topk_l2"} <= set(regates)
    # every remaining r3-era official row is refreshed this round
    rounds = registry.official_rounds()
    r3_stale = {n for n, r in rounds.items() if r == 3}
    assert r3_stale <= set(regates)


def test_r7_new_tranches_spend_no_slot_on_verdicted_entries():
    prior = (
        set(registry.GATE_BASKET_R3)
        | set(registry.GATE_BASKET_R4)
        | set(registry.GATE_BASKET_R5)
        | set(registry.GATE_BASKET_R6)
    )
    fresh = set(registry.GATE_BASKET_R7_NEVER_GATED) | set(
        registry.GATE_BASKET_R7_GRAPH_ANN
    )
    assert not fresh & prior


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


def test_r7_window_closes_the_rotation():
    """r5 VERDICT item 7 pinned the plan; r6 VERDICT item 1 directed the
    two-slot swap for the O31 entries.  20 never-gated + 2 graph-ANN +
    28 re-gate slots on the oldest official rows = the final window."""
    never = registry.GATE_BASKET_R7_NEVER_GATED
    graph = registry.GATE_BASKET_R7_GRAPH_ANN
    regates = registry.GATE_BASKET_R7_REGATES
    assert len(never) == 20 and len(graph) == 2 and len(regates) == 28
    assert len(registry.GATE_BASKET_R7) == 50
    assert len(set(registry.GATE_BASKET_R7)) == 50
    assert set(graph) == {"graph_ann_recall", "graph_ann_sharded"}
    # every re-gate slot targets an entry whose official row is r3-era
    # (all of GATE_BASKET_R3) or the one r4 rows-only declaration
    eligible = set(registry.GATE_BASKET_R3) | {"distinct_users_sketch"}
    assert set(regates) <= eligible
    # the priority picks are present: the rows-only retiree, all nine
    # round-1 failures, and the r5-reworked streaming representative
    assert "distinct_users_sketch" in regates
    assert R1_FAILURES <= set(regates)
    assert "stream_event_counts" in regates
    # the two slots ceded to the graph-ANN entries are the O5/O7
    # quantized topk variants; their dispatch path stays covered by
    # topk_dot / topk_i8 which remain in the basket
    assert {"topk_f16", "topk_l2"} & set(regates) == set()
    assert {"topk_dot", "topk_i8"} <= set(regates)
    # after r7 every registry entry held an official driver row; the
    # entries registered SINCE (the r8 new tranche) are the only ones
    # outside that closed record
    all_gated = (
        set(registry.GATE_BASKET_R3)
        | set(registry.GATE_BASKET_R4)
        | set(registry.GATE_BASKET_R5)
        | set(registry.GATE_BASKET_R6)
        | set(never)
        | set(graph)
    )
    assert all_gated == (
        set(registry.REGISTRY)
        - set(registry.GATE_BASKET_R8_NEW)
        - set(registry.GATE_BASKET_R9_NEW)
        - set(registry.GATE_BASKET_R10_NEW)
        - set(registry.GATE_BASKET_R11_NEW)
        - set(registry.GATE_BASKET_R12_NEW)
    )


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


def test_tail_holds_only_officially_gated_entries():
    """After the r8 reorder every entry outside the window already holds
    an official driver row (r3-r7); nothing never-gated may hide past
    position 50 where the driver would miss it."""
    names = list(registry.REGISTRY)
    gated = set(registry.official_rounds())
    assert set(names[50:]) <= gated, (
        "never-gated entries parked outside the r8 window: "
        f"{set(names[50:]) - gated}"
    )


def test_registry_growth_bounded_by_the_window():
    """The r3-r7 growth freeze lifted when the rotation closed 222/222.
    The standing invariant that replaces it: every entry NOT in the
    current gate window must already hold an official driver row — so
    registrations per round are bounded by the window's new-entry
    tranche, and no entry ever ships unverified.  r8 registers 5
    (222 -> 227): the two r7-queued entries (multimodal_png_stats,
    compact_stats), the compaction round-trip witness, and the
    capability wave (dedup_state_merge, semantic_dedup).  r9 registers
    4 (227 -> 231): the SPANN boundary-replication witness, the
    band-state retirement entry, the quality-bucketed mixture
    reweighting composition, and the baseline-JPEG codec witness
    (r8 VERDICT items 2, 5, 6).  r10 registers 2 (231 -> 233): the
    adaptive re-probe witness and the MPEG-1 frame-header walk
    (r9 VERDICT items 2, 7).  r11 registers 2 (233 -> 235): the LSH
    bucket-occupancy regime check and the first-shared-band emission
    profile (observability for the r11 exactly-once kernel rebuild).
    r12 registers 2 (235 -> 237): the raw integer layer of the
    vectorized scoring profile and the MinHash dispatch decision row
    (witnesses of the r12 builds)."""
    assert len(registry.REGISTRY) == 237
    gated = set(registry.official_rounds())
    ungated = set(registry.REGISTRY) - gated
    assert ungated == set(registry.GATE_BASKET_R12_NEW)
