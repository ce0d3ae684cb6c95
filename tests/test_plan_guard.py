"""Repo-wide physical-plan guard: no registry entry may plan a
CartesianProduct, and BroadcastNestedLoopJoin is allowed ONLY where it
is the deliberate broadcast-small-side scoring pattern (a tiny query /
centroid / LUT relation cross-joined against the base — the Q x N scan
the semantics require, with the small side broadcast).

This is the automated form of the review rule "no cartesian in any
default entry": adding a new entry whose join degenerates into an
unbroadcast cartesian fails here immediately.
"""

from __future__ import annotations

import pytest

from nano_vectordb_spark import registry
from tests.conftest import SF_SMOKE

# Entries whose plan legitimately contains a BroadcastNestedLoopJoin:
# every one broadcasts a bounded small relation (queries Q<=20,
# centroids nlist<=16, or per-query LUTs) against the base table.
_BNLJ_OK = {
    "topk_multi_window",      # broadcast query batch x base scan
    "topk_i8",                # broadcast query batch x quantized scan
    "topk_f16",               # broadcast query batch x f16 scan
    "refine_i8",              # broadcast candidates/queries
    "recall_i8_vs_f32",       # broadcast GT join
    "ivf_search",             # broadcast centroid probe stage
    "ivf_search_persisted",
    "doc_search_ivf",
    "pq_adc_search",          # broadcast per-query LUTs
    "pq_refine_search",
    "opq_refine_search",
    "opq_learned_refine_search",
    "embedding_neardup_pairs",  # guarded verification baseline (<=20k rows)
    "doc_search_bm25",        # broadcast 1-row corpus stats x |vocab|-row idf
    "hybrid_search_rrf",      # embeds doc_search_bm25's broadcast-stats join
    "rankers_agreement",      # embeds doc_search_bm25's broadcast-stats join
    "bm25_score_explain",     # embeds doc_search_bm25's broadcast-stats join
    "source_lang_independence",  # bounded marginals cross join (|sources| x |langs|)
    "radius_search",          # broadcast query batch x base scan (range search)
    "search_quality_i8",      # embeds topk_i8's broadcast query batch x scan
    "mixture_weights_temperature",  # broadcast 1-row fold denominator
    "label_centroid_quality",  # broadcast L-row centroid relation x base scan
    "customer_rfm_segments",  # broadcast 1-row customer count (ntile closed form)
    "revenue_pareto",         # broadcast 1-row totals (two-phase rank rewrite)
    "zipf_slope",             # broadcast 1-row vocab size next to the top-R fit
}

# Entries whose optimized plan legitimately contains an UNPARTITIONED
# Window fed by a non-aggregated, non-limited scan.  The r3 verdict's
# failure mode: a global Window.orderBy over a fact-scale input runs in
# ONE task — fine at sf0.1, the canonical straggler at 100 TB.  Bounded
# inputs (an Aggregate's group rows, a Limit head, a literal relation)
# are detected structurally and never flagged; anything else must be
# fixed (two-phase rank / counting histogram, operators/globalrank.py)
# or allowlisted here with a justification.
_GLOBAL_WINDOW_OK = {
    # semantic definition of the reference's windowed multi-query scan;
    # documented weak-by-design vs the two-phase plan (topk_multi_twophase
    # is the scale path; measured 171 s vs 2.6 s at 200K x 100)
    "topk_multi_window",
}

NAMES = sorted(registry.REGISTRY)


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _cls(node):
    return node.getClass().getSimpleName()


# nodes that bound (or re-key) downstream cardinality: an aggregate's
# output is |groups| rows, a limit is literal-bounded, a local/one-row
# relation is a literal.  Joins/filters/projects pass fact cardinality
# through and keep the walk going.
#
# EXCEPTION (r5): an Aggregate grouped by a per-row id column (doc_id,
# vec_id, event_id, order keys...) emits one row per ENTITY — fact
# cardinality in different clothes, not a bound. The round-5 audit
# found lm_perplexity_filter's corpus-sized decile window hiding
# behind exactly this shape.
_BOUNDING = {"GlobalLimit", "LocalLimit", "Deduplicate"}
_ID_GROUP_PAT = (
    "doc_id",
    "vec_id",
    "event_id",
    "query_id",
    "chunk_id",
    # user-entity keys (r5 ADVICE): users/customers/suppliers/parts are
    # fact-cardinality at 100 TB, not bounded dimensions.  cluster_id /
    # band_id / bucket_id style keys stay OFF this list on purpose —
    # those domains are k-bounded by construction.
    "user_id",
    # bare substrings (r6 VERDICT item 3): table-prefixed aliases
    # (l_partkey, ps_suppkey, o_custkey...) all contain the bare key,
    # so every prefix variant matches — the r6 audit found
    # price_dispersion_by_part's l_partkey grouping slipping past the
    # old p_partkey/s_suppkey literals.
    "orderkey",
    "custkey",
    "suppkey",
    "partkey",
)


def _aggregate_is_bounding(node) -> bool:
    try:
        grouping = node.groupingExpressions().mkString(",")
    except Exception:
        # API drift on a node we matched as "Aggregate": fail STRICT
        # (treat as non-bounding and keep walking) — returning True here
        # would silently disable the guard for every aggregate
        return False
    return not any(pat in grouping for pat in _ID_GROUP_PAT)
_UNBOUNDED_LEAVES = {
    "LogicalRelation",
    "DataSourceV2ScanRelation",
    "DataSourceV2Relation",
    "HiveTableRelation",
    "UnresolvedRelation",
    # persisted intermediates: conservatively fact-scale (the cache may
    # hold a full base-table derivative)
    "InMemoryRelation",
}


def _unbounded_scan_below(node) -> bool:
    name = _cls(node)
    if name in _BOUNDING:
        return False
    if name == "Aggregate" and _aggregate_is_bounding(node):
        return False
    if name in _UNBOUNDED_LEAVES:
        return True
    return any(_unbounded_scan_below(c) for c in _children(node))


def _unpartitioned_windows_over_scans(plan) -> list[str]:
    hits = []
    stack = [plan]
    while stack:
        node = stack.pop()
        if _cls(node) == "Window" and node.partitionSpec().isEmpty():
            if any(_unbounded_scan_below(c) for c in _children(node)):
                hits.append(node.simpleString(120))
        stack.extend(_children(node))
    return hits


@pytest.mark.parametrize("name", NAMES)
def test_no_unsanctioned_cartesian(spark, name):
    df = registry.REGISTRY[name].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in _BNLJ_OK, (
            f"{name}: BroadcastNestedLoopJoin in plan but not whitelisted as a "
            f"broadcast-small-side pattern"
        )
    hits = _unpartitioned_windows_over_scans(
        df._jdf.queryExecution().optimizedPlan()
    )
    if hits and name not in _GLOBAL_WINDOW_OK:
        raise AssertionError(
            f"{name}: unpartitioned Window over a fact-scale input — "
            f"single-task straggler at scale; use two-phase rank or a "
            f"counting histogram (operators/globalrank.py). Nodes: {hits}"
        )


def test_all_outputs_canonicalizer_safe(spark):
    """The driver's canonicalizer (pandas sort_values + value hashing)
    crashes on unhashable cells — no entry may emit array / map /
    struct / binary columns. Round 1 lost six queries to this; this
    guard makes the invariant permanent."""
    bad: list[tuple[str, list[str]]] = []
    for name, entry in sorted(registry.REGISTRY.items()):
        df = entry.fn(spark, SF_SMOKE)
        unsafe = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct", "binary")
        ]
        if unsafe:
            bad.append((name, unsafe))
    assert not bad, f"canonicalizer-unsafe outputs: {bad}"
