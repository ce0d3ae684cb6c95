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
}

NAMES = sorted(registry.REGISTRY)


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
