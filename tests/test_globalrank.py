"""operators/globalrank.py — the two-phase global rank must be
row-for-row identical to the unpartitioned-window form it replaces
(rank, running sums, ntile buckets), across partition counts, ties in
the sort prefix, and n ±1 around multiples of k."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nano_vectordb_spark.operators import globalrank as grank


def _fixture(spark, n=997, parts=7):
    # deterministic, tie-heavy (v has ~50 distinct values), unique id
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 50).alias("v"),
        (F.col("id") % 13).cast("decimal(18,2)").alias("d"),
    ).repartition(parts)


@pytest.mark.parametrize("num_partitions", [1, 3, 32])
def test_rank_matches_window(spark, num_partitions):
    df = _fixture(spark)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = grank.two_phase_rank(
        df, order, rn_name="rn", num_partitions=num_partitions
    )
    w = Window.orderBy(*order)
    want = df.select("id", F.row_number().over(w).cast("long").alias("rn"))
    diff = got.select("id", "rn").exceptAll(want)
    assert diff.count() == 0


def test_cumsum_matches_window(spark):
    df = _fixture(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = grank.two_phase_rank(
        df, order, cum_sums=[(F.col("d"), "cum_d")], rn_name="rn"
    ).select("id", "rn", F.col("cum_d").cast("decimal(28,2)").alias("cum_d"))
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "id",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rn"),
        F.sum("d").over(w).cast("decimal(28,2)").alias("cum_d"),
    )
    assert got.exceptAll(want).count() == 0


@pytest.mark.parametrize("n", [39, 40, 41, 3, 4])
@pytest.mark.parametrize("k", [4, 7])
def test_ntile_formula_matches_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    w = Window.orderBy("id")
    want = df.select("id", F.ntile(k).over(w).alias("t"))
    got = df.select(
        "id",
        grank.ntile_from_rank(
            F.row_number().over(w).cast("long"), F.lit(n).cast("long"), k
        ).alias("t"),
    )
    assert got.exceptAll(want).count() == 0


def test_rank_stage_is_partitioned(spark):
    """The point of the rewrite: the ranking window must be partitioned
    (by the range-partition id), never a single global partition."""
    df = _fixture(spark)
    got = grank.two_phase_rank(df, [F.col("v").asc(), F.col("id").asc()])
    plan = got._jdf.queryExecution().optimizedPlan()

    def walk(node):
        yield node
        cs = node.children()
        for i in range(cs.size()):
            yield from walk(cs.apply(i))

    windows = [
        n
        for n in walk(plan)
        if n.getClass().getSimpleName() == "Window"
    ]
    assert windows, "expected window nodes in the two-phase plan"
    # the data-sized windows (carrying the input columns) are partitioned;
    # only the |partitions|-row offsets window may be global
    unpartitioned = [n for n in windows if n.partitionSpec().isEmpty()]
    for n in unpartitioned:
        s = n.simpleString(200)
        assert "__gr_pid" in s, f"unpartitioned data-sized window: {s}"


def test_rank_consistent_without_exchange_reuse(spark):
    """Regression (round 4): when Catalyst compiles the range exchange
    twice — union / broadcast shapes break exchange reuse — each
    instance samples its own range boundaries (RangePartitioner seeds by
    rdd.id), so the broadcast offsets could describe a different
    partitioning than the ranks were computed in. The localCheckpoint
    pin makes every branch read one materialization; without it this
    union-of-two-ranks shape flaked ~2/3 of runs on the skewed key."""
    df = _fixture(spark, n=5000, parts=5)
    # skewed key: clustered values make boundary jitter visible
    df = df.select("id", (F.col("v") * F.col("v")).alias("v"))
    order_a = [F.col("v").asc(), F.col("id").asc()]
    order_b = [F.col("v").desc(), F.col("id").asc()]
    w_a, w_b = Window.orderBy(*order_a), Window.orderBy(*order_b)
    want = df.select(
        "id",
        F.row_number().over(w_a).cast("long").alias("rn"),
        F.lit("a").alias("side"),
    ).unionByName(
        df.select(
            "id",
            F.row_number().over(w_b).cast("long").alias("rn"),
            F.lit("b").alias("side"),
        )
    )
    for _ in range(3):
        got = grank.two_phase_rank(df, order_a, rn_name="rn").select(
            "id", "rn", F.lit("a").alias("side")
        ).unionByName(
            grank.two_phase_rank(df, order_b, rn_name="rn").select(
                "id", "rn", F.lit("b").alias("side")
            )
        )
        assert got.exceptAll(want).count() == 0
