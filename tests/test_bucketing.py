"""Bucketed co-located join: the fact-to-fact join plan must contain no
shuffle exchange when both sides are bucketed on the join key."""

from __future__ import annotations

import pytest

from nano_vectordb_spark.plans.inspect import count_exchanges, physical_plan
from nano_vectordb_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def bucketed(spark):
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(orders, "ord_b", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # suppress broadcast so the join physically merges buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
        plan = physical_plan(j, "simple")
        assert count_exchanges(j) == 0, plan
        assert "SortMergeJoin" in plan, plan
        # and it still returns the right row count
        li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
