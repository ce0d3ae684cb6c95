"""Physical-plan inspection helpers.

The reference hand-schedules every pipeline; here Catalyst plans, and
these helpers are how we *audit* that it planned what the 100 TB design
requires: broadcasts where the small side is small, pushed filters and
pruned columns at the parquet scan, partition pruning on the IVF
layout, no accidental sort-merge joins or extra exchanges. Tests in
tests/test_plans.py pin the plan shapes of the core operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The executed-plan string (same text .explain prints)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (each is a full
    data movement — the unit of cost the scale design minimizes)."""
    plan = physical_plan(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_operator(df: DataFrame, name: str) -> bool:
    return name in physical_plan(df, "simple")
