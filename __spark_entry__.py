"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over nano_vectordb_spark.registry — the single source of
truth for implemented operators and their DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nano_vectordb_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: single-query exact
    top-k by dot score over the embeddings table (reference flat-scan,
    SURVEY.md §3.1)."""
    return registry.REGISTRY["topk_dot"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in registry.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, e in registry.REGISTRY.items():
        sql = registry.resolve_oracle(e)
        if sql:
            out[name] = sql
    return out
