"""Parquet table loaders for the driver testdata layout.

Replaces the reference's mmap vecbin loader (SURVEY.md O1,
src/vector_dataset.cpp:24-119): Parquet gives us the same
"schema fixed, validated at load" contract via an explicit expected
schema check, plus columnar pruning + predicate pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_read_confs(spark: SparkSession) -> None:
    """Session confs required to read the driver's parquet layout.

    events.parquet stores TIMESTAMP(NANOS), which Spark 4 rejects unless
    nanosAsLong is set. session.py sets it at build time, but callers may
    hand us an already-built session (e.g. an external harness) — a runtime
    conf.set works on a live session and is a no-op when already set.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts normalizes to TIMESTAMP_NTZ — wall-clock micros with no
    # session-timezone dependence, matching DuckDB's naive TIMESTAMP on
    # the oracle side. Two parquet layouts appear in the wild:
    #   * TIMESTAMP(MICROS, isAdjustedToUTC=false) -> already NTZ; no-op.
    #   * TIMESTAMP(NANOS) + nanosAsLong -> epoch-ns LongType; values are
    #     microsecond-aligned so `div 1000` is lossless; timestampadd
    #     against the NTZ epoch is timezone-free (timestamp_micros would
    #     yield LTZ, whose wall time shifts with the session timezone).
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (matches the driver's DuckDB
    side, where the same names are pre-registered)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
