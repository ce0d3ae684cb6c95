"""Interval (range) join — point-in-interval matching at scale.

Named alongside as-of join in the pipeline-extension surface
(SURVEY.md §2.2 joins row: absent in reference). Semantics: left rows
carry a timestamp; right rows carry [start, end); emit every (left,
right) pair with the same key where start <= ts < end.

Spark-first shape: a raw `ts >= start AND ts < end` join degenerates to
BroadcastNestedLoopJoin (O(L x R) comparisons). Instead both sides get
a coarse time-bucket column — intervals EXPLODE over every bucket they
overlap — and the join runs as an equi-join on (key, bucket) with the
range predicate as a residual filter. At 100 TB this is one hash
shuffle on (key, bucket); bucket width tunes the explode factor vs
bucket selectivity (set it near the typical interval length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch_micros(df: DataFrame, col: str) -> Column:
    """Epoch-micros of a timestamp column, NTZ-safe.

    unix_micros only accepts TIMESTAMP (LTZ); the events table loads as
    TIMESTAMP_NTZ (see sources/tables.py), where the timezone-free
    equivalent is a MICROSECOND diff against the NTZ epoch."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        return F.timestamp_diff(
            "MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), F.col(col)
        )
    return F.unix_micros(F.col(col))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Equi-join on (key, coarse bucket) + residual range predicate.
    Returns all left columns plus the right side's start/end and
    payload columns. Exact: bucketing only prunes, never drops — an
    interval overlaps every bucket it spans (end exclusive)."""
    bus = int(bucket_seconds) * 1_000_000  # bucket width in micros
    l_b = left.withColumn("__bkt", F.floor(_epoch_micros(left, ts) / bus))
    r_b = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(_epoch_micros(right, start) / bus),
                F.floor((_epoch_micros(right, end) - 1) / bus),
            )
        ),
    )
    joined = l_b.join(
        r_b,
        on=[
            l_b[on] == r_b[on],
            l_b["__bkt"] == r_b["__bkt"],
            l_b[ts] >= r_b[start],
            l_b[ts] < r_b[end],
        ],
    )
    r_payload = [c for c in right.columns if c != on]
    return joined.select(
        *[l_b[c] for c in left.columns], *[r_b[c] for c in r_payload]
    )
