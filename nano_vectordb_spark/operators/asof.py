"""As-of (time-travel) join — the training-pipeline operator Spark
lacks natively (SURVEY.md §2.2 joins row: absent in reference; named in
the pipeline-extension surface).

Semantics: for each left row, attach the single right row with the
greatest right_ts <= left_ts within the same key (inclusive match, the
ASOF JOIN contract DuckDB/QuestDB/kdb share). Left rows with no prior
right row keep nulls.

Spark-first shape — union + window, ONE shuffle on the key:
  * a generic range-condition join would explode to an O(L x R)
    BroadcastNestedLoop or an interval cross-product; instead both
    sides union into one relation tagged by side, sort within each key
    by (ts, side) — right rows first on ties so the match is inclusive
    — and carry the right row forward as ONE struct with
    last(..., ignoreNulls) over rows UNBOUNDED PRECEDING..CURRENT ROW
    (a single struct keeps all carried columns from the same matched
    row, even when some payload values are NULL).
  * at 100 TB this is exactly one hash shuffle of L+R rows plus a
    per-key sort — the same cost as a co-grouped merge join; no
    broadcast, no skew beyond the key distribution itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at or
    before its timestamp, matched per ``on`` key. Right columns arrive
    as ``{prefix}{right_ts}`` and ``{prefix}{col}`` for each payload
    column."""
    from pyspark.sql import types as T

    carried = [right_ts, *right_payload]
    # ONE struct per right row carries ts + all payload columns together,
    # so last(ignorenulls) either matches a whole right row or none — a
    # NULL payload value in the matched row stays NULL instead of being
    # back-filled from an older right row (the DuckDB ASOF contract).
    struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in carried]
    )
    l_tag = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__ets", F.col(left_ts))
        .withColumn("__r", F.lit(None).cast(struct_t))
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ets"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__r"),
    ).withColumn("__side", F.lit(0))
    l_cols = left.columns
    merged = l_tag.select(*l_cols, "__side", "__ets", "__r").unionByName(
        r_tag.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c != on
                else F.col(on)
                for c in l_cols
            ],
            "__side",
            "__ets",
            "__r",
        )
    )
    # right rows sort before left rows on equal timestamps => inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ets").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).select(
        *l_cols,
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in carried],
    )
