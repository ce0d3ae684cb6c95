"""Two-phase global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy``.

An unpartitioned window forces every row through ONE task; fine for a
few hundred group rows, a straggler (or OOM) when the input is
customer- or vocabulary-cardinality (10^8-10^9 at 100 TB).  The classic
distributed fix is the same two-phase scheme the reference uses for its
parallel top-k merge (partial per-thread heaps + final merge,
`src/topk.cpp` per SURVEY.md §2 O10-O12), applied to ranking:

  1. ``repartitionByRange`` on the order key — Spark range-samples the
     key and assigns contiguous key ranges to partitions, so partition
     ids are ordered by the sort order;
  2. per-partition ``row_number`` / running sums via a window
     PARTITIONED by ``spark_partition_id()`` (parallel, no global sort);
  3. a tiny per-partition totals table (|partitions| rows) yields each
     partition's global offset via a prefix sum over partition id;
  4. broadcast the offsets back and add.

Global rank = local rank + offset.  Exact for any total order; running
DECIMAL sums stay exact because decimal addition is associative.

``ntile_from_rank`` converts the global rank into SQL-standard
``ntile(k)`` buckets in closed form (first n%k buckets get one extra
row), so quartile coding never needs the single-partition ntile window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_LRN = "__gr_lrn"


def two_phase_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    cum_sums: Sequence[tuple[Column, str]] = (),
    rn_name: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global ``row_number`` (``rn_name``) over the
    TOTAL order ``order_by`` — plus, for each ``(col, name)`` in
    ``cum_sums``, the running sum of ``col`` in that order — without a
    single-partition window.

    ``order_by`` must be a total order (include a unique tie-break) or
    ranks are nondeterministic, exactly as with the window form.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = df.repartitionByRange(num_partitions, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    w_loc = Window.partitionBy(_PID).orderBy(*order_by)
    w_cum = w_loc.rowsBetween(Window.unboundedPreceding, 0)
    local = ranged.withColumn(_LRN, F.row_number().over(w_loc).cast("long"))
    for col, name in cum_sums:
        local = local.withColumn(f"__gr_lc_{name}", F.sum(col).over(w_cum))
    # PIN a single materialization: the offsets aggregate and the final
    # join both consume `local`, and if Catalyst compiles the range
    # exchange twice (exchange reuse is not guaranteed — union/broadcast
    # shapes break it), each instance SAMPLES ITS OWN range boundaries
    # (RangePartitioner seeds by rdd.id), so the offsets would describe a
    # different partitioning than the one the ranks were computed in.
    # A lazy localCheckpoint wraps one concrete RDD — every branch reads
    # the same blocks, computed once. (Same pinning idiom as
    # operators/components.py's iteration state.)
    local = local.localCheckpoint(eager=False)

    aggs = [F.count("*").cast("long").alias("__gr_cnt")]
    aggs += [F.sum(col).alias(f"__gr_s_{name}") for col, name in cum_sums]
    ptot = local.groupBy(_PID).agg(*aggs)
    # prefix-sum the per-partition totals over partition id: |partitions|
    # rows, bounded by the shuffle-partition count — never data-sized
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.coalesce(F.sum("__gr_cnt").over(w_off), F.lit(0).cast("long")).alias(
            "__gr_off_cnt"
        )
    ]
    for _, name in cum_sums:
        off_cols.append(
            F.coalesce(
                F.sum(f"__gr_s_{name}").over(w_off),
                F.lit(0).cast("long"),
            ).alias(f"__gr_off_{name}")
        )
    offsets = ptot.select(_PID, *off_cols)

    out = local.join(F.broadcast(offsets), _PID)
    out = out.withColumn(
        rn_name, (F.col("__gr_off_cnt") + F.col(_LRN)).cast("long")
    )
    for _, name in cum_sums:
        out = out.withColumn(
            name, F.col(f"__gr_off_{name}") + F.col(f"__gr_lc_{name}")
        )
    drop = [_PID, _LRN, "__gr_off_cnt"]
    drop += [f"__gr_lc_{n}" for _, n in cum_sums]
    drop += [f"__gr_off_{n}" for _, n in cum_sums]
    return out.drop(*drop)


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """SQL-standard ``ntile(k)`` from a 1-based global rank ``rn`` among
    ``n`` rows, in closed form: with base = n div k and rem = n mod k,
    the first ``rem`` buckets hold base+1 rows.  Matches Spark's and
    DuckDB's ntile exactly (both implement the standard), so a
    two-phase rank plus this formula replaces the unpartitioned ntile
    window one-for-one."""
    nn = n.cast("long")
    rem = nn % F.lit(k)
    base = ((nn - rem) / F.lit(k)).cast("long")
    cutoff = rem * (base + F.lit(1))
    in_head = rn <= cutoff
    head_tile = F.floor((rn - F.lit(1)).cast("double") / (base + F.lit(1))) + 1
    # greatest(base,1): when n < k the head covers every row, but the
    # vectorized otherwise-branch still evaluates — keep its divisor nonzero
    tail_tile = (
        rem
        + F.floor(
            (rn - cutoff - F.lit(1)).cast("double") / F.greatest(base, F.lit(1))
        )
        + 1
    )
    return F.when(in_head, head_tile).otherwise(tail_tile).cast("int")
