"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.2: streaming *absent in
reference*); this module is part of the pipeline-extension surface.
The batch table stands in for the stream via a file source with
Trigger.AvailableNow — the exact plan a Kafka-backed deployment would
run, minus the connector.

Design for scale: windowed aggregation keyed by (window, event_type)
with a watermark bounds state; counts and DECIMAL sums are associative,
so partial aggregation happens map-side before the keyed state update.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import ensure_read_confs

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

# State-store partition count for the demo streams. A streaming agg
# creates/commits one state store per shuffle partition per microbatch
# — pure fixed overhead when the key cardinality (windows x event_type,
# or user_id sessions) is far below the batch-side shuffle parallelism.
# Sizing state partitions to the keyspace is the standard Structured
# Streaming knob; at production scale a caller passes a bigger value.
STREAM_STATE_PARTITIONS = 8


def _fast_checkpoint_dir(name: str) -> str:
    """Checkpoint dir on the fastest local scratch available. The
    offset/commit logs fsync once per microbatch — on a disk-backed
    /tmp that is the single biggest fixed cost of a short AvailableNow
    run (~0.15 s measured at sf0.1); tmpfs removes it. Production
    deployments put checkpoints on durable storage — these demo streams
    re-derive everything from the source, so scratch is the right
    durability tier here."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    root = os.path.join(base, "nvdb_stream_ckpt")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"{name}_{os.getpid()}")


def run_stream_to_table(
    spark: SparkSession,
    sdf: DataFrame,
    prefix: str,
    output_mode: str,
    state_partitions: int = STREAM_STATE_PARTITIONS,
) -> DataFrame:
    """Start ``sdf`` as a memory-sink AvailableNow query and return the
    materialized result table. ``spark.sql.shuffle.partitions`` is
    scoped to ``state_partitions`` around query start (the conf is read
    at stream start and frozen into the checkpoint), then restored.

    Fixed-overhead controls (they dominate a one-shot AvailableNow run):
    the checkpoint goes on tmpfs scratch (removed after stop), and for
    complete/update output the trailing no-data microbatch is skipped —
    it exists only to let APPEND mode emit watermark-expired windows
    after the last data batch, so for complete/update it is a full
    extra state-store commit cycle that produces nothing. Append-mode
    streams (stream-stream join, sessionize) keep it: their final
    windows only flush in that batch."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = _fast_checkpoint_dir(name)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    skip_nodata = output_mode in ("complete", "update")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if skip_nodata:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    try:
        q.awaitTermination()
        q.stop()
    finally:
        # restore only after termination: the flag is consulted per
        # microbatch, not frozen at start
        if skip_nodata:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
            )
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_stream_update_merged(
    spark: SparkSession,
    sdf: DataFrame,
    prefix: str,
    key_cols: list[str],
    state_partitions: int = STREAM_STATE_PARTITIONS,
    epoch_rows: dict[int, int] | None = None,
) -> DataFrame:
    """Update-output AvailableNow query with a SINK-SIDE MERGE: each
    microbatch emits only the keys whose state changed (not the whole
    accumulated state, as Complete mode would — on a long-lived ingest
    stream Complete re-emits per-key state every batch, growing without
    bound), and the sink folds those deltas into a result table by
    last-writer-wins per key — exactly what `MERGE INTO ... WHEN MATCHED
    UPDATE` does against a Delta/Iceberg sink in production.

    Mechanics: foreachBatch appends the batch's update rows tagged with
    the epoch id to scratch parquet; the merged view keeps, per
    ``key_cols``, the row from the LATEST epoch (a key-partitioned
    window — never a global one). The merged result is localCheckpointed
    so the scratch dir can be removed before returning.

    ``epoch_rows`` (optional out-param): filled with {epoch_id: rows
    emitted in that microbatch}, read back from the epoch-tagged sink
    before cleanup — the measurable form of the update-mode claim that
    each batch emits only its CHANGED keys, not accumulated state
    (asserted under a forced multi-microbatch run in
    tests/test_streaming.py)."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = _fast_checkpoint_dir(name)
    sink_dir = ckpt + "_sink"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    def _merge_batch(bdf: DataFrame, epoch_id: int) -> None:
        bdf.withColumn("_epoch", F.lit(epoch_id)).write.mode("append").parquet(
            sink_dir
        )

    try:
        q = (
            sdf.writeStream.foreachBatch(_merge_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    try:
        q.awaitTermination()
        q.stop()
    finally:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
        )
    try:
        if not os.path.isdir(sink_dir):
            return spark.createDataFrame([], sdf.schema)
        from pyspark.sql import Window

        if epoch_rows is not None:
            for r in (
                spark.read.parquet(sink_dir)
                .groupBy("_epoch")
                .agg(F.count("*").alias("n"))
                .collect()
            ):
                epoch_rows[int(r["_epoch"])] = int(r["n"])

        w = Window.partitionBy(*key_cols).orderBy(F.col("_epoch").desc())
        merged = (
            spark.read.parquet(sink_dir)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_epoch")
            .localCheckpoint(eager=True)
        )
        return merged
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)


def stream_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File-source stream over one table of an sf dir, handling BOTH
    physical layouts: a single file ``{table}.parquet`` (the driver's
    testdata) and a Spark-written directory ``{table}.parquet/part-*``
    (any output of df.write.parquet, e.g. the sf1 scale fixtures).

    The file source only accepts directories, so the single-file layout
    streams from ``sf_dir`` with a pathGlobFilter on the table name.
    That filter matches FILE names — against a directory layout it
    matches nothing and the stream silently reads zero rows (a bug this
    helper exists to prevent), so the directory layout streams from the
    table path itself."""
    from ..sources.tables import raw_parquet_schema

    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = raw_parquet_schema(spark, path)
    if os.path.isdir(path):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf_dir)
    )


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet with ts as TIMESTAMP (LTZ).

    Watermarks only accept TIMESTAMP, but the batch loader normalizes ts
    to TIMESTAMP_NTZ (sources/tables.py). Rebase the NTZ wall time to
    the UTC instant with the same wall clock — timestampdiff against the
    NTZ epoch then timestamp_micros is timezone-free, so watermarks and
    window boundaries are identical under any session timezone."""
    stream = stream_table(spark, sf_dir, "events")
    batch_schema = stream.schema
    dt = batch_schema["ts"].dataType
    if isinstance(dt, T.LongType):  # TIMESTAMP(NANOS) via nanosAsLong
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        stream = stream.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, ts)")
            ),
        )
    return stream


def windowed_event_counts_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value totals per event_type, computed by
    an actual streaming query (file source -> watermark -> window agg ->
    memory sink, Trigger.AvailableNow), returned as the final batch
    result with columns (window_start, event_type, n_events, total_value).
    """
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            ).alias("total_value"),
        )
        .select(
            # back to NTZ (UTC wall clock) so the output is
            # session-timezone-independent, like every batch query
            F.expr(
                f"timestampadd(MICROSECOND, unix_micros(w.start), {_NTZ_EPOCH})"
            ).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_stream_to_table(spark, agg, "ev", "complete")


def dedup_events_stream(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: dropDuplicatesWithinWatermark
    keyed on event_id — the streaming analog of exact_dedup. The
    watermark bounds the dedup state (at 100 TB/day of events the key
    set cannot live in memory unbounded; expiry after the watermark is
    the standard contract). Returns per-event_type counts of the
    deduplicated stream so the result is a stable small relation."""
    stream = _event_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique_events"))
    )
    return run_stream_to_table(spark, deduped, "dd", "complete")


def click_attribution_stream(
    spark: SparkSession,
    sf_dir: str,
    attribution: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: clicks attributed to the purchase
    window they fall in (same semantics as the batch range join,
    registry.events_range_join — the batch SQL is this query's oracle).

    The canonical hard streaming shape: an event-time range condition
    between two watermarked streams. The watermarks plus the time-range
    predicate bound BOTH sides' join state (Spark evicts rows once they
    can no longer match any future row) — without them a stream-stream
    join buffers forever. Output columns convert back to NTZ so the
    result is session-timezone-independent like every batch query.
    """
    stream = _event_stream(spark, sf_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"user_id = p_user AND ts >= p_ts"
            f" AND ts < p_ts + INTERVAL {attribution}"
        ),
    ).select(
        "event_id",
        "user_id",
        F.expr(
            f"timestampadd(MICROSECOND, unix_micros(ts), {_NTZ_EPOCH})"
        ).alias("ts"),
        F.expr(
            f"timestampadd(MICROSECOND, unix_micros(p_ts), {_NTZ_EPOCH})"
        ).alias("win_start"),
        F.expr(
            f"timestampadd(MICROSECOND, unix_micros(p_ts + INTERVAL {attribution}),"
            f" {_NTZ_EPOCH})"
        ).alias("win_end"),
        F.col("p_value").alias("purchase_value"),
    )
    return run_stream_to_table(spark, joined, "attr", "append")


def heavy_hitters_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 3,
    state_partitions: int = STREAM_STATE_PARTITIONS,
) -> DataFrame:
    """Streaming per-window heavy hitters: top-k users by event count
    per tumbling window. Structured Streaming cannot chain two
    aggregations in one query, so this runs the standard production
    split: the STREAM maintains the (window x user) pre-aggregation
    (watermark-bounded keyed state, map-side partial counts), and the
    serving side ranks the materialized result — exactly how a
    dashboard reads a streaming rollup table.

    Unlike the other demo streams, the keyed state here is DATA-SIZED:
    users grow with the corpus, so (window x user) is ~#events keys on
    a historical replay (sf100: ~100M). Two choices make that scale
    (the r6 sf100 run measured the naive form — complete output into a
    memory sink — OOM-ing a 48 GB heap):

    * UPDATE output + sink-side merge (`run_stream_update_merged`):
      each microbatch emits only changed keys into distributed
      parquet; complete mode re-emits the ENTIRE accumulated state
      through the driver-heap memory sink every batch.
    * RocksDB state store: keyed state lives off-heap/on-disk per
      partition instead of in the executor heap (the default
      HDFSBackedStateStore keeps the whole partition map on heap).

    The rank runs over one window's worth of users per partition.
    Ties break to the lowest user_id for determinism."""
    from pyspark.sql import Window

    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.expr(
                f"timestampadd(MICROSECOND, unix_micros(w.start), {_NTZ_EPOCH})"
            ).alias("window_start"),
            "user_id",
            "n_events",
        )
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, "")
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider",
    )
    try:
        tbl = run_stream_update_merged(
            spark,
            agg,
            "hh",
            ["window_start", "user_id"],
            state_partitions=state_partitions,
        )
    finally:
        if old_provider:
            spark.conf.set(provider_key, old_provider)
        else:
            spark.conf.unset(provider_key)
    rank_w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        tbl.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def late_drop_stream(
    spark: SparkSession,
    sf_dir: str,
    split_day: int = 8,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark late-data semantics, DEMONSTRATED and exactly
    checkable: the events table is split into an on-time file (days
    >= split_day) and a LATE file (days < split_day) whose
    modification times force the file source to deliver them as two
    microbatches in that order (maxFilesPerTrigger=1, oldest first).
    After batch 1 the watermark stands near the end of the month, so
    every row of batch 2 arrives below it and is DROPPED — if the
    engine failed to drop them, their (long-past) daily windows would
    finalize instantly and appear in the append-mode output. The
    emitted result is therefore exactly the on-time days whose window
    END cleared the final watermark: days split_day .. last_day-1 —
    a closed form the DuckDB oracle states directly.

    At scale this is the contract that bounds streaming state: state
    size follows the watermark horizon, not the stream's history."""
    import hashlib
    import os
    import shutil
    import time as _time

    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)
    root = "/tmp/nvdb_latedrop3_" + hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{split_day}".encode()
    ).hexdigest()[:8]
    if not os.path.exists(os.path.join(root, "_READY")):
        tmp = root + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        tbl = papq.read_table(src)
        day = pc.day(tbl.column("ts"))
        last_day = pc.max(day).as_py()
        # three microbatches: bulk on-time, a fresh tail, then the late
        # file. The tail batch matters: the watermark computed from the
        # bulk batch only becomes the late-row FILTER one batch later
        # (measured on this engine build), so late data must arrive at
        # least two batches after the data that advanced the watermark.
        papq.write_table(
            tbl.filter(
                pc.and_(pc.greater_equal(day, split_day), pc.less(day, last_day))
            ),
            os.path.join(tmp, "a_ontime.parquet"),
        )
        papq.write_table(
            tbl.filter(pc.greater_equal(day, last_day)),
            os.path.join(tmp, "b_tail.parquet"),
        )
        papq.write_table(
            tbl.filter(pc.less(day, split_day)),
            os.path.join(tmp, "c_late.parquet"),
        )
        now = _time.time()
        os.utime(os.path.join(tmp, "a_ontime.parquet"), (now - 120, now - 120))
        os.utime(os.path.join(tmp, "b_tail.parquet"), (now - 60, now - 60))
        os.utime(os.path.join(tmp, "c_late.parquet"), (now, now))
        open(os.path.join(tmp, "_READY"), "w").close()
        try:
            os.rename(tmp, root)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost a benign race

    ensure_read_confs(spark)
    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    dt = batch_schema["ts"].dataType
    if isinstance(dt, T.TimestampNTZType):
        stream = stream.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, ts)")
            ),
        )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.expr(
                f"timestampadd(MICROSECOND, unix_micros(w.start), {_NTZ_EPOCH})"
            ).alias("window_start"),
            "n_events",
        )
    )
    return run_stream_to_table(spark, agg, "late", "append")
