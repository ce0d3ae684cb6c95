"""Streaming/batch parity: the stateful streaming sessionizer over a
single AvailableNow batch must equal the batch sessionize operator."""

from __future__ import annotations

from nano_vectordb_spark import registry
from nano_vectordb_spark.streaming.sessions import sessionize_stream
from tests.conftest import SF_CORRECT


def test_stream_sessionize_matches_batch(spark):
    stream = sessionize_stream(spark, SF_CORRECT)
    batch = registry.REGISTRY["events_sessionize"].fn(spark, SF_CORRECT)
    s = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in stream.collect()
    )
    b = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    )
    assert s == b


def test_stream_event_counts_matches_batch_sql(spark, duck):
    from tests.oracle_harness import compare

    e = registry.REGISTRY["stream_event_counts"]
    ok, msg = compare(e.fn(spark, SF_CORRECT), duck, e.oracle)
    assert ok, msg


def test_stream_ivf_ingest_equals_batch_assignment(spark):
    """The streaming ingest stats must equal a batch assignment with
    the same centroids — stream/batch parity, DataFrame to DataFrame
    (the oracle crosschecks DuckDB; this pins Spark vs Spark)."""
    from pyspark.sql import functions as F

    from nano_vectordb_spark import registry
    from nano_vectordb_spark.functions import kmeans as km
    from nano_vectordb_spark.registry_parts.p03_ivf import _oracle_centroids_np
    from nano_vectordb_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECT

    got = sorted(
        map(tuple, registry.REGISTRY["stream_ivf_ingest"].fn(spark, SF_CORRECT).collect())
    )
    emb = load_table(spark, SF_CORRECT, "embeddings")
    want = sorted(
        map(
            tuple,
            km.assign_clusters(emb, _oracle_centroids_np())
            .groupBy("cluster_id")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("vec_id").cast("long").alias("s"),
            )
            .select(F.col("cluster_id").cast("int"), "n", "s")
            .collect(),
        )
    )
    assert got == want and len(got) > 1


def test_stream_dedup_ingest_equals_batch_incremental(spark):
    """Streaming dedup-at-ingest must reproduce the batch
    dedup_incremental row for row."""
    from nano_vectordb_spark import registry
    from tests.conftest import SF_CORRECT

    got = sorted(
        map(tuple, registry.REGISTRY["stream_dedup_ingest"].fn(spark, SF_CORRECT).collect())
    )
    want = sorted(
        map(tuple, registry.REGISTRY["dedup_incremental"].fn(spark, SF_CORRECT).collect())
    )
    assert got == want and len(got) > 0


def test_stream_table_reads_directory_layout(spark, tmp_path):
    """pathGlobFilter matches FILE names only: against a Spark-written
    directory layout (table.parquet/part-*) the old construction
    silently streamed zero rows (found by the r5 sf1 scale run).
    stream_table must read BOTH layouts and never return empty for a
    non-empty table."""
    from pyspark.sql import functions as F

    from nano_vectordb_spark.streaming.events import (
        run_stream_to_table,
        stream_table,
    )

    src = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    n_src = src.count()
    # directory layout: df.write.parquet -> events.parquet/part-*
    src.repartition(3).write.parquet(str(tmp_path / "events.parquet"))
    for sf_dir in (SF_CORRECT, str(tmp_path)):
        stream = stream_table(spark, sf_dir, "events")
        agg = stream.groupBy().agg(F.count("*").alias("n"))
        out = run_stream_to_table(spark, agg, "lay", "complete")
        assert out.collect()[0].n == n_src, sf_dir


def test_update_merged_emits_only_changed_keys_multibatch(spark, tmp_path):
    """r5 VERDICT item 4: drive run_stream_update_merged through a
    GENUINE multi-microbatch stream (maxFilesPerTrigger=1 over a
    4-file source, AvailableNow) and turn the update-mode claim into a
    measured fact:
      (a) each data microbatch emits exactly the keys whose state
          changed in that batch (= the distinct group keys present in
          that batch's file) — NOT the accumulated state a Complete
          sink would replay, so sink traffic stays bounded on a
          long-lived ingest stream;
      (b) the last-writer-wins merged table equals the batch groupBy
          over the full input, row for row."""
    from pyspark.sql import functions as F

    from nano_vectordb_spark.streaming.events import run_stream_update_merged

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    n_files = 4
    src_dir = tmp_path / "docs_stream"
    per_file_keys = []
    for i in range(n_files):
        part = docs.filter(F.col("doc_id") % n_files == i)
        # one parquet FILE per slice => one microbatch per slice under
        # maxFilesPerTrigger=1
        part.coalesce(1).write.mode("append").parquet(str(src_dir))
        per_file_keys.append(part.select("lang").distinct().count())

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    agg = stream.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    epoch_rows: dict[int, int] = {}
    merged = run_stream_update_merged(
        spark, agg, "mb", ["lang"], epoch_rows=epoch_rows
    )

    # one data microbatch per file, every batch emitted something
    assert len(epoch_rows) == n_files
    # (a) per-batch emissions are exactly that batch's changed keys.
    # File->epoch order follows the source's file listing, so compare
    # as multisets (every slice holds all langs here, so this is also
    # the strongest per-epoch equality the fixture can express).
    assert sorted(epoch_rows.values()) == sorted(per_file_keys)
    # total sink traffic = sum of per-batch changed keys; a Complete
    # sink over the same run would have replayed cumulative state
    cumulative = sum(
        docs.filter(F.col("doc_id") % n_files <= i)
        .select("lang")
        .distinct()
        .count()
        for i in range(n_files)
    )
    assert sum(epoch_rows.values()) <= cumulative

    # (b) merged result == batch aggregation over the union
    got = sorted(map(tuple, merged.collect()))
    want = sorted(
        map(
            tuple,
            docs.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0
