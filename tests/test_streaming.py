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
