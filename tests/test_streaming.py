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
