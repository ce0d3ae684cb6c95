"""As-of join semantics: inclusive match, per-key isolation, null when
no prior right row. Oracle parity (vs DuckDB's native ASOF JOIN) is in
test_oracle_parity via the events_asof_purchase entry."""

from __future__ import annotations

import datetime

from nano_vectordb_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # before any right -> null
            (2, 10, _ts("2024-01-01 12:00:00")),  # exact tie -> inclusive
            (3, 10, _ts("2024-01-01 13:00:00")),  # between rights -> 12:00
            (4, 20, _ts("2024-01-01 23:00:00")),  # other key isolated
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 12:00:00"), 1.0),
            (10, _ts("2024-01-01 14:00:00"), 2.0),
            (20, _ts("2024-01-01 01:00:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(left, right, on="user_id", right_payload=("value",)).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01 12:00:00"), 1.0)
    assert out[3] == (_ts("2024-01-01 12:00:00"), 1.0)
    assert out[4] == (_ts("2024-01-01 01:00:00"), 9.0)
    assert len(out) == 4  # left rows preserved exactly once


def test_asof_null_payload_not_backfilled(spark):
    """When the MATCHED (latest) right row has a NULL payload value, the
    output must carry that NULL — not back-fill the column from an older
    right row (all carried columns come from one matched row; DuckDB
    ASOF semantics)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 15:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 12:00:00"), 1.0, "a"),
            (10, _ts("2024-01-01 14:00:00"), None, "b"),  # matched, NULL value
        ],
        "user_id long, ts timestamp, value double, tag string",
    )
    r = asof_join(
        left, right, on="user_id", right_payload=("value", "tag")
    ).first()
    assert r.asof_ts == _ts("2024-01-01 14:00:00")
    assert r.asof_value is None  # NOT 1.0 from the older row
    assert r.asof_tag == "b"


def test_range_join_spans_buckets(spark):
    from nano_vectordb_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:59:59")),  # inside, same bucket as start
            (2, 10, _ts("2024-01-01 12:30:00")),  # inside, TWO buckets after start
            (3, 10, _ts("2024-01-01 13:00:00")),  # == end, exclusive -> no match
            (4, 10, _ts("2024-01-01 09:59:59")),  # before start -> no match
            (5, 20, _ts("2024-01-01 11:00:00")),  # wrong key -> no match
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 13:00:00"), 7.0)],
        "user_id long, win_start timestamp, win_end timestamp, v double",
    )
    out = range_join(
        left, right, on="user_id", start="win_start", end="win_end",
        bucket_seconds=3600,
    )
    assert sorted(r.event_id for r in out.collect()) == [1, 2]
