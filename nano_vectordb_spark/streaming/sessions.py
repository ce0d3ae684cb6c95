"""Custom stateful streaming: sessionization with applyInPandasWithState.

The batch shape of this operator is registry.events_sessionize (lag +
running sum). The streaming version keeps one open session per user in
group state and closes it on a 30-minute event-time gap — the
`applyInPandasWithState` pattern the engine offers for operators that
windowed aggregation can't express.

Emission contract: every batch emits all sessions *observed so far in
that batch*, including the still-open trailing session (a real sink
upserts by (user_id, session_start); with Trigger.AvailableNow over a
static source there is one batch and the output equals the batch
operator exactly — asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# _sessionize_group ships to executors by name unless this module is
# registered for by-value pickling; executors in an externally-driven
# session (different cwd, no PYTHONPATH entry for the repo) cannot
# import it otherwise.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

GAP_US = 1800 * 1_000_000

# timestamp_ntz: the input ts is NTZ (sources/tables.py) and pandas
# carries naive wall-clock values, so an NTZ output round-trips
# verbatim — a plain `timestamp` would re-interpret the naive values in
# the session timezone and shift under non-UTC driver sessions.
OUT_SCHEMA = (
    "user_id long, session_start timestamp_ntz, session_end timestamp_ntz,"
    " n_events long"
)
STATE_SCHEMA = "start long, end long, n long"


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()
    if state.exists:
        start, end, n = state.get
        open_sess = [start, end, n]
    else:
        open_sess = None
    out: list[tuple[int, int, int, int]] = []
    for t in ts_us:
        if open_sess is None:
            open_sess = [t, t, 1]
        elif t - open_sess[1] > GAP_US:
            out.append((user_id, open_sess[0], open_sess[1], open_sess[2]))
            open_sess = [t, t, 1]
        else:
            open_sess[1] = t
            open_sess[2] += 1
    if open_sess is not None:
        out.append((user_id, open_sess[0], open_sess[1], open_sess[2]))
        state.update((open_sess[0], open_sess[1], open_sess[2]))
    yield pd.DataFrame(
        {
            "user_id": [r[0] for r in out],
            "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
            "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
            "n_events": [r[3] for r in out],
        }
    )


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the events stream
    (Trigger.AvailableNow) and return the emitted sessions."""
    from pyspark.sql import types as T

    from .events import stream_table

    stream = stream_table(spark, sf_dir, "events")
    batch_schema = stream.schema
    if isinstance(batch_schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    sessions = (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    from nano_vectordb_spark.streaming.events import run_stream_to_table

    return run_stream_to_table(spark, sessions, "sess", "append")
