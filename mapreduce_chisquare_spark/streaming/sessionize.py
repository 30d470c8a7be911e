"""Custom stateful streaming operator: per-user sessionization with
applyInPandasWithState — the escape hatch for operators Structured
Streaming's built-ins can't express (the reference has no streaming at
all; SURVEY.md §2.8).

State = (current session start, last event ts, count) per user; an
event starting >= GAP after the last one closes the session and emits
it. Timeouts flush sessions when a user goes quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 300

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    start_us, last_us, n = (
        state.get if state.exists else (None, None, 0)
    )
    out = []
    ts = (
        pd.concat([p["ts"] for p in pdfs])
        .sort_values()
        .astype("int64")
        // 1000  # pandas ns → µs
    )
    for t in ts:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us >= GAP_SECONDS * 1_000_000:
            out.append((user_id, start_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    if state.hasTimedOut:
        if start_us is not None:
            out.append((user_id, start_us, n))
        state.remove()
    else:
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        out, columns=["user_id", "session_start_us", "n_events"]
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events(ts timestamp, user_id long, ...) → closed sessions."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
