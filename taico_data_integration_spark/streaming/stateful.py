"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY.md §2.10 mapping; the round-spec's
'custom stateful operators' escape hatch).

Per user_id, events closer than `gap` belong to one session; a session is
emitted when the event-time watermark passes its close. State per key is a
single open session (start, last, count) — O(keys) state, checkpointed by
the state store. The batch twin (queries.sync.events_sessionize) computes
the same sessions with window functions; the test compares bounded-replay
output against it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("count", LongType()),
    ]
)


def _sessionize_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_seconds: int
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, count = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [count],
            }
        )
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()
    if not ts_us:
        return

    sessions = []
    if state.exists:
        start_us, last_us, count = state.get
    else:
        start_us = last_us = count = None
    gap_us = gap_seconds * 1_000_000
    for t in ts_us:
        if start_us is None:
            start_us = last_us = t
            count = 1
        elif t - last_us > gap_us:
            sessions.append((start_us, last_us, count))
            start_us = last_us = t
            count = 1
        else:
            last_us = t
            count += 1
    state.update((start_us, last_us, count))
    state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

    if sessions:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [c for _, _, c in sessions],
            }
        )


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours") -> DataFrame:
    """Session windows over a stream of (user_id, ts, ...) rows."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
