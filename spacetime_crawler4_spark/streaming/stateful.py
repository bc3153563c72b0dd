"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with lag + running sum (queries.py
q_events_sessionize); the streaming form keeps (last_epoch, n_events,
n_sessions) per user in the state store and folds each micro-batch's
Arrow batches into it — the Structured Streaming pattern for operators
the built-in windowed aggregations can't express (gap-based sessions need
per-key sequential state, not a fixed window).

Semantics match the batch query exactly: events processed in (ts,
event_id) order per user; a session opens when the gap to the previous
event exceeds ``gap_seconds``; the initial previous-epoch is 0, so the
first event always opens a session (the batch query's
``coalesce(lag(epoch), 0)``). Equality holds for any micro-batch split
whose per-user event times never go backwards across batches (e.g.
time-partitioned drops); within a batch the operator sorts.

Output (update mode): one (user_id, n_events, n_sessions) row per user
per batch with the running totals — both counters are monotone, so the
final value per user is the max.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_epoch", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)


def make_sessionize_fn(gap_seconds: int = 1800):
    gap = int(gap_seconds)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_epoch, n_events, n_sessions = (
            state.get if state.exists else (0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        epochs = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
        for ep in epochs:
            if ep - last_epoch > gap:
                n_sessions += 1
            last_epoch = ep
        n_events += len(epochs)
        state.update((int(last_epoch), int(n_events), int(n_sessions)))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": int(n_events),
                    "n_sessions": int(n_sessions),
                }
            ]
        )

    return fn


def sessionize_stream(events_stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) -> running per-user
    session/event counts via the state store."""
    return (
        events_stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionize_fn(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
