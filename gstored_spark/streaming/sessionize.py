"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY §2.9); this is the
beyond-reference training-data-pipeline operator the north rule's
streaming clause prescribes: per-key session state maintained across
micro-batches with an event-time timeout, the Structured Streaming
counterpart of the batch gaps-and-islands query (the
``events_sessionize`` driver oracle) — SAME gap rule, SAME output columns,
asserted equal in tests on the closed-session set.

Shape at scale: state is one tuple per ACTIVE user (not per event), the
per-batch work is an Arrow-batched pandas walk over that user's new
events, and sessions close either by an observed gap inside a batch or by
the watermark passing ``last_event_ts + gap`` (EventTimeTimeout) — no
unbounded buffering, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_event", T.LongType()),
        T.StructField("last_event", T.LongType()),
    ]
)

# open-session state per user: (session_start_s, last_event_s, n, first, last)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_s", T.LongType()),
        T.StructField("last_s", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_event", T.LongType()),
        T.StructField("last_event", T.LongType()),
    ]
)


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) -> closed sessions
    (user_id, n_events, first_event, last_event), append mode.

    A session closes when a >gap silence is OBSERVED inside a batch, or
    when the event-time watermark passes ``last_ts + gap`` (the state's
    timeout) — exactly the batch rule ``gap > gap_seconds`` evaluated
    incrementally. Events are walked in (ts, event_id) order per user,
    the batch query's sort order, so session boundaries agree."""
    gap = int(gap_seconds)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]

        def emit(sessions):
            return pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "n_events": s[2],
                        "first_event": s[3],
                        "last_event": s[4],
                    }
                    for s in sessions
                ]
            )

        if state.hasTimedOut:
            cur = state.get
            state.remove()
            yield emit([cur])
            return

        rows = []
        for pdf in pdfs:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                rows.append((int(pd.Timestamp(ts).value // 1_000_000_000), int(eid)))
        rows.sort()
        cur = list(state.get) if state.exists else None
        closed = []
        for s, eid in rows:
            if cur is not None and s - cur[1] > gap:
                closed.append(cur)
                cur = None
            if cur is None:
                cur = [s, s, 1, eid, eid]
            else:
                cur[1] = max(cur[1], s)
                cur[2] += 1
                cur[3] = min(cur[3], eid)
                cur[4] = max(cur[4], eid)
        if cur is not None:
            state.update(tuple(cur))
            # EventTimeTimeout timestamps must lead the current watermark;
            # a session whose deadline the watermark already passed fires
            # on the next watermark advance
            deadline_ms = (cur[1] + gap) * 1000
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield emit(closed)

    return (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("event_id").cast("long").alias("event_id"),
        )
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
