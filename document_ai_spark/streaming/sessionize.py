"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState``.

The batch engine computes sessions with a lag-window (queries.
q_user_sessions, W2); on a live event stream the same semantics need
per-key state that survives micro-batches: this operator keeps each user's
open session (start, last-seen, count) in the state store, emits a session
row when a gap exceeds SESSION_GAP_US or the state times out, and carries
everything else forward — the pattern the engine uses for any custom
stateful operator at crawl-ingest scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 1800 * 1_000_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            rows.append((user_id, start, last, n, "timeout"))
            state.remove()
    else:
        ts = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["ts_us"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_US:
                rows.append((user_id, start, last, n, "gap"))
                start, last, n = t, t, 1
            else:
                # events are sorted within a micro-batch but may arrive
                # out-of-order ACROSS batches: an in-gap straggler must
                # only widen the open session, never regress its bounds
                start = min(start, t)
                last = max(last, t)
                n += 1
        if start is not None:
            state.update((start, last, n))
    yield pd.DataFrame(
        rows,
        columns=[
            "user_id", "session_start_us", "session_end_us", "n_events",
            "closed_by",
        ],
    )


def stream_sessionize(events: DataFrame):
    """events stream with (user_id, ts_us) -> closed-session stream.
    Apply `writeStream.outputMode("update")` downstream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        # NoTimeout: sessions close on gap evidence only. A processing-time
        # timeout would keep availableNow drains alive waiting for wall
        # clock — wrong fit for batch-drain deployments; a long-running
        # ingest that needs idle-session flushing would switch this to
        # ProcessingTimeTimeout + setTimeoutDuration.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
