"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.7/§2.8 — the "custom stateful
operator" path for semantics Spark's built-ins can't express).

The batch formulation (windows.sessionize: lag + cumulative session ids)
is the oracle; this streaming twin keeps one open session per user in
GroupState and must converge to it. Sessions are emitted when CLOSED by a
later event whose gap exceeds ``gap_min`` — deterministic on a finite
stream. Each user's still-open trailing session lives in state awaiting
either more events or an event-time timeout; on a finite availableNow
stream it is therefore *withheld*, exactly like append-mode windowed aggs
withhold non-finalised windows (tests compare against batch sessions
minus each user's last).

State per user is O(1) (start, end, count) — at web scale the shuffle is
keyed by user_id and state stores three longs per active user, so memory
is bounded by the active-user set of the watermark horizon, not by
events.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _sessionize_fn(gap_min: int):
    gap_us = gap_min * 60 * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # event-time timeout: the watermark passed the open session's
            # gap horizon — emit it as final and clear.
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        ts_us = ts.astype("int64") // 1000  # ns -> us
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0

        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = t, t, 1
            else:
                end_us, n = t, n + 1
        state.update((start_us, end_us, n))
        # timeout when the watermark passes session_end + gap: no later
        # event can extend the session, so it is final.
        state.setTimeoutTimestamp((end_us // 1000) + gap_min * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap sessionization. ``events`` must be a streaming DF
    with (user_id, ts); output appends one row per CLOSED session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_min),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
