"""Custom stateful streaming operator: gap-based sessionization.

The batch variant (q_sessionize) is a window + running sum. In a real
stream, session assignment needs per-key state that outlives a
micro-batch — Spark's escape hatch for custom stateful logic is
``applyInPandasWithState`` (Arrow-batched per-group state, the
Structured Streaming analogue of a custom stateful operator).

State per user: (session_seq, last_ts, n_events, session_start).
A new event more than ``gap_seconds`` after ``last_ts`` closes the
current session (emitted) and opens the next. ``ProcessingTimeTimeout``
flushes idle users' final sessions.

Scale notes: state is partitioned by user_id (one shuffle per batch —
unavoidable for keyed state); per-group state is O(1) (four scalars),
so 10^9 users ≈ tens of GB of state across the cluster, well inside
RocksDB state-store territory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_seq int, n_events long, "
    "session_start timestamp, session_end timestamp"
)
STATE_SCHEMA = "session_seq int, last_ts double, n_events long, start_ts double"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events(user_id, ts, ...) → closed sessions, one row per session.

    Works on a streaming DataFrame (update-mode sink). Events inside a
    micro-batch are sorted per user before folding, so in-batch
    disorder is tolerated; cross-batch late events beyond the gap
    start a (correctly separate) new session.

    ``idle_timeout_ms``: when set, idle users' final sessions are
    flushed via ProcessingTimeTimeout. Note this keeps the query
    triggering (empty timeout batches), so ``processAllAvailable``
    no longer settles — use only with a real trigger interval.
    Default None = NoTimeout: a user's last session closes when their
    next event arrives (or never — batch drains handle final flush).
    """
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                seq, last_ts, n, start_ts = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_seq": [seq],
                        "n_events": [n],
                        "session_start": [pd.Timestamp(start_ts, unit="s")],
                        "session_end": [pd.Timestamp(last_ts, unit="s")],
                    }
                )
            return

        if state.exists:
            seq, last_ts, n, start_ts = state.get
        else:
            seq, last_ts, n, start_ts = 0, None, 0, None

        closed: list[tuple[int, int, float, float]] = []
        ts_all = pd.concat([p["ts"] for p in pdfs]).sort_values()
        for ts in ts_all:
            t = ts.timestamp()
            if last_ts is None:
                seq, n, start_ts = 1, 1, t
            elif t - last_ts > gap_seconds:
                closed.append((seq, n, start_ts, last_ts))
                seq, n, start_ts = seq + 1, 1, t
            else:
                n += 1
            last_ts = t

        state.update((seq, last_ts, n, start_ts))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_seq": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2], unit="s") for c in closed],
                    "session_end": [pd.Timestamp(c[3], unit="s") for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
