"""Streaming session lifecycle — the stateful-operator twin of
``operators/lifecycle`` (reference: cognee/modules/session_lifecycle/
usage_tracking.py:33-169 + metrics.py get_effective_status_sql).

The batch engine computes ``abandoned`` AT READ TIME (last_activity_at vs a
threshold) because a batch log is complete when scanned. A stream never
completes, so the same rule becomes an event-time timeout: when the
watermark passes ``last_activity + gap`` the session is abandoned and its
record is emitted exactly once. Terminal events ('completed'/'failed' rows
in the same call stream) emit immediately and FREEZE the session — the
reference's "writes to running sessions only" rule — by tombstoning the
state until the timeout GCs it, so stragglers inside the watermark never
reopen an ended session (stragglers beyond the watermark are dropped by
Spark before they reach the operator).

Shape notes for scale: state is one fixed-width row per LIVE session (no
per-call history), keyed by session_id — the same key the reference uses as
its primary key — so state size is O(concurrent sessions), not O(calls).
Pricing/token estimation happens UPSTREAM in ``lifecycle.priced_calls``,
which is a pure codegen projection and therefore stream-safe; the stateful
operator only folds already-priced numbers.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TERMINAL_STATUSES = ("completed", "failed")  # models.py SessionRecord vocab

OUTPUT_SCHEMA = StructType(
    [
        StructField("session_id", StringType()),
        StructField("user_id", StringType()),
        StructField("started_at", TimestampType()),
        StructField("last_activity_at", TimestampType()),
        StructField("n_calls", LongType()),
        StructField("tokens_in", LongType()),
        StructField("tokens_out", LongType()),
        StructField("cost_usd", DoubleType()),
        StructField("error_count", LongType()),
        StructField("status", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("started_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_calls", LongType()),
        StructField("tokens_in", LongType()),
        StructField("tokens_out", LongType()),
        # integer nanodollars: float addition is not associative, so summing
        # per-call doubles would make the fold's result depend on event order;
        # ints make it exact and replayable by any batch engine
        StructField("cost_nanos", LongType()),
        StructField("error_count", LongType()),
        StructField("closed", BooleanType()),
    ]
)


def _ms(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[ns]").astype("int64") // 1_000_000


def _record(session_id: str, st: Tuple[Any, ...], status: str) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "session_id": session_id,
                "user_id": st[0],
                "started_at": pd.Timestamp(st[1], unit="ms"),
                "last_activity_at": pd.Timestamp(st[2], unit="ms"),
                "n_calls": st[3],
                "tokens_in": st[4],
                "tokens_out": st[5],
                "cost_usd": st[6] / 1e9,
                "error_count": st[7],
                "status": status,
            }
        ]
    )


def _make_tracker(gap_ms: int):
    def track(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (session_id,) = key
        if state.hasTimedOut:
            st = state.get
            state.remove()
            if not st[8]:  # tombstone already emitted its terminal record
                yield _record(session_id, st, "abandoned")
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        st = state.get if state.exists else (None, None, 0, 0, 0, 0, 0, 0, False)
        user, started, last = st[0], st[1], st[2]
        n_calls, tin, tout, cost, errs, closed = st[3], st[4], st[5], st[6], st[7], st[8]

        terminal: str | None = None
        ts_ms = _ms(rows["ts"])
        has_status = "status" in rows.columns
        for i in range(len(rows)):
            if closed:
                break  # frozen: a terminal event already ended this session
            t = int(ts_ms.iloc[i])
            started = t if started is None else min(started, t)
            last = t if last is None else max(last, t)
            if user is None and rows["user_id"].iloc[i] is not None:
                user = rows["user_id"].iloc[i]
            status = rows["status"].iloc[i] if has_status else None
            if status in TERMINAL_STATUSES:
                terminal = status
                closed = True
                continue  # end-events don't count as calls
            n_calls += 1
            tin += int(rows["tokens_in"].iloc[i] or 0)
            tout += int(rows["tokens_out"].iloc[i] or 0)
            cost += int(round(float(rows["cost_usd"].iloc[i] or 0.0) * 1e9))
            errs += int(bool(rows["error"].iloc[i])) if "error" in rows.columns else 0

        new_state = (user, started, last, n_calls, tin, tout, cost, errs, closed)
        state.update(new_state)
        # keep the tombstone until the watermark passes the gap, then GC
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        if terminal is not None:
            yield _record(session_id, new_state, terminal)

    return track


def stream_session_records(
    calls: DataFrame,
    gap_seconds: int = 1800,  # lifecycle.ABANDON_AFTER_SECONDS
    watermark: str = "10 minutes",
) -> DataFrame:
    """Fold a streaming priced-call log into final session records.

    ``calls`` is a STREAMING frame with (session_id, user_id, ts timestamp,
    tokens_in, tokens_out, cost_usd, error?, status?) — the output of
    ``lifecycle.priced_calls`` over the wire format. Emits one row per
    session: on its terminal event ('completed'/'failed'), or with status
    'abandoned' once the watermark passes ``last_activity + gap_seconds``.
    """
    return (
        calls.withWatermark("ts", watermark)
        .groupBy("session_id")
        .applyInPandasWithState(
            _make_tracker(gap_seconds * 1000),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


__all__ = ["stream_session_records", "OUTPUT_SCHEMA", "TERMINAL_STATUSES"]
