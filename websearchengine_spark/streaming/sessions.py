"""Stateful streaming sessionization — the streaming twin of
pipeline/events.user_sessions (inactivity-gap sessions), expressed as a
custom stateful operator via ``applyInPandasWithState``.

Batch sessionization (the gate-checked oracle semantics) needs the user's
whole history; a stream cannot re-sort history per micro-batch. The
streaming form keeps ONE open session per user as state — (session_idx,
start_us, last_us, n_events) — and on each micro-batch:

- folds the user's new events in (ts, event_id) order through the same
  gap rule (a gap > ``gap_minutes`` closes the session and opens the
  next, session_idx increments);
- EMITS every session the batch closed (``closed_by='gap'``);
- re-registers an event-time timeout at last_ts + gap: a user with no
  further events gets their final session emitted by the watermark
  (``closed_by='timeout'``) — exactly when the batch rule would have
  closed it, so the union of emitted sessions equals the batch result on
  any replayed prefix whose watermark passed.

Scale shape: state is one fixed-width tuple per user SEEN (after a
timeout the tuple stays as a counter-only tombstone — the batch twin
numbers sessions ordinally over the user's whole history, so parity
requires remembering the per-user session count; a tombstone registers
no timer, so idle users cost state-store bytes but no timeout scans); each
micro-batch shuffles only its own events on user_id (the same single
exchange as the batch plan). Timeouts ride Spark's state store — no scan
of idle users. Skew note: a power-user's events still serialize within
their group (intrinsic to the semantics); the per-batch fold below is a
vectorized numpy pass, not a Python loop per event.

Parity: tests/test_streaming.py replays an event log through this
operator (maxFilesPerTrigger=1 → multiple micro-batches, mid-stream state
carry) and asserts the emitted sessions EQUAL pipeline/events.
user_sessions on the same prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed_by", StringType()),
    ]
)
# (session_idx, start_us, last_us, n_events) — the one open session
STATE_SCHEMA = StructType(
    [
        StructField("session_idx", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _make_session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        (user_id,) = key

        def _emit(rows):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
                    "session_idx": pd.Series([r[1] for r in rows], dtype="int64"),
                    "session_start": pd.to_datetime(
                        [r[2] for r in rows], unit="us"
                    ),
                    "session_end": pd.to_datetime([r[3] for r in rows], unit="us"),
                    "n_events": pd.Series([r[4] for r in rows], dtype="int64"),
                    "closed_by": [r[5] for r in rows],
                }
            )

        if state.hasTimedOut:
            idx, start_us, last_us, n = state.get
            # keep a TOMBSTONE carrying the session counter instead of
            # removing state: the batch twin numbers sessions ordinally
            # over the user's whole history, so a user who returns after
            # a timeout must continue at idx+1, not restart at 0 (which
            # would also emit a duplicate (user_id, session_idx) key).
            # start_us=-1 encodes "no open session"; no timeout is
            # re-registered, so the tombstone costs no timer scans.
            state.update((int(idx), -1, -1, 0))
            yield _emit([(user_id, idx, start_us, last_us, n, "timeout")])
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            idx, start_us, last_us, n = state.get
            if start_us == -1:  # tombstone: counter only, no open session
                start_us, last_us, n = None, None, 0
        else:
            idx, start_us, last_us, n = -1, None, None, 0
        if len(pdf) == 0:  # state-only invocation: nothing to fold
            if last_us is not None:
                state.setTimeoutTimestamp(
                    max(
                        last_us // 1000 + gap_minutes * 60 * 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            return

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        # pandas datetime64[ns] → µs (event precision is µs at most)
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()

        closed = []
        # vectorized: the positions where a NEW session starts (gap to the
        # previous event — including the carried last_us — exceeds the gap)
        prev = np.empty_like(ts_us)
        # no open session → sentinel forces position 0 to start one
        prev[0] = last_us if last_us is not None else np.iinfo(np.int64).min // 2
        prev[1:] = ts_us[:-1]
        new_starts = np.flatnonzero(ts_us - prev > gap_us)
        bounds = list(new_starts) + [len(ts_us)]
        if len(new_starts) == 0 or new_starts[0] != 0:
            # leading chunk extends the open session
            first_end = bounds[0]
            last_us = int(ts_us[first_end - 1]) if first_end > 0 else last_us
            n += first_end
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            # a new session opens at lo: the previous one (if any) closes
            if start_us is not None:
                closed.append((user_id, idx, start_us, last_us, n, "gap"))
            idx += 1
            start_us = int(ts_us[lo])
            last_us = int(ts_us[hi - 1])
            n = hi - lo
        state.update((int(idx), int(start_us), int(last_us), int(n)))
        # the open session dies when the watermark passes last_ts + gap
        state.setTimeoutTimestamp(
            max(
                last_us // 1000 + gap_minutes * 60 * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if closed:
            yield _emit(closed)

    return fn


def stream_user_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) → closed-session stream
    (user_id, session_idx, session_start, session_end, n_events,
    closed_by). Use with outputMode('update')."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="EventTimeTimeout",
        )
    )
