"""Stateful streaming gap-sessionization — the batch
``events_sessionize`` window (per-user sessions split at inactivity
gaps) as an ``applyInPandasWithState`` operator, the Spark-native
custom-stateful shape the reference's merger/sorter family maps to
(same harness as streaming/pc_match_stream).

Two streaming sessionizers exist deliberately:
- ``streaming/corpus_stream.sessionize_stream`` is the NATIVE
  ``session_window`` aggregation — prefer it when built-in
  semantics suffice (watermark-closed sessions, timestamp domain);
- THIS module is the custom-state variant for semantics the native
  operator cannot express: exact bounds in the source's raw ns
  domain (no timestamp cast/truncation), a straggler audit channel
  (``n_late`` under the CDC apply's no-regress rule), explicit
  ``open``-tail flush markers on idle timeout, and run-to-completion
  parking for file-complete sources — the same trade the P/C
  matcher makes vs a plain streaming join.

Semantics (identical to the batch window for in-order input):
- per user, events ``<= gap`` apart chain into one session;
- a new event ``> gap`` after the previous CLOSES the open session
  (emitted with status='closed') and starts a new one;
- the still-open tail session lives in group state — one small row
  per ACTIVE user, evicted on close/timeout, bounded by concurrent
  users within the gap horizon, not stream length;
- with ``idle_timeout_ms`` set (processing-time timeout), a user
  idle that long has their open session emitted with status='open'
  and evicted — the flush path for continuous sources. For
  file-complete sources (availableNow), NoTimeout keeps
  run-to-completion semantics and ``open`` tails stay parked,
  exactly like the P/C matcher's pending prewrites.

Late/out-of-order input: each micro-batch is sorted per user before
folding, so intra-batch disorder is free. A cross-batch late event
(ts at or before the open session's last seen ts) folds into the
open session's count without moving its end; an event older than
the open session's START is counted in ``n_late`` rather than
re-opening closed history — the same no-regress rule the CDC apply
uses (deliver such stragglers to a dead-letter audit upstream).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.LongType()),           # event-time nanos
    T.StructField("event_id", T.LongType()),
])

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.LongType()),
    T.StructField("session_end", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_late", T.LongType()),
    T.StructField("status", T.StringType()),     # closed | open
])

_STATE_SCHEMA = T.StructType([
    T.StructField("session_start", T.LongType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_late", T.LongType()),
])

DEFAULT_GAP_NS = 30 * 60 * 1_000_000_000


def _make_fold(gap_ns: int, idle_timeout_ms: int | None):
    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, last, n, n_late = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "session_start": start,
                "session_end": last, "n_events": n,
                "n_late": n_late, "status": "open"}])
            return

        start = last = None
        n = n_late = 0
        if state.exists:
            start, last, n, n_late = state.get

        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                ts = int(row.ts)
                if start is None:
                    start = last = ts
                    n = 1
                elif ts - last > gap_ns:
                    out.append({"user_id": user_id,
                                "session_start": start,
                                "session_end": last, "n_events": n,
                                "n_late": n_late, "status": "closed"})
                    start = last = ts
                    n, n_late = 1, 0
                elif ts < start:
                    # straggler below the open session's start: never
                    # re-opens closed history (no-regress)
                    n_late += 1
                else:
                    n += 1
                    if ts > last:
                        last = ts
        if out:
            yield pd.DataFrame(out)
        if start is not None:
            state.update((start, last, n, n_late))
            if idle_timeout_ms is not None:
                # no guard: in ProcessingTimeTimeout mode a failure to
                # register the alarm would silently stop open-tail
                # flushes and grow state unbounded — surface it
                state.setTimeoutDuration(idle_timeout_ms)

    return fold


def sessionize_stream(events: DataFrame, gap_ns: int = DEFAULT_GAP_NS,
                      idle_timeout_ms: int | None = None) -> DataFrame:
    """events: streaming DataFrame with EVENT_SCHEMA columns. Returns
    closed sessions (append mode); with ``idle_timeout_ms``, idle
    users' open tails are also emitted (status='open') and evicted."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_ms is not None
               else GroupStateTimeout.NoTimeout)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_fold(gap_ns, idle_timeout_ms),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
