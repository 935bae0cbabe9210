"""Stateful streaming P/C matcher — the pump "sorter" as an
applyInPandasWithState operator.

Reference: pump/storage/sorter.go:89-239 parks each Prewrite until its
Commit/Rollback arrives (matched on start_ts); pump/storage/
storage.go:431-558 resolves txns whose C never arrives by asking TiKV
for the true status after a timeout.

Spark form: group the event stream by start_ts; keep the pending P in
group state; emit on C; drop on Rollback; on processing-time timeout,
emit an ``unresolved`` row — the hook where a txn-status resolver
plugs in (for Kafka/file-complete sources unresolved rows are simply
rolled-back txns).

State is one small row per in-flight txn, evicted on match/timeout —
bounded by txn concurrency, not stream length.

UPGRADE NOTE: the state schema gained ``has_r`` (rollback-before-
prewrite tracking). Spark's state store does not migrate state rows
across schema changes — resuming a checkpoint written by the 4-field
version requires a fresh checkpoint dir (replay from the source; the
downstream apply is idempotent, so this is safe).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType([
    T.StructField("start_ts", T.LongType()),
    T.StructField("kind", T.StringType()),        # 'P' | 'C' | 'R'
    T.StructField("commit_ts", T.LongType()),     # C only
    T.StructField("payload", T.StringType()),     # P only
])

MATCHED_SCHEMA = T.StructType([
    T.StructField("start_ts", T.LongType()),
    T.StructField("commit_ts", T.LongType()),
    T.StructField("payload", T.StringType()),
    T.StructField("status", T.StringType()),      # matched | unresolved
])

_STATE_SCHEMA = T.StructType([
    T.StructField("payload", T.StringType()),
    T.StructField("commit_ts", T.LongType()),
    T.StructField("has_p", T.BooleanType()),
    T.StructField("has_c", T.BooleanType()),
    T.StructField("has_r", T.BooleanType()),
])


def _match_group(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    start_ts = key[0]
    if state.hasTimedOut:
        payload, commit_ts, has_p, has_c, has_r = state.get
        state.remove()
        if has_p and not has_c and not has_r:
            # resolver hook: unresolved after timeout (sorter's 1s/10min
            # escalation) — surfaced, not silently dropped.
            yield pd.DataFrame([{"start_ts": start_ts, "commit_ts": None,
                                 "payload": payload, "status": "unresolved"}])
        return

    payload, commit_ts, has_p, has_c, has_r = None, None, False, False, False
    if state.exists:
        payload, commit_ts, has_p, has_c, has_r = state.get

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            if row.kind == "P":
                payload, has_p = row.payload, True
            elif row.kind == "C":
                commit_ts, has_c = int(row.commit_ts), True
            elif row.kind == "R":
                has_r = True

    if has_r:
        # rolled back: drop the txn. If the P has not arrived yet, the
        # rollback must be REMEMBERED (has_r in state) so the
        # later-arriving P is dropped instead of parking forever —
        # arrival order across sources is free, so R-before-P is legal
        # (sorter.go handles it by resolving the parked P on lookup).
        if has_p:
            if state.exists:
                state.remove()
            return
        state.update((payload, commit_ts, has_p, has_c, True))
        try:
            state.setTimeoutDuration(60_000)
        except Exception:
            pass
        return
    if has_p and has_c:
        if state.exists:
            state.remove()
        yield pd.DataFrame([{"start_ts": start_ts, "commit_ts": commit_ts,
                             "payload": payload, "status": "matched"}])
        return
    # still pending one half: park it (the reference parks P entries;
    # a C-before-P also parks, arrival order across sources is free).
    state.update((payload, commit_ts, has_p, has_c, False))
    try:
        state.setTimeoutDuration(60_000)
    except Exception:  # NoTimeout mode: parking without an alarm
        pass


def match_pc_stream(events: DataFrame,
                    resolver_timeout: bool = False) -> DataFrame:
    """events: streaming DataFrame with EVENT_SCHEMA. Returns matched
    txns.

    resolver_timeout=True additionally emits ``unresolved`` markers for
    prewrites whose commit never arrives (the txn-status resolver hook,
    storage.go:431-558) via processing-time state timeouts — use with a
    continuous trigger. For file/Kafka-complete sources (every P has
    its C in the log) the default NoTimeout keeps availableNow
    (run-to-completion) semantics: unmatched P entries simply stay
    parked, pinning the checkpoint exactly like the reference.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if resolver_timeout
               else GroupStateTimeout.NoTimeout)
    return (events
            .groupBy("start_ts")
            .applyInPandasWithState(
                _match_group,
                outputStructType=MATCHED_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
