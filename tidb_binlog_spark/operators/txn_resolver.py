"""Transaction-status resolver — decide the fate of parked Prewrites.

Reference: pump/storage/storage.go:431-558 (`Append.resolve`). A
Prewrite binlog whose Commit/Rollback never arrived is resolved by
querying the upstream MVCC store / lock resolver:

- an MVCC write record for the same start_ts that is NOT a rollback and
  has commit_ts > start_ts  -> the txn committed: synthesize the missing
  Commit binlog ourselves (storage.go:400-429 `writeCBinlog`);
- a rollback record            -> drop the Prewrite, never emit;
- txn still *young* (elapsed physical seconds since its TSO below
  maxTxnTimeoutSecond) and unknown -> leave parked, retry later;
- old and unknown -> `GetTxnStatus`: a still-valid lock (TTL > 0)
  stays parked; a committed status synthesizes the Commit; anything
  else is a cleaned-up/expired txn -> ignore (rollback).

Physical time is extracted from the TSO exactly as the reference does:
``physical_ms = ts >> 18`` (oracle.ExtractPhysical), compared in whole
seconds (storage.go:484-499).

Spark-first: the TiKV lookup becomes a *status side table* joined
against the parked set. At scale the parked set is tiny relative to the
stream (only timed-out prewrites), so Catalyst picks a broadcast of
whichever side is small; the decision itself is one CASE projection —
no per-row Python, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the reference's maxTxnTimeoutSecond (pump/storage/storage.go:60-66)
MAX_TXN_TIMEOUT_S = 600


def _physical_second(ts_col) -> F.Column:
    """TSO -> whole physical seconds: (ts >> 18) ms, integer-divided
    (oracle.ExtractPhysical / time.Second, storage.go:484-487)."""
    return F.floor(F.shiftright(ts_col, 18) / 1000)


def resolve_txn_status(pending: DataFrame, status: DataFrame,
                       latest_ts: int,
                       max_txn_timeout_s: int = MAX_TXN_TIMEOUT_S) -> DataFrame:
    """Classify each parked Prewrite with the reference's decision rules.

    ``pending``: unmatched Prewrites (start_ts, payload...).
    ``status``: the MVCC/lock-resolver answer set, one row per known
    txn: (start_ts, status in {'committed','rollback','lock'},
    commit_ts nullable). Absent start_ts = the service has no record.
    ``latest_ts``: the pump's latest seen TSO (storage.go:432-435 —
    resolution is a no-op until a latest ts exists).

    Output: the pending rows plus
      action in {'synthesize_commit','drop_rollback','pending'} and
      resolved_commit_ts (set only for synthesize_commit).
    """
    st = status.select(
        F.col("start_ts").alias("_st_ts"),
        F.col("status").alias("_status"),
        F.col("commit_ts").alias("_status_commit_ts"))
    joined = pending.join(
        st, pending["start_ts"] == st["_st_ts"], "left")
    latest_second = (int(latest_ts) >> 18) // 1000
    elapsed_s = F.lit(latest_second) - _physical_second(F.col("start_ts"))
    action = (
        # MVCC/GetTxnStatus says committed with a sane commit ts
        F.when((F.col("_status") == "committed")
               & (F.col("_status_commit_ts") > F.col("start_ts")),
               F.lit("synthesize_commit"))
        # committed but commit_ts <= start_ts: the reference logs the
        # sanity-check failure and leaves the txn unresolved
        .when(F.col("_status") == "committed", F.lit("pending"))
        .when(F.col("_status") == "rollback", F.lit("drop_rollback"))
        # lock TTL still valid -> retry later (storage.go:515-519)
        .when(F.col("_status") == "lock", F.lit("pending"))
        # unknown + young -> retry later (storage.go:489-499)
        .when(elapsed_s <= F.lit(max_txn_timeout_s), F.lit("pending"))
        # unknown + old: expired lock was cleaned up -> never committed
        .otherwise(F.lit("drop_rollback")))
    resolved = F.when(action == "synthesize_commit",
                      F.col("_status_commit_ts"))
    return (joined
            .withColumn("action", action)
            .withColumn("resolved_commit_ts", resolved)
            .drop("_st_ts", "_status", "_status_commit_ts"))


def synthesize_commits(resolved: DataFrame) -> DataFrame:
    """The Commit binlogs the resolver writes itself (writeCBinlog,
    storage.go:400-429): one C entry per committed-but-unreported txn,
    carrying the original start_ts and the resolved commit_ts, flagged
    so downstream audit can tell them from upstream commits."""
    return (resolved
            .filter(F.col("action") == "synthesize_commit")
            .withColumn("commit_ts", F.col("resolved_commit_ts"))
            .withColumn("is_rollback", F.lit(False))
            .withColumn("synthesized", F.lit(True))
            .drop("action", "resolved_commit_ts"))
