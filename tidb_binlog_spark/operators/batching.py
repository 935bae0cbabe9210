"""Txn/batch manager + loopback filter + heartbeat progress +
event counters — the remaining stream-stage operators.

Reference:
- batch manager: accumulate txns until batchSize*3 DMLs (or the 100k
  cap); DDL flushes; success channel preserves input order
  (pkg/loader/load.go:636-724);
- loopback sync: skip txns that carry this channel's mark-table row
  (drainer/loopbacksync/loopbacksync.go:53-130, syncer.go:404-417);
- heartbeat (fake binlog): advances the checkpoint without downstream
  writes (drainer/syncer.go:199-272,324-333);
- event counters: per-type Prometheus metrics (drainer/syncer.go:157-178).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hierarchical_offsets(bucket_tot: DataFrame, b_col: str,
                          tot_col: str, fan: int = 1 << 16) -> DataFrame:
    """EXCLUSIVE prefix sum of ``tot_col`` over ``b_col`` order,
    returned as (b_col, offset) — with NO data-dependent unpartitioned
    window. The single-level carry (one ordered pass over all non-empty
    buckets) is itself data-sized once timestamps are dense: TSO-style
    commit_ts yields up to ts_range/width non-empty buckets, far too
    many for one window task at 100 TB.

    Three levels instead, each compressing the bucket id by ``fan``:
    within-level windows partition by the parent bucket (parallel,
    <= fan rows per task); only the TOP level runs unpartitioned, and
    its key space is the int64 domain / fan^3 <= 2^16 distinct values
    — bounded by the timestamp DOMAIN, not the data. The top offsets
    frame (<= 2^16 tiny rows) is the only forced broadcast."""
    lvl1 = bucket_tot.withColumn(
        "_c2", F.floor(F.col(b_col) / fan))
    w2 = (Window.partitionBy("_c2").orderBy(b_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    in2 = lvl1.withColumn(
        "_off_in2", F.coalesce(F.sum(tot_col).over(w2), F.lit(0)))
    lvl2 = (lvl1.groupBy("_c2").agg(F.sum(tot_col).alias("_tot2"))
            .withColumn("_c3", F.floor(F.col("_c2") / fan)))
    w3 = (Window.partitionBy("_c3").orderBy("_c2")
          .rowsBetween(Window.unboundedPreceding, -1))
    in3 = lvl2.withColumn(
        "_off_in3", F.coalesce(F.sum("_tot2").over(w3), F.lit(0)))
    lvl3 = lvl2.groupBy("_c3").agg(F.sum("_tot2").alias("_tot3"))
    w4 = (Window.orderBy("_c3")     # <= 2^16 rows over the whole
          .rowsBetween(Window.unboundedPreceding, -1))  # int64 domain
    off3 = lvl3.withColumn(
        "_off3", F.coalesce(F.sum("_tot3").over(w4), F.lit(0))) \
        .select("_c3", "_off3")
    off2 = (in3.join(F.broadcast(off3), "_c3")
            .select("_c2",
                    (F.col("_off_in3") + F.col("_off3")).alias("_off2")))
    return (in2.join(off2, "_c2")
            .select(b_col,
                    (F.col("_off_in2") + F.col("_off2")).alias("offset")))


def assign_txn_batches(changes: DataFrame, max_dmls: int = 60,
                       ts_bucket_width: int = 1 << 16) -> DataFrame:
    """Group whole transactions into apply batches of <= max_dmls DMLs
    (a txn never splits across batches; an oversized txn gets its own).

    Running-total-over-order is a prefix sum, computed in TWO phases so
    no single task ever sees the whole stream (a global
    Window.orderBy would):
      1. per commit_ts-range bucket: within-bucket prefix sums (window
         partitioned BY bucket — parallel across buckets);
      2. per-bucket totals get their own running offset via
         :func:`_hierarchical_offsets` — three more levels of the same
         trick, so the only unpartitioned ordered pass is over a
         DOMAIN-bounded (<= 2^16 row) frame, never a data-sized one.
    The composition equals the global prefix sum exactly, so batch
    boundaries are deterministic and replays re-create identical
    batches.
    """
    from ..cache import managed_persist
    # persist the per-txn sizes once: phase 1 and the bucket totals both
    # read them (otherwise the source aggregation runs twice)
    txn_sizes = managed_persist(
        changes.groupBy("commit_ts")
        .agg(F.count(F.lit(1)).alias("n_dmls"))
        .withColumn("_b", F.floor(F.col("commit_ts") / ts_bucket_width)))
    w_in = (Window.partitionBy("_b").orderBy("commit_ts")
            .rowsBetween(Window.unboundedPreceding, 0))
    within = txn_sizes.withColumn("cum_in", F.sum("n_dmls").over(w_in))
    bucket_tot = within.groupBy("_b").agg(F.sum("n_dmls").alias("tot"))
    offsets = _hierarchical_offsets(bucket_tot, "_b", "tot")
    # batch = floor((cumsum - n_dmls) / max_dmls): a txn starts a new
    # batch when the *preceding* total crosses the cap. Plain join on
    # _b (NOT a forced broadcast: the offsets frame is n_buckets rows
    # — data-sized; AQE broadcasts it when it is actually small).
    sized = (within
             .join(offsets, "_b")
             .withColumn("cum", F.col("offset") + F.col("cum_in"))
             .withColumn("batch_no",
                         F.floor((F.col("cum") - F.col("n_dmls")) / max_dmls)
                          .cast("long")))
    return changes.join(sized.select("commit_ts", "batch_no"), "commit_ts")


def loopback_filter(changes: DataFrame, mark_db: str = "retl",
                    mark_tbl: str = "_drainer_repl_mark",
                    channel_id: int | None = None) -> DataFrame:
    """Drop txns containing a mark-table row (events this channel wrote
    on the other side of a bidirectional pair), then drop the mark rows
    themselves. Anti-join on the txn's commit_ts."""
    mark = (F.col("db") == mark_db) & (F.col("tbl") == mark_tbl)
    if channel_id is not None:
        mark = mark & (F.get_json_object("row_json", "$.channel_id")
                       == str(channel_id))
    marked_txns = changes.filter(mark).select("commit_ts").distinct()
    return changes.join(marked_txns, "commit_ts", "left_anti")


# Mark-table write side (drainer/loopbacksync/loopbacksync.go:27-122):
# the applying channel stamps every txn it writes downstream with a
# mark-row update so the opposite direction's loopback_filter drops it.
MARK_TABLE = "retl._drainer_repl_mark"
CREATE_MARK_TABLE = (
    f"CREATE TABLE IF NOT EXISTS {MARK_TABLE} ("
    f"id bigint not null, channel_id bigint not null DEFAULT 0, "
    f"val bigint DEFAULT 0, channel_info varchar(64), "
    f"PRIMARY KEY (id, channel_id))")


def init_mark_table_sql(row_num: int, channel_id: int) -> str:
    """InitMarkTableData: seed row_num mark rows for the channel (the
    id spreads txn marks over rows to avoid one hot row)."""
    values = ", ".join(f"({i}, {channel_id}, 1, '')"
                       for i in range(row_num))
    return (f"REPLACE INTO {MARK_TABLE}"
            f"(id, channel_id, val, channel_info) VALUES {values}")


def loopback_mark_statements(changes: DataFrame, channel_id: int,
                             row_num: int = 16) -> DataFrame:
    """One UpdateMark statement per txn (distinct commit_ts), to be
    executed INSIDE that txn's downstream apply
    (loopbacksync.go:116-122): bumps val on mark row
    id = commit_ts % row_num for this channel. Emits (commit_ts,
    sql_text) ordered like any other statement stream."""
    return (changes.select("commit_ts").distinct()
            .withColumn(
                "sql_text",
                F.concat(
                    F.lit(f"UPDATE {MARK_TABLE} SET val = val + 1 "
                          f"WHERE id = "),
                    F.pmod(F.col("commit_ts"), F.lit(row_num))
                     .cast("long").cast("string"),
                    F.lit(f" AND channel_id = {channel_id} LIMIT 1"))))


def heartbeat_progress(changes: DataFrame) -> DataFrame:
    """Per-source progress accounting with FAKE (heartbeat) events:
    applied = non-fake rows; the checkpoint cursor still advances over
    fakes (idle sources keep the merge moving)."""
    return changes.groupBy("source_id").agg(
        F.count(F.when(F.col("op") != "FAKE", 1)).alias("n_applied"),
        F.count(F.when(F.col("op") == "FAKE", 1)).alias("n_heartbeats"),
        F.max("commit_ts").alias("checkpoint_ts"),
        F.max(F.when(F.col("op") != "FAKE", F.col("commit_ts")))
         .alias("last_applied_ts"),
    )


def event_counters(changes: DataFrame) -> DataFrame:
    """The metrics surface: event counts per (db, op) + distinct txns."""
    return changes.groupBy("db", "op").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("commit_ts").alias("n_txns"),
    )
