"""Global commit-ts ordering, duplicate skip, disorder detection,
multi-source k-way merge with a min-watermark gate.

Reference semantics:
- the whole pipeline's invariant is globally ascending commit_ts
  (drainer/merge.go:236-335);
- an item whose commit_ts <= the running max is *disorder*: counted and
  logged, never applied out of order; an item with a commit_ts already
  seen is a *duplicate*: skipped (drainer/merge.go:318-329);
- the merger only emits up to min over sources of max(commit_ts)
  (every live source must have shown an item ≥ that ts) — the global
  low-watermark (drainer/merge.go:268-297); fake binlogs (heartbeats)
  keep idle sources advancing (pump/server.go:467-526).

Spark-first design: the reference funnels everything through ONE merger
thread; we instead express order as data (window over arrival order per
source for monotonicity accounting, global sort only where the sink
truly needs total order). At 100 TB the total order is applied per
partition of the causal key, never as a single global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_rank(df: DataFrame, order_cols: list[str],
                     out_col: str = "rk",
                     group_col: str | None = None) -> DataFrame:
    """Exact global ROW_NUMBER() over ``order_cols`` WITHOUT the
    single-task global window (`Window.orderBy` with no partition
    moves the whole frame to one task — Spark itself warns).

    Two phases, the assign_txn_batches carry pattern generalized to
    arbitrary sort keys:
      1. range-repartition on the full order key — Spark's sampled
         RangePartitioner, the same machinery as a distributed
         ORDER BY, so value skew is handled by sampling instead of a
         fixed bucket width; row_number within each range partition
         (window partitioned by partition id — parallel);
      2. per-partition row counts (n_partitions tiny rows) carry a
         running offset, broadcast back: rank = offset + within.

    ``order_cols`` must be a TOTAL order (append a unique tiebreak
    column): then the composed rank equals the global row_number
    regardless of where the sampled boundaries land — partitioning
    is physical only, the result is deterministic. The repartitioned
    frame is persisted so phase 1 and the counts read ONE boundary
    sample (both phases reread it; recomputing could re-sample).

    ``group_col`` ranks WITHIN each group value independently (rank
    restarts at 1 per group) while still paying ONE range shuffle for
    the whole frame: the range key is (group, *order_cols), the
    within-window and counts key on (partition, group), and the
    offset carry joins on the group — N independent rank frames for
    the price of one (rfm_segments melts its three metric dimensions
    through this instead of three separate shuffles).
    """
    from ..cache import managed_persist
    gcols = [group_col] if group_col else []
    part = managed_persist(
        df.repartitionByRange(*[F.col(c) for c in gcols + order_cols])
          .withColumn("_pid", F.spark_partition_id()))
    w_in = Window.partitionBy("_pid", *gcols).orderBy(*order_cols)
    counts = part.groupBy("_pid", *gcols) \
                 .agg(F.count(F.lit(1)).alias("_n"))
    # offset carry as a triangular broadcast self-join over the
    # (n_partitions x n_groups)-row counts frame (p^2 pairs per
    # group — trivial and parallel), NOT an unpartitioned window:
    # the whole point here is zero single-task stages.
    lower = counts.select(
        F.col("_pid").alias("_pid2"),
        *[F.col(g).alias(f"_{g}2") for g in gcols],
        F.col("_n").alias("_n2"))
    cond = F.col("_pid2") < F.col("_pid")
    for g in gcols:
        cond = cond & (F.col(f"_{g}2") == F.col(g))
    offsets = (counts.join(F.broadcast(lower), cond, "left")
               .groupBy("_pid", *gcols)
               .agg(F.coalesce(F.sum("_n2"), F.lit(0)).alias("_off")))
    return (part.withColumn("_within", F.row_number().over(w_in))
            .join(F.broadcast(offsets), ["_pid", *gcols])
            .withColumn(out_col,
                        (F.col("_off") + F.col("_within")).cast("long"))
            .drop("_pid", "_within", "_off"))


def classify_disorder(changes: DataFrame,
                      arrival_bucket: int = 1 << 20) -> DataFrame:
    """Tag each event, per source in arrival order, as ok / disorder /
    duplicate (duplicate = commit_ts seen before globally).

    The per-source running max is a TWO-PHASE max so one source's whole
    history never funnels through a single task (the reference's
    single-merger bottleneck, drainer/merge.go:236):
      1. within (source, arrival-range bucket): running prefix max —
         windows partitioned by (source, bucket), parallel;
      2. per-bucket maxima (one tiny row per bucket) carry the running
         max across buckets, broadcast back.
    max(carry_in, within_bucket_prev) == the global per-source prefix
    max, exactly. The duplicate check is windowed by commit_ts (already
    key-partitioned, scales).
    """
    b = F.floor(F.col("arrival_seq") / arrival_bucket)
    w_in = (Window.partitionBy("source_id", "_b").orderBy("arrival_seq")
            .rowsBetween(Window.unboundedPreceding, -1))
    # cursor pseudo-rows (arrival_seq < 0, injected by the streaming
    # gate) carry per-source order state only — they must never win a
    # commit_ts duplicate partition against a REAL row: a synthesized
    # cursor value (e.g. min-parked-1) can coincide with another
    # source's genuine commit_ts, and ranking the seed first would
    # quarantine that row as a duplicate. Seeds rank among themselves.
    w_dup = Window.partitionBy("commit_ts", F.col("arrival_seq") < 0) \
        .orderBy("arrival_seq", "source_id")
    bucketed = changes.withColumn("_b", b)
    # the carry aggregate re-reads only 3 columns of the source lineage
    # (column pruning reaches the scan); persisting the full stream here
    # costs more than the pruned re-scan at every tested scale. Callers
    # that cannot afford ANY second source pass (streaming micro-batches
    # with input metrics) persist the batch before calling.
    bucket_max = (changes
                  .select("source_id", "arrival_seq", "commit_ts")
                  .withColumn("_b", b)
                  .groupBy("source_id", "_b")
                  .agg(F.max("commit_ts").alias("_bmax")))
    w_carry = (Window.partitionBy("source_id").orderBy("_b")
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = (bucket_max
             .withColumn("carry_in", F.max("_bmax").over(w_carry))
             .select("source_id", "_b", "carry_in"))
    return (
        bucketed
        .withColumn("prev_in_bucket", F.max("commit_ts").over(w_in))
        .join(F.broadcast(carry), ["source_id", "_b"])
        .withColumn("prev_max_ts",
                    F.greatest("carry_in", "prev_in_bucket"))
        .withColumn("dup_rank", F.row_number().over(w_dup))
        .withColumn(
            "order_status",
            F.when(F.col("dup_rank") > 1, F.lit("duplicate"))
             .when(F.col("prev_max_ts").isNotNull()
                   & (F.col("commit_ts") <= F.col("prev_max_ts")),
                   F.lit("disorder"))
             .otherwise(F.lit("ok")))
        .drop("prev_max_ts", "dup_rank", "prev_in_bucket", "carry_in", "_b")
    )


def ordered_stream(changes: DataFrame) -> DataFrame:
    """The emit-able stream: duplicates skipped, disorder quarantined
    (routed to a metric/dead-letter stream, not applied out of order).
    Returns only rows that participate in the ordered apply.
    """
    return classify_disorder(changes).filter(F.col("order_status") == "ok")


def source_watermarks(changes: DataFrame) -> DataFrame:
    """Per-source max commit_ts (= the pump's maxCommitTS cursor,
    pump/storage/storage.go:278-325)."""
    return changes.groupBy("source_id").agg(
        F.max("commit_ts").alias("source_max_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


def merge_watermark(changes: DataFrame) -> DataFrame:
    """The global low-watermark: min over sources of max(commit_ts).
    Single tiny aggregate — broadcastable everywhere it's needed."""
    return source_watermarks(changes).agg(
        F.min("source_max_ts").alias("watermark"))


def kway_merge(changes: DataFrame) -> DataFrame:
    """Union-of-sources merge gated at the low-watermark: emit exactly
    the events with commit_ts <= min(max commit_ts per source), ordered.

    The reference blocks until every source has a head item
    (drainer/merge.go:268-297); in batch form that contract is "only
    emit what every source has caught up past". Events beyond the
    watermark stay parked for the next batch.
    """
    wm = merge_watermark(changes)
    # cross-join with a 1-row aggregate => Catalyst broadcasts it.
    gated = ordered_stream(changes).crossJoin(F.broadcast(wm))
    return (gated.filter(F.col("commit_ts") <= F.col("watermark"))
                 .drop("watermark"))


def checkpoint_ts(changes: DataFrame, unmatched_p: DataFrame | None = None) -> DataFrame:
    """Savepoint advancement: the highest commit_ts such that everything
    at or below it is fully applied (drainer/syncer.go:199-286). With a
    set of still-unresolved prewrites, the checkpoint cannot pass the
    earliest unresolved start_ts.
    """
    wm = merge_watermark(changes)
    if unmatched_p is None:
        return wm.select(F.col("watermark").alias("checkpoint_ts"))
    earliest_pending = unmatched_p.agg(F.min("start_ts").alias("min_pending"))
    return (wm.crossJoin(earliest_pending)
              .select(F.when(F.col("min_pending").isNotNull()
                             & (F.col("min_pending") <= F.col("watermark")),
                             F.col("min_pending") - 1)
                       .otherwise(F.col("watermark"))
                       .alias("checkpoint_ts")))
