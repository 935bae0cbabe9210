"""Structured Streaming assembly of the replication pipeline.

Batch operators (operators/*) are reused verbatim inside foreachBatch —
the standard Spark recipe for sinks needing transactional/MERGE
semantics (SURVEY §3 lifecycle mapping):

    readStream(change log) -> watermark -> foreachBatch{
        order gate -> filter/route -> compact -> SnapshotTable.apply }

Reference parity:
- PullCommitBinlog from a saved cursor  = file/kafka source + Spark
  streaming checkpoint (pump/storage/storage.go:1114-1258);
- fake-binlog heartbeat keeping merge alive = watermark advancement +
  empty-batch progress (drainer/syncer.go:199-272,324-333);
- checkpoint-after-success               = SnapshotTable writes its
  ts checkpoint atomically with the data, and re-applying a replayed
  micro-batch is idempotent (exactly-once recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import compaction, ordering
from ..sinks.table_sink import SnapshotTable

CHANGE_SCHEMA = T.StructType([
    T.StructField("arrival_seq", T.LongType()),
    T.StructField("source_id", T.StringType()),
    T.StructField("commit_ts", T.LongType()),
    T.StructField("start_ts", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("db", T.StringType()),
    T.StructField("tbl", T.StringType()),
    T.StructField("pk", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("schema_version", T.LongType()),
    T.StructField("val", T.DoubleType()),
    T.StructField("row_json", T.StringType()),
])


def read_change_stream(spark: SparkSession, source_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-landing-zone source: each dropped file is a pump segment.
    Spark's file source tracks consumed files in the checkpoint — the
    replay-from-cursor contract of PullCommitBinlog."""
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


def with_event_time(changes: DataFrame, delay: str = "10 seconds") -> DataFrame:
    """commit_ts (logical tso) -> event-time watermark. Late rows
    beyond the delay are dropped by stateful ops — the disorder
    quarantine of drainer/merge.go:318-329 in streaming form."""
    return (changes
            .withColumn("event_time", F.timestamp_micros(F.col("commit_ts")))
            .withWatermark("event_time", delay))


def run_apply_stream(spark: SparkSession, source_dir: str, table_root: str,
                     checkpoint_dir: str, available_now: bool = True,
                     relay_dir: str | None = None):
    """The DML replication path as one streaming query. Returns the
    StreamingQuery (caller awaits termination).

    With ``relay_dir`` set, every micro-batch is WAL'd to the relay log
    before the downstream apply and the run is marked inconsistent
    until the caller's graceful stop (``relay.mark_consistent()`` after
    awaitTermination); a crashed run is recovered by
    ``sinks.relay.feed_by_relay_if_needed`` before restarting — which
    this function calls first when a relay log is present."""
    from ..sinks.relay import RelayLog, feed_by_relay_if_needed
    table = SnapshotTable(spark, table_root)
    relay = RelayLog(relay_dir) if relay_dir else None
    if relay is not None:
        feed_by_relay_if_needed(spark, relay, table)
        relay.mark_inconsistent()

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist the micro-batch: the order gate's carry aggregate and
        # the main path both read it (single source scan + exact input
        # metrics)
        batch_df = batch_df.persist()
        if relay is not None:
            relay.append(batch_df)      # WAL before apply
        ok = ordering.ordered_stream(batch_df)
        compacted = compaction.compact_last_image(ok)
        # D rows must reach the sink (they delete); SnapshotTable
        # resolves cross-batch order by commit_ts.
        table.apply_batch(compacted)
        batch_df.unpersist()

    stream = read_change_stream(spark, source_dir)
    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_sql_apply_stream(spark: SparkSession, source_dir: str, db_dir: str,
                         checkpoint_dir: str,
                         safe_window=None,
                         num_workers: int = 2,
                         setup_sql: tuple[str, ...] = (),
                         available_now: bool = True,
                         initial_commit_ts: int = -1):
    """The executed-SQL replication path (loader -> MySQL analog,
    SQLite-backed locally) with the reference's auto safe-mode window:
    batches applied while ``safe_window.active()`` are rewritten
    I -> REPLACE / U -> DELETE+REPLACE so re-application after a crash
    converges (drainer/syncer.go:180-197 + executor.go:407-443); after
    the window, statements apply verbatim.

    The savepoint is the DOWNSTREAM checkpoint table
    (sinks/jdbc.CKPT_TABLE, arbiter/checkpoint.go): each worker commits
    the batch watermark atomically with its rows. On start, events at
    or below the stored cursor are filtered out (arbiter
    server.go:126-136 resume), and a cursor left in StatusRunning (=
    crash) keeps the safe-mode window active regardless of clock.
    """
    from ..operators import safe_mode as sm
    from ..sinks import jdbc, sqlgen

    resume_ts, status = jdbc.load_checkpoint(db_dir)
    if resume_ts < 0 <= initial_commit_ts:
        # drainer -initial-commit-ts (drainer/config.go:240): with no
        # saved checkpoint, start replication strictly after the
        # configured tso instead of from the beginning of the log
        resume_ts = initial_commit_ts
    if safe_window is not None:
        window = safe_window
    elif resume_ts >= 0 and status == jdbc.STATUS_NORMAL:
        # clean shutdown last time: no auto safe-mode window
        # (arbiter/server.go:129-141 enables the 5-min window only
        # after an abnormal quit)
        window = sm.SafeModeWindow(duration_s=0.0)
    else:
        window = sm.SafeModeWindow()

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the safe-mode rewrite is a 4-way union over the gated
        # stream — without caching, each branch re-scans the source
        batch_df = batch_df.filter(F.col("commit_ts") > resume_ts).persist()
        wm_row = batch_df.agg(F.max("commit_ts").alias("wm")).collect()[0]
        if wm_row["wm"] is None:        # batch fully below the cursor
            batch_df.unpersist()
            return
        # FAKE heartbeats advance the watermark (computed above) but
        # must never reach the statement builder — generate_sql has no
        # case for them and would emit NULL sql_text.
        ok = (ordering.ordered_stream(batch_df)
              .filter(F.col("op") != "FAKE"))
        if window.active():
            prepared = sm.safe_mode_rewrite(ok)
        else:
            prepared = ok.withColumn("sub_seq", F.lit(0))
        stmts = (sqlgen.generate_sql(prepared, dialect="sqlite")
                 .withColumn("worker_id", F.pmod(F.col("pk"),
                                                 F.lit(num_workers))))
        jdbc.apply_statements(stmts, db_dir, num_workers,
                              setup_sql=setup_sql,
                              checkpoint_ts=int(wm_row["wm"]))
        batch_df.unpersist()

    stream = read_change_stream(spark, source_dir)
    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def multi_source_merge_round(spark: SparkSession, source_dirs: list[str],
                             table: SnapshotTable) -> dict:
    """One merge round over N pump landing zones with the drainer's
    min-watermark gate (drainer/merge.go:268-297, collector.go:150-259):

    - every CURRENT source contributes its max commit_ts (fake/FAKE
      heartbeat rows count — an idle source advances the merge,
      pump/server.go:467-526); the gate is the min over sources;
    - only events with checkpoint < commit_ts <= watermark are applied,
      in order, dedup/disorder-audited; later events stay parked in
      their landing zone for a later round (no copy — the cursor just
      does not pass them);
    - the checkpoint then advances to the watermark (everything at or
      below it is applied — heartbeat-only rounds still make progress).

    The source LIST is an argument, re-evaluated every round — adding
    or removing a pump between rounds is the reference's pause-world ->
    re-min reconfiguration (merge.go:153-335). Returns round stats.
    """
    from functools import reduce

    ck = table.checkpoint()["commit_ts"]

    # A registered source with no segments yet (pump came up, produced
    # nothing) must BLOCK the merge, exactly like a source whose head
    # item hasn't arrived (merge.go:268-297): its cursor is unknown, so
    # the watermark cannot pass the checkpoint.
    frames, blocked = [], False
    for d in source_dirs:
        try:
            frames.append(spark.read.parquet(d))
        except Exception:
            blocked = True
    if not frames:
        return {"watermark": int(ck), "n_applied": 0,
                "n_sources": len(source_dirs),
                "checkpoint": table.checkpoint()["commit_ts"]}
    allf = reduce(lambda a, b: a.unionByName(b), frames)

    # per-source cursors over the full zone (max is monotone, so
    # already-applied rows cannot lower it); min over CURRENT sources.
    # The columnar (source_id, commit_ts) aggregate is the only
    # full-history pass; the data pass below reads just the fresh
    # suffix, persisted once for the gate's multiple reads.
    wm_row = (allf.groupBy("source_id")
              .agg(F.max("commit_ts").alias("source_max"))
              .agg(F.min("source_max").alias("wm"),
                   F.count(F.lit(1)).alias("n_live")).collect()[0])
    watermark = wm_row["wm"] if wm_row["wm"] is not None else ck
    if blocked or wm_row["n_live"] < len(source_dirs):
        watermark = ck      # some source has shown nothing yet: block
    # NOTE the gate may legitimately re-min BELOW the checkpoint when a
    # lagging source joins — emission is still bounded by (> ck), and
    # advance_checkpoint never regresses.

    fresh = (allf.filter((F.col("commit_ts") > ck)
                         & (F.col("commit_ts") <= watermark))
             .persist())
    appliable = ordering.ordered_stream(fresh).filter(F.col("op") != "FAKE")
    compacted = compaction.compact_last_image(appliable).persist()
    n_applied = compacted.count()   # materializes once; apply reads cache
    if n_applied:
        table.apply_batch(compacted)
    compacted.unpersist()
    fresh.unpersist()
    if watermark > ck:
        table.advance_checkpoint(watermark)
    return {"watermark": int(watermark), "n_applied": int(n_applied),
            "n_sources": len(source_dirs),
            "checkpoint": table.checkpoint()["commit_ts"]}


def run_windowed_counts(spark: SparkSession, source_dir: str,
                        window: str = "1 minute",
                        delay: str = "30 seconds"):
    """Event-time windowed op counts — the streaming metrics surface
    (reference exposes per-type Prometheus counters,
    drainer/syncer.go:157-178). Returns a streaming DataFrame for a
    memory/console sink."""
    ch = with_event_time(read_change_stream(spark, source_dir), delay)
    return (ch.groupBy(F.window("event_time", window), "op")
              .count())
