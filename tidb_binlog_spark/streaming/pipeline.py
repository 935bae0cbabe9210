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


_CHAOS_APPLY_CALLS = 0   # chaos kill hooks (env-gated, see apply())


class SqlBatchApplier:
    """The executed-SQL micro-batch applier — the body of
    run_sql_apply_stream's foreachBatch, factored out so the relay
    recovery path (feed_sql_by_relay_if_needed) replays a crashed
    window through the IDENTICAL machinery: resume filter, order
    gate, config filter/route stages, DDL barriers with immediate
    checkpoints, per-table statement widths, causality-routed
    shared-downstream apply."""

    # DDL rows are collect()ed per batch to sequence barriers; DDL is
    # rare by nature, so this is bounded in any sane stream — the cap
    # makes the contract explicit instead of letting a runaway DDL
    # storm (e.g. a migration script replayed into the stream) OOM
    # the driver (VERDICT r7 item 7).
    MAX_DDL_PER_BATCH = 10_000

    def __init__(self, db_dir: str, setup_sql: tuple[str, ...] = (),
                 num_workers: int = 2, window=None, sync_ddl: bool = True,
                 catalog=None, cfg=None, resume_ts: int = -1,
                 relay=None, max_ddl_per_batch: int | None = None):
        from ..operators import safe_mode as sm
        self.db_dir = db_dir
        self.setup_sql = setup_sql
        self.num_workers = num_workers
        self.window = window if window is not None else sm.SafeModeWindow()
        self.sync_ddl = sync_ddl
        self.catalog = catalog
        self.cfg = cfg
        self.resume_ts = resume_ts
        self.relay = relay
        self.max_ddl_per_batch = (self.MAX_DDL_PER_BATCH
                                  if max_ddl_per_batch is None
                                  else max_ddl_per_batch)

    def _table_value_cols(self, tbl: str) -> tuple[str, ...]:
        """Statement width for one table: the sink catalog's CURRENT
        column list (so a mid-stream ADD/DROP COLUMN widens/narrows
        the very next sub-batch, executor.go:336-405 refresh-on-DDL);
        static (pk, val) when no catalog is wired."""
        if self.catalog is None:
            return ("pk", "val")
        try:
            return tuple(self.catalog.table_info("main", tbl).columns)
        except LookupError:     # table not created yet: setup_sql width
            return ("pk", "val")

    def _apply_dml(self, seg: DataFrame, ckpt_ts: int) -> None:
        """Order-gated DML sub-batch -> safe-mode rewrite -> per-table
        statement build -> causality-routed parallel apply."""
        from ..operators import causality
        from ..operators import safe_mode as sm
        from ..sinks import jdbc, sqlgen
        catalog, num_workers = self.catalog, self.num_workers
        if self.window.active():
            prepared = sm.safe_mode_rewrite(seg)
        else:
            prepared = seg.withColumn("sub_seq", F.lit(0))
        prepared = prepared.persist()
        tables = [r["tbl"] for r in prepared.select("tbl").distinct().collect()]
        if not tables:
            prepared.unpersist()
            jdbc.save_checkpoint(self.db_dir, ckpt_ts)
            return
        # per-table statement width (few tables; the per-table build is
        # a union of narrow projections over the SAME cached sub-batch)
        stmts = None
        key_frames = []
        for tbl in tables:
            cols = self._table_value_cols(tbl)
            part = prepared.filter(F.col("tbl") == tbl)
            # columns beyond the typed (pk, val) ride the row image —
            # extracted as strings, quoted by the statement builder
            for c in cols:
                if c not in ("pk", "val"):
                    part = part.withColumn(
                        c, F.get_json_object(F.col("row_json"), f"$.{c}"))
            s = sqlgen.generate_sql(part, dialect="sqlite",
                                    value_cols=cols) \
                      .select("commit_ts", "seq", "sub_seq", "pk", "sql_text")
            stmts = s if stmts is None else stmts.unionByName(s)
            # causality keys: every PK/UK key-string the statements
            # touch (pkg/loader/model.go:459-512) — (db, tbl, pk)
            # always; each sink-side UNIQUE key's column values too,
            # so txns with different PKs colliding on a UK serialize
            # onto one worker in commit order (causality.go:31-99)
            pk_key = F.concat_ws("\x01", F.col("db"), F.col("tbl"),
                                 F.lit("pk"), F.col("pk").cast("string"))
            keys = part.select(F.col("commit_ts").alias("txn_id"),
                               pk_key.alias("key"))
            if catalog is not None:
                try:
                    uks = catalog.table_info("main", tbl).unique_keys
                except LookupError:
                    uks = ()
                for uk_name, uk_cols in uks:
                    if uk_name == "PRIMARY" or not set(uk_cols) <= set(cols):
                        continue
                    uk_key = F.concat_ws(
                        "\x01", F.col("db"), F.col("tbl"), F.lit(uk_name),
                        *[F.col(c).cast("string") for c in uk_cols])
                    keys = keys.unionByName(
                        part.filter(F.concat_ws(
                            "", *[F.col(c) for c in uk_cols]) != "")
                        .select(F.col("commit_ts").alias("txn_id"),
                                uk_key.alias("key")))
            key_frames.append(keys)
        txn_keys = key_frames[0]
        for kf in key_frames[1:]:
            txn_keys = txn_keys.unionByName(kf)
        # conflict-free dispatch replaces pmod(pk): whole txns route by
        # causality group, so cross-txn key conflicts apply in commit
        # order while disjoint groups parallelize (load.go:508-575)
        routed = causality.conflict_free_partitions(
            stmts, txn_keys, num_workers=num_workers,
            txn_col="commit_ts")
        import os as _os
        prof_path = _os.environ.get("SPARK_GRAFT_APPLY_PROFILE")
        shard_files = bool(_os.environ.get("SPARK_GRAFT_APPLY_SHARD_FILES"))
        if prof_path:
            # profile mode (VERDICT r11 item 5; r12 item 1 splits the
            # routing leg): materialize each stage so "rewrite +
            # sqlgen", "CC fixpoint", "big-frame stamp join", and
            # "DB-API execution" get separate wall clocks in the
            # JSONL record. The extra persists change absolute
            # timing — profile numbers are for decomposition, not
            # headline rates.
            import json as _json
            import time as _time
            t0 = _time.time()
            stmts = stmts.persist()
            n_stmts = stmts.count()
            t_gen = _time.time() - t0           # rewrite + sqlgen
            t0 = _time.time()
            groups = causality.causality_groups(txn_keys).persist()
            n_groups = groups.count()
            t_cc = _time.time() - t0            # CC fixpoint alone
            t0 = _time.time()
            routed = causality.stamp_workers(
                stmts, groups, num_workers=num_workers,
                txn_col="commit_ts").persist()
            routed.count()
            t_stamp = _time.time() - t0         # big-frame stamp join
            t0 = _time.time()
            jdbc.apply_statements(routed, self.db_dir, num_workers,
                                  setup_sql=self.setup_sql,
                                  checkpoint_ts=ckpt_ts,
                                  shared_db=True,
                                  shard_files=shard_files)
            t_dbapi = _time.time() - t0
            with open(prof_path, "a") as fh:
                fh.write(_json.dumps(
                    {"ckpt_ts": ckpt_ts, "n_stmts": int(n_stmts),
                     "n_txn_groups": int(n_groups),
                     "stmt_gen_sec": round(t_gen, 3),
                     "causality_cc_sec": round(t_cc + t_stamp, 3),
                     "cc_fixpoint_sec": round(t_cc, 3),
                     "stamp_sec": round(t_stamp, 3),
                     "dbapi_exec_sec": round(t_dbapi, 3),
                     "shard_files": shard_files}) + "\n")
            routed.unpersist()
            groups.unpersist()
            stmts.unpersist()
        else:
            # shared_db: the downstream is ONE database (the
            # reference's topology) — causality worker ids vary per
            # batch, which is only sound when routing doesn't decide
            # row placement
            jdbc.apply_statements(routed, self.db_dir, num_workers,
                                  setup_sql=self.setup_sql,
                                  checkpoint_ts=ckpt_ts,
                                  shared_db=True,
                                  shard_files=shard_files)
        prepared.unpersist()

    def apply(self, batch_df: DataFrame) -> None:
        import os as _os

        from ..operators import ddl as ddl_mod
        from ..sinks import jdbc
        catalog = self.catalog
        # persist the RAW batch first: the relay WAL and the filtered
        # main path both read it (one source scan, not two); the
        # safe-mode rewrite is a 4-way union over the gated stream and
        # would re-scan per branch without the cache
        batch_df = batch_df.persist()
        # chaos kill points (tools/stream_kill_resume.py): hard driver
        # death at the Nth apply() call in this process — BEFORE_WAL
        # dies between micro-batches (previous batch fully committed,
        # this one nowhere); AFTER_WAL dies inside one (WAL written,
        # nothing applied, no checkpoint moved). Call-count, not a ts
        # threshold: multi-source interleave puts high commit_ts into
        # early batches, so a ts threshold can fire before anything
        # committed. Env-gated: zero cost in production.
        _cb = _os.environ.get("SPARK_GRAFT_CRASH_BEFORE_WAL")
        _ca = _os.environ.get("SPARK_GRAFT_CRASH_AFTER_WAL")
        if _cb or _ca:
            global _CHAOS_APPLY_CALLS
            _CHAOS_APPLY_CALLS += 1
            if _cb and _CHAOS_APPLY_CALLS >= int(_cb):
                _os._exit(137)
        if self.relay is not None:
            self.relay.append(batch_df)     # WAL before any apply
        if _ca and _CHAOS_APPLY_CALLS >= int(_ca):
            _os._exit(137)
        batch_df2 = batch_df
        batch_df = batch_df.filter(F.col("commit_ts") > self.resume_ts)
        wm_row = batch_df.agg(F.max("commit_ts").alias("wm")).collect()[0]
        if wm_row["wm"] is None:        # batch fully below the cursor
            batch_df2.unpersist()
            return
        wm = int(wm_row["wm"])
        # FAKE heartbeats advance the watermark (computed above) but
        # must never reach the statement builder — generate_sql has no
        # case for them and would emit NULL sql_text.
        ok = (ordering.ordered_stream(batch_df)
              .filter(F.col("op") != "FAKE"))
        if self.cfg is not None:
            from ..plans.pipeline import apply_filters_and_routes
            ok = apply_filters_and_routes(ok, self.cfg)
            if "target_db" in ok.columns:
                # the statement sink writes the ROUTED identity
                ok = (ok.withColumn("db", F.col("target_db"))
                      .withColumn("tbl", F.col("target_tbl"))
                      .drop("target_db", "target_tbl"))
        ok = ok.persist()
        # DDL events (op = 'DDL', statement text in row_json) split the
        # batch into barriers: DML below the DDL applies first, then
        # the DDL runs on every shard with the catalog evicted and the
        # checkpoint saved IMMEDIATELY, then the next sub-batch builds
        # statements against the POST-DDL schema
        # (drainer/syncer.go:433-537; pkg/loader/load.go:401-496).
        ddl_rows = []
        if self.sync_ddl:
            cap = self.max_ddl_per_batch
            # limit(cap+1) bounds what ever reaches the driver; the
            # overflow check turns a silent OOM into a clear error.
            ddl_rows = (ddl_mod.prep_for_apply(
                ok.filter(F.col("op") == "DDL")
                  .withColumn("ddl_sql", F.col("row_json")))
                .select("commit_ts", "db", "tbl", "ddl_sql",
                        "should_skip")
                .orderBy("commit_ts").limit(cap + 1).collect())
            if len(ddl_rows) > cap:
                ok.unpersist()
                batch_df2.unpersist()
                raise RuntimeError(
                    f"SqlBatchApplier: batch carries more than "
                    f"{cap} DDL events — refusing to collect a DDL "
                    f"storm onto the driver; split the stream or "
                    f"raise max_ddl_per_batch")
        dml = ok.filter(F.col("op") != "DDL")
        lo = self.resume_ts
        for d in ddl_rows:
            seg = dml.filter((F.col("commit_ts") > lo)
                             & (F.col("commit_ts") < d["commit_ts"]))
            self._apply_dml(seg, ckpt_ts=int(d["commit_ts"]) - 1)
            if not d["should_skip"]:
                # sqlite shards are single-database files, so the
                # mysql-wire `USE db;` prefix (apply_sql) is moot —
                # the raw statement applies to every shard
                jdbc.execute_ddl(self.db_dir, d["ddl_sql"],
                                 catalog=catalog, table=d["tbl"])
            elif catalog is not None:
                # skipped DDL still evicts the cached downstream info
                # (syncer.go shouldSkip path: empty sql forces the
                # table-info refresh)
                catalog.evict("main", d["tbl"])
            jdbc.save_checkpoint(self.db_dir, int(d["commit_ts"]))
            lo = int(d["commit_ts"])
        self._apply_dml(dml.filter(F.col("commit_ts") > lo), ckpt_ts=wm)
        ok.unpersist()
        batch_df2.unpersist()


def feed_sql_by_relay_if_needed(spark: SparkSession, relay, db_dir: str,
                                setup_sql: tuple[str, ...] = (),
                                num_workers: int = 2,
                                sync_ddl: bool = True,
                                catalog=None, cfg=None) -> dict:
    """drainer/relay.go feedByRelayLogIfNeed for the executed-SQL
    sink: no-op when the last shutdown was graceful; otherwise relay
    events ABOVE the downstream cursor replay through the SAME batch
    applier in FORCED safe mode (relay.go:83 SetSafeMode(true) — the
    REPLACE/DELETE+REPLACE rewrite makes the replay idempotent), the
    cursor advances, and the log is marked consistent. Returns
    {replayed, checkpoint}."""
    from ..operators import safe_mode as sm
    from ..sinks import jdbc
    if relay.is_consistent():
        return {"replayed": 0,
                "checkpoint": jdbc.load_checkpoint(db_dir)[0]}
    ck, _status = jdbc.load_checkpoint(db_dir)
    jdbc.ensure_shards(db_dir, num_workers, setup_sql, shared_db=True)
    pending = relay.read(spark, start_ts=ck).drop("ts_bucket").persist()
    n = pending.count()
    if n:
        applier = SqlBatchApplier(
            db_dir, setup_sql=setup_sql, num_workers=num_workers,
            window=sm.SafeModeWindow(),       # forced safe mode
            sync_ddl=sync_ddl, catalog=catalog, cfg=cfg,
            resume_ts=ck)
        applier.apply(pending)
    pending.unpersist()
    relay.mark_consistent()
    return {"replayed": int(n),
            "checkpoint": jdbc.load_checkpoint(db_dir)[0]}


def run_sql_apply_stream(spark: SparkSession, source_dir: str, db_dir: str,
                         checkpoint_dir: str,
                         safe_window=None,
                         num_workers: int | None = None,
                         setup_sql: tuple[str, ...] = (),
                         available_now: bool = True,
                         initial_commit_ts: int = -1,
                         sync_ddl: bool | None = None,
                         catalog=None,
                         cfg=None,
                         relay_dir: str | None = None,
                         max_files_per_trigger: int | None = None):
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

    ``sync_ddl``: rows with op = 'DDL' (statement text in row_json)
    act as barriers inside each micro-batch — DML below the DDL's
    commit_ts applies first, the DDL executes on every shard, the
    checkpoint saves immediately (syncer.go:234-238), and later DML
    builds statements against the post-DDL schema.

    ``catalog``: an optional sinks.catalog.SinkCatalog over the shard
    DBs. When wired, (a) statement width per table follows the LIVE
    downstream schema (a mid-stream ADD COLUMN widens the very next
    sub-batch, with non-(pk,val) columns extracted from the row
    image), and (b) the causality keys include every sink-side UNIQUE
    key's values, so UK-colliding txns serialize in commit order.

    Worker routing is causality-group dispatch (conflict_free_
    partitions, pkg/loader/causality.go:31-99), NOT pmod(pk): a whole
    txn lands on one worker, and txns linked by any shared PK/UK
    key-string share a group — per-group commit order with cross-group
    parallelism, the loader's exact guarantee.

    ``cfg``: an optional plans.pipeline.ReplicationConfig (the
    drainer.toml surface). When set it drives the declarative stages
    inside each micro-batch — ignore-ts, loopback, allow/block,
    event-kind rules, table routing (the SAME
    apply_filters_and_routes the batch plan uses) — and overrides
    sync_ddl / num_workers / initial_commit_ts from its
    sync-ddl / worker-count / initial-commit-ts keys. Routed DDL
    executes under its routed (db, tbl) for catalog purposes; the
    statement text itself is not rewritten (document your routes
    accordingly, as the reference's pb sink does).
    """
    from ..operators import safe_mode as sm
    from ..sinks import jdbc

    # cfg fills only what the caller left UNSET — an explicit
    # sync_ddl=False or num_workers=N always wins over the config
    if sync_ddl is None:
        sync_ddl = cfg.sync_ddl if cfg is not None else True
    if num_workers is None:
        num_workers = cfg.worker_count if cfg is not None else 2
    if cfg is not None and initial_commit_ts < 0:
        initial_commit_ts = cfg.initial_commit_ts

    # relay WAL (drainer/relay.go): recover a crashed run from the
    # relay log BEFORE resuming — re-applies relay events above the
    # downstream cursor in forced safe mode, then marks inconsistent
    # for the run ahead (the caller marks consistent after a graceful
    # awaitTermination, exactly like run_apply_stream's relay flow)
    from ..sinks.relay import RelayLog
    relay = RelayLog(relay_dir) if relay_dir else None
    if relay is not None:
        feed_sql_by_relay_if_needed(
            spark, relay, db_dir, setup_sql=setup_sql,
            num_workers=num_workers, sync_ddl=sync_ddl,
            catalog=catalog, cfg=cfg)
        relay.mark_inconsistent()

    resume_ts, status = jdbc.load_checkpoint(db_dir)
    jdbc.ensure_shards(db_dir, num_workers, setup_sql, shared_db=True)
    if resume_ts < 0 <= initial_commit_ts:
        # drainer -initial-commit-ts (drainer/config.go:240): with no
        # saved checkpoint, start replication strictly after the
        # configured tso instead of from the beginning of the log
        resume_ts = initial_commit_ts
    # FLOOR the shared-layout cursor before the first apply: without a
    # plain topic row, a worker that crashes pre-commit on the FIRST
    # batch leaves no cursor at all, and load_checkpoint's min over
    # the other workers' fresh topic@wid rows would skip the crashed
    # worker's rows forever. MAX-upsert never lowers an existing one.
    jdbc.save_checkpoint(db_dir, resume_ts)
    if safe_window is not None:
        window = safe_window
    elif resume_ts >= 0 and status == jdbc.STATUS_NORMAL:
        # clean shutdown last time: no auto safe-mode window
        # (arbiter/server.go:129-141 enables the 5-min window only
        # after an abnormal quit)
        window = sm.SafeModeWindow(duration_s=0.0)
    else:
        window = sm.SafeModeWindow()

    applier = SqlBatchApplier(db_dir, setup_sql=setup_sql,
                              num_workers=num_workers, window=window,
                              sync_ddl=sync_ddl, catalog=catalog,
                              cfg=cfg, resume_ts=resume_ts, relay=relay)

    stream = read_change_stream(spark, source_dir,
                                max_files_per_trigger=max_files_per_trigger)
    writer = (stream.writeStream
              .foreachBatch(lambda df, _bid: applier.apply(df))
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
