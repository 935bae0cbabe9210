"""Operational telemetry over the change stream — the reports an
operator reads before tuning the pipeline (worker counts, watermark
delay, salting).

Reference parity: the reference exposes these as Prometheus metrics —
binlog/txn size histograms and event counters (drainer/metrics.go,
pump/metrics.go), heartbeat staleness per pump (drainer/pump.go
heartbeat checks), and the causality conflict path that forces
serialization (pkg/loader/causality.go:31-99). Here each becomes a
first-class DataFrame report with an exact integer surface, so the
DuckDB oracle can check it bit-for-bit.

All outputs are exact integers (percentiles are nearest-rank; means
are scaled integer divisions) — no float summation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_skew_profile(changes: DataFrame) -> DataFrame:
    """Writes-per-key distribution per (db, tbl): how skewed is the
    write workload — the sizing report for salting / AQE skew joins
    (the complement of the hot-keys top-N: full histogram shape, in
    doubling buckets, plus the exact max).

    Scale: one (db, tbl, pk) aggregate (map-side combinable) whose
    output is #keys rows, then a tiny per-table rollup. No windows,
    no sorts; the heaviest shuffle keys on the same (db, tbl, pk) the
    apply path already uses.
    """
    per_key = (changes.groupBy("db", "tbl", "pk")
               .agg(F.count(F.lit(1)).alias("n_writes")))
    b = F.col("n_writes")
    return (per_key.groupBy("db", "tbl")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("n_writes").alias("n_writes"),
                 F.count(F.when(b == 1, 1)).alias("keys_1"),
                 F.count(F.when((b >= 2) & (b <= 3), 1)).alias("keys_2_3"),
                 F.count(F.when((b >= 4) & (b <= 7), 1)).alias("keys_4_7"),
                 F.count(F.when(b >= 8, 1)).alias("keys_8_up"),
                 F.max("n_writes").alias("max_writes_per_key")))


def source_gap_quantiles(changes: DataFrame) -> DataFrame:
    """Per-source commit-ts gap distribution (nearest-rank p50/p90 +
    max over gaps between consecutive DISTINCT commit timestamps in
    commit order) — the staleness report that sizes heartbeat
    intervals and watermark delay (a silent pump shows up as a fat
    max-gap long before it trips the drainer's heartbeat alarm).

    Scale: distinct (source, commit_ts) pairs, then lag + rank
    windows both partitioned per source — never a global order. The
    output is #sources rows.
    """
    ts = changes.select("source_id", "commit_ts").distinct()
    w = Window.partitionBy("source_id").orderBy("commit_ts")
    gaps = (ts.withColumn("gap", F.col("commit_ts")
                          - F.lag("commit_ts").over(w))
            .filter(F.col("gap").isNotNull()))
    w_rank = Window.partitionBy("source_id").orderBy("gap", "commit_ts")
    ranked = (gaps.withColumn("rk", F.row_number().over(w_rank))
              .withColumn("n", F.count(F.lit(1))
                          .over(Window.partitionBy("source_id"))))
    def nearest(pct: int, name: str):
        # nearest-rank ceil(pct*n/100) in EXACT integer arithmetic
        # ((pct*n + 99) div 100): a float q*n diverges between engines
        # (DuckDB parses 0.9 as DECIMAL and gets exact products; Spark
        # lit(0.9) is DOUBLE and 0.9*10 ceils to 10, not 9)
        return F.max(F.when(
            F.col("rk") == F.expr(f"({pct} * n + 99) div 100"),
            F.col("gap"))).alias(name)
    return (ranked.groupBy("source_id")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 nearest(50, "p50_gap"),
                 nearest(90, "p90_gap"),
                 F.max("gap").alias("max_gap")))


def conflict_rate(changes: DataFrame,
                  bucket_width: int = 1 << 13) -> DataFrame:
    """Causality-conflict rate per commit-ts bucket: the fraction of
    transactions that touch a (db, tbl, pk) key some OTHER txn in the
    same bucket also touches. This is the workload's intrinsic
    serialization pressure — exactly what the reference's causality
    map turns into worker hand-offs (causality.go DetectConflict) —
    so a rising rate predicts apply-path convoy before throughput
    drops.

    Scale: distinct (bucket, key, txn) triples -> per-(bucket, key)
    txn counts -> per-txn conflicted flag -> per-bucket rollup. All
    shuffles key on (bucket, key) or (bucket, txn); the report is
    ts_range / bucket_width rows. Percentage is an exact scaled
    integer (x100, integer division).
    """
    keyed = (changes
             .select((F.floor(F.col("commit_ts") / bucket_width))
                     .cast("long").alias("bucket"),
                     "db", "tbl", "pk", "commit_ts")
             .distinct())
    per_key = (keyed.groupBy("bucket", "db", "tbl", "pk")
               .agg(F.count(F.lit(1)).alias("n_txns_on_key")))
    txn_flag = (keyed.join(per_key, ["bucket", "db", "tbl", "pk"])
                .groupBy("bucket", "commit_ts")
                .agg(F.max(F.when(F.col("n_txns_on_key") > 1, 1)
                           .otherwise(0)).alias("conflicted")))
    return (txn_flag.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_txns"),
                 F.sum("conflicted").alias("n_conflicted"))
            .withColumn("conflict_pct_x100",
                        F.floor(F.lit(10000) * F.col("n_conflicted")
                                / F.col("n_txns")).cast("long")))


def txn_fanout(changes: DataFrame) -> DataFrame:
    """Multi-table transaction fanout report: how many distinct tables
    each transaction touches, rolled up per source. The reference
    applies each binlog (= one upstream txn) as one downstream txn but
    DISPATCHES its mutations per table for parallel apply
    (drainer/syncer.go:335-420, pkg/loader executor batching) — this
    report is the decision input: a corpus of single-table txns can
    dispatch freely; heavy cross-table txns constrain causality-safe
    parallelism.

    Two map-side-combinable aggregations keyed (source_id, commit_ts)
    then (source_id, n_tables) — no windows, no driver loop.
    """
    txn = (changes
           .groupBy("source_id", "commit_ts")
           .agg(F.countDistinct(F.concat_ws(".", "db", "tbl"))
                .alias("n_tables"),
                F.count(F.lit(1)).alias("n_events")))
    return (txn.groupBy("source_id", "n_tables")
            .agg(F.count(F.lit(1)).alias("n_txns"),
                 F.sum("n_events").alias("n_events"),
                 F.max("n_events").alias("max_txn_events")))


def schema_adoption(changes: DataFrame) -> DataFrame:
    """Schema-version rollout report per table: each version's event
    count, commit-ts range, and whether its range OVERLAPS the next
    version's (an interleaved window = writers on both schemas at
    once — exactly when the schema-version gate and default back-fill
    (operators/schema_evolution) are load-bearing; reference: the
    drainer holds multiple schema versions live until the job's
    commit-ts passes, drainer/schema.go handlePrevSchemas).

    One (db,tbl,version) aggregate + one per-table LEAD window over
    #versions rows — the heavy lifting is map-side combinable; the
    window input is tiny.
    """
    per = (changes
           .groupBy("db", "tbl", "schema_version")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("source_id").alias("n_sources"),
                F.min("commit_ts").alias("first_ts"),
                F.max("commit_ts").alias("last_ts")))
    w = (Window.partitionBy("db", "tbl")
         .orderBy("schema_version"))
    return (per
            .withColumn("next_first_ts",
                        F.lead("first_ts").over(w))
            .withColumn("interleaved",
                        F.coalesce(F.col("next_first_ts")
                                   < F.col("last_ts"), F.lit(False)))
            .select("db", "tbl", "schema_version", "n_events",
                    "n_sources", "first_ts", "last_ts", "interleaved"))


def checkpoint_lag(ok: DataFrame) -> DataFrame:
    """Per-source replication-lag report over the appliable stream:
    each source's checkpoint (max appliable commit_ts), its lag behind
    the global high-water mark, and how many of its events sit ABOVE
    the k-way merge watermark (min checkpoint across sources) — the
    rows the merged stream cannot emit until the slowest source
    advances. This is the drainer's pump-window observability
    (drainer/merge.go latest-ts map; drainer/metrics.go checkpoint
    tso gauge) as one report: it tells an operator WHICH source is
    holding the merge back and by how much.

    Shape: the appliable stream persists once (it is typically an
    order-gate window pipeline — without the persist the blocked
    recount would re-run that whole lineage), then one per-source
    aggregate, two single-row aggregates (global max / min
    checkpoint) broadcast back, and one filtered recount over the
    cached rows. No window over unpartitioned data."""
    from ..cache import managed_persist
    ok = managed_persist(ok.select("source_id", "commit_ts"))
    per = (ok.groupBy("source_id")
           .agg(F.max("commit_ts").alias("checkpoint_ts"),
                F.count(F.lit(1)).alias("n_ok")))
    marks = per.agg(
        F.max("checkpoint_ts").alias("global_max_ts"),
        F.min("checkpoint_ts").alias("merge_watermark_ts"))
    blocked = (ok.crossJoin(F.broadcast(marks))
               .filter(F.col("commit_ts") > F.col("merge_watermark_ts"))
               .groupBy("source_id")
               .agg(F.count(F.lit(1)).alias("n_blocked")))
    return (per.crossJoin(F.broadcast(marks))
            .join(blocked, "source_id", "left")
            .select("source_id", "checkpoint_ts", "n_ok",
                    (F.col("global_max_ts") - F.col("checkpoint_ts"))
                     .alias("lag_ts"),
                    F.coalesce("n_blocked", F.lit(0)).alias("n_blocked")))


def interarrival_regularity(events: DataFrame,
                            key_col: str = "user_id",
                            ts_col: str = "ts",
                            order_col: str = "event_id",
                            min_gaps: int = 5,
                            cv2_pct: int = 1) -> DataFrame:
    """Bot detection by inter-arrival regularity: flag keys whose
    event gaps are near-constant — squared coefficient of variation
    below ``cv2_pct`` percent, evaluated in exact integer form as
        (100/pct) * (n*sumsq - sum^2) < sum^2
    (population CV^2 = (n*sumsq - sum^2) / sum^2; no float variance,
    no sqrt, so the flag is engine-exact). Gaps quantize to whole
    seconds; sumsq stays DECIMAL(38,0) internally (gap^2 * n can pass
    2^63) and only BIGINT-safe columns are emitted.

    Shape: ONE per-key lag window + one per-key aggregate."""
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    gaps = (events
            .select(key_col, ts_col, order_col)
            .withColumn("prev_ts", F.lag(ts_col).over(w))
            .filter(F.col("prev_ts").isNotNull())
            .select(key_col,
                    F.expr(f"({ts_col} - prev_ts) DIV 1000000000")
                     .alias("gap_s")))
    agg = (gaps.groupBy(key_col)
           .agg(F.count(F.lit(1)).alias("n_gaps"),
                F.sum("gap_s").alias("sum_s"),
                F.sum(F.expr("CAST(gap_s AS DECIMAL(38,0)) * gap_s"))
                 .alias("sumsq_s")))
    dec = "CAST({} AS DECIMAL(38,0))"
    cv_test = (f"{100 // cv2_pct} * "
               f"({dec.format('n_gaps')} * sumsq_s "
               f"- {dec.format('sum_s')} * {dec.format('sum_s')}) "
               f"< {dec.format('sum_s')} * {dec.format('sum_s')}")
    return (agg.filter(F.col("n_gaps") >= min_gaps)
            .select(key_col, "n_gaps", "sum_s",
                    F.expr("sum_s DIV n_gaps").alias("mean_gap_s"),
                    F.expr(cv_test).alias("is_regular")))


def dml_mix_drift(changes: DataFrame, window_ticks: int = 10_000,
                  drift_ppm_threshold: int = 300_000) -> DataFrame:
    """Per-(db, tbl) DML-mix drift detector: the I/U/D composition of
    each commit-ts window in exact ppm, plus the L1 distance to the
    previous window's mix and a flag when it exceeds the threshold —
    the ops alarm for "this table suddenly turned into mass deletes"
    that the reference's per-type event counters
    (drainer/metrics.go eventCounter, binlogctl status output) leave
    to the operator's eyeballs.

    All-integer (ppm via integer division, L1 in ppm), so the FLAG
    itself is engine-exact. The first window of a table has no
    predecessor: drift is NULL and the flag false.

    Scale: one (db, tbl, window) count aggregate (map-side
    combinable), then a lag window over the count-reduced frame —
    #tables * #windows rows, never raw events.
    """
    c = (changes.withColumn(
            "win", F.expr(f"commit_ts DIV {window_ticks}"))
         .groupBy("db", "tbl", "win")
         .agg(F.count(F.lit(1)).alias("n_total"),
              F.count(F.when(F.col("op") == "I", 1)).alias("n_ins"),
              F.count(F.when(F.col("op") == "U", 1)).alias("n_upd"),
              F.count(F.when(F.col("op") == "D", 1)).alias("n_del")))
    for o in ("ins", "upd", "del"):
        c = c.withColumn(f"{o}_ppm",
                         F.expr(f"(n_{o} * 1000000) DIV n_total"))
    w = Window.partitionBy("db", "tbl").orderBy("win")
    for o in ("ins", "upd", "del"):
        c = c.withColumn(f"prev_{o}", F.lag(f"{o}_ppm").over(w))
    c = c.withColumn(
        "drift_ppm",
        F.expr("abs(ins_ppm - prev_ins) + abs(upd_ppm - prev_upd) "
               "+ abs(del_ppm - prev_del)"))
    return (c.withColumn(
                "drift_flag",
                F.coalesce(F.col("drift_ppm")
                           > F.lit(drift_ppm_threshold), F.lit(False)))
            .select("db", "tbl", "win", "n_total", "ins_ppm",
                    "upd_ppm", "del_ppm", "drift_ppm", "drift_flag"))
