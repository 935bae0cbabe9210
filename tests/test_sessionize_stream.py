"""Stateful streaming gap-sessionization: closed sessions must match
the batch window's sessions across any micro-batch split; the open
tail parks in state (or flushes on idle timeout)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import Window

from tidb_binlog_spark.streaming import sessionize_stream as ss


def _write_batch(spark, src, rows):
    df = spark.createDataFrame(rows, ss.EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, name, gap_ns):
    stream = (spark.readStream.schema(ss.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    out = ss.sessionize_stream(stream, gap_ns=gap_ns)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_sessions_close_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    G = 100
    # user 1: [10,50,90] | [300] (gap closes s1) | [310, 700]
    # user 2: single event, stays open forever
    _write_batch(spark, src, [(1, 10, 0), (1, 50, 1), (1, 90, 2),
                              (2, 40, 3)])
    _write_batch(spark, src, [(1, 300, 4)])
    _write_batch(spark, src, [(1, 310, 5), (1, 700, 6)])
    got = sorted((r["user_id"], r["session_start"], r["session_end"],
                  r["n_events"], r["status"])
                 for r in _run(spark, src, "sess_out", G))
    # closed: [10..90] x3 events; [300..310] x2. Open tails ([700],
    # user 2's [40]) stay parked under NoTimeout.
    assert got == [(1, 10, 90, 3, "closed"), (1, 300, 310, 2, "closed")]


def test_sessions_match_batch_window_on_fixture(spark, tmp_path):
    """Equivalence vs the batch lag-window sessionization over the
    sf0.001 events table, split into 4 per-user-ordered micro-batches:
    every BATCH session except each user's last (still open) must be
    emitted closed with identical bounds and counts."""
    from tidb_binlog_spark.session import load_tables
    load_tables(spark, "/root/testdata/sf0.001", "events")
    ev = (spark.table("events")
          .select("user_id", "ts", "event_id"))
    gap_ns = 30 * 60 * 1_000_000_000

    # batch reference: flag gaps, number sessions, aggregate
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_s", F.when(F.lag("ts").over(w).isNull()
                        | ((F.col("ts") - F.lag("ts").over(w)) > gap_ns),
                        1).otherwise(0))
    numbered = flagged.withColumn(
        "s_no", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    batch = (numbered.groupBy("user_id", "s_no")
             .agg(F.min("ts").alias("session_start"),
                  F.max("ts").alias("session_end"),
                  F.count(F.lit(1)).alias("n_events"))
             .withColumn("last_s", F.max("s_no").over(
                 Window.partitionBy("user_id"))))
    want = sorted((r["user_id"], r["session_start"], r["session_end"],
                   r["n_events"])
                  for r in batch.filter(F.col("s_no") < F.col("last_s"))
                  .collect())

    src = str(tmp_path / "src")
    os.makedirs(src)
    # 4 splits by global ts quartile: per-user arrival stays ordered
    qs = ev.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + qs + [float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (ev.filter((F.col("ts") > lo) & (F.col("ts") <= hi))
         .coalesce(1).write.mode("append").parquet(src))

    got = sorted((r["user_id"], r["session_start"], r["session_end"],
                  r["n_events"])
                 for r in _run(spark, src, "sess_fix", gap_ns))
    assert got == want and len(want) > 0


def test_late_straggler_never_reopens_history(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    G = 100
    _write_batch(spark, src, [(1, 10, 0), (1, 50, 1)])
    _write_batch(spark, src, [(1, 500, 2)])     # closes [10..50]
    # straggler at ts 20: older than the OPEN session's start — must
    # count as late, not re-open the closed [10..50]
    _write_batch(spark, src, [(1, 20, 3), (1, 520, 4)])
    _write_batch(spark, src, [(1, 900, 5)])     # closes [500..520]
    rows = _run(spark, src, "sess_late", G)
    got = sorted((r["session_start"], r["session_end"], r["n_events"],
                  r["n_late"]) for r in rows)
    assert got == [(10, 50, 2, 0), (500, 520, 2, 1)]


def test_idle_timeout_flushes_open_tail(spark, tmp_path):
    """ProcessingTimeTimeout mode: an idle user's open session is
    emitted with status='open' and evicted (the continuous-source
    flush path)."""
    import time
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [(7, 10, 0), (7, 20, 1)])
    stream = (spark.readStream.schema(ss.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    out = ss.sessionize_stream(stream, gap_ns=100, idle_timeout_ms=1)
    q = (out.writeStream.format("memory").queryName("sess_idle")
         .outputMode("append")
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sess_idle").collect()
            if rows:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert [(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["status"]) for r in rows] \
        == [(7, 10, 20, 2, "open")]
