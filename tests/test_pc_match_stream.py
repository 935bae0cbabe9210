"""Stateful streaming P/C matcher: state must carry a parked P across
micro-batches and emit exactly on the C's arrival."""

from __future__ import annotations

import os

from tidb_binlog_spark.streaming import pc_match_stream as pcs


def _write_batch(spark, src, rows):
    df = spark.createDataFrame(rows, pcs.EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(src)


def test_pc_match_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: P(1), P(2), C(2); batch 2: C(1), P(3)+R(3)
    _write_batch(spark, src, [
        (1, "P", None, "payload-1"),
        (2, "P", None, "payload-2"),
        (2, "C", 25, None),
    ])
    _write_batch(spark, src, [
        (1, "C", 15, None),
        (3, "P", None, "payload-3"),
        (3, "R", None, None),
    ])

    stream = (spark.readStream.schema(pcs.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    out = pcs.match_pc_stream(stream)
    q = (out.writeStream.format("memory").queryName("pc_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {r["start_ts"]: (r["commit_ts"], r["payload"], r["status"])
           for r in spark.sql("SELECT * FROM pc_out").collect()}
    # txn 2 matched within a batch; txn 1 matched across batches
    # (state carried the parked P); txn 3 rolled back -> never emitted
    assert got[2] == (25, "payload-2", "matched")
    assert got[1] == (15, "payload-1", "matched")
    assert 3 not in got


def test_rollback_before_prewrite_drops_txn(spark, tmp_path):
    """R arriving in a micro-batch BEFORE its P: the rollback must be
    remembered in state so the late P is dropped, not parked forever
    (sorter.go resolves parked entries by txn status on lookup)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: R(5) with no P yet, plus a normal txn 6
    _write_batch(spark, src, [
        (5, "R", None, None),
        (6, "P", None, "payload-6"),
        (6, "C", 65, None),
    ])
    # batch 2: the late P(5) — must be discarded, and state evicted
    _write_batch(spark, src, [
        (5, "P", None, "payload-5"),
    ])

    stream = (spark.readStream.schema(pcs.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    out = pcs.match_pc_stream(stream)
    q = (out.writeStream.format("memory").queryName("pc_out_rbp")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {r["start_ts"]: (r["commit_ts"], r["status"])
           for r in spark.sql("SELECT * FROM pc_out_rbp").collect()}
    assert got == {6: (65, "matched")}
