"""Contract pins for text.spread's partition-probe gate (r13 opt 2).

spread() exists to fan under-split FILE SCANS out to the cores; its
``.rdd`` partition probe on a frame already shaped by an exchange
would FINALIZE the AQE plan — executing every upstream shuffle stage
as an untracked side job at DataFrame-construction time. The gate
must therefore (a) keep spreading narrow scan-shaped frames, (b)
leave exchange-shaped frames untouched, and (c) never run a Spark
job for a gated frame.
"""

import pytest  # noqa: F401
from pyspark.sql import functions as F

from tidb_binlog_spark.functions.text import spread


def _docs(spark, n=40, parts=None):
    base = (spark.range(0, n, 1, parts) if parts
            else spark.range(n))
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 3).cast("string").alias("source"))


def test_spread_fans_out_narrow_frames(spark):
    """A projection/filter chain over an under-split leaf still gets
    the fan-out (the original contract; the fixture parquet is one
    split). coalesce/repartition frames are deliberately NOT in this
    class — an explicit Repartition is a sizing decision the caller
    already made."""
    one_part = _docs(spark, parts=1)
    out = spread(one_part.filter(F.col("doc_id") % 2 == 0))
    assert out.rdd.getNumPartitions() \
        == spark.sparkContext.defaultParallelism


def test_spread_leaves_exchange_shaped_frames_alone(spark):
    """Aggregate/join/window/limit/distinct-shaped frames come back
    unchanged — AQE owns their output sizing, and probing them would
    execute the upstream stages."""
    d = _docs(spark)
    shaped = [
        d.groupBy("source").agg(F.count(F.lit(1)).alias("n")),
        d.join(d.select("doc_id"), "doc_id"),
        d.orderBy("doc_id"),
        d.distinct(),
        d.limit(5),
        d.repartition(2, "doc_id"),
    ]
    for frame in shaped:
        assert spread(frame) is frame


def test_spread_gate_runs_no_jobs(spark):
    """Gating an exchange-shaped frame must not execute anything:
    the whole point is that the probe's AQE finalization ran the
    upstream stages as a hidden side job."""
    d = _docs(spark)
    agg = d.groupBy("source").agg(F.sum("doc_id").alias("s"))
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    spread(agg)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before
