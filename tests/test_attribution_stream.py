import datetime as dt
import os
from pyspark.sql import functions as F
from tidb_binlog_spark.streaming import corpus_stream as cs
from tidb_binlog_spark.operators.funnel import multitouch_attribution

def _t(mins):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=mins)

def _write(spark, src, rows):
    spark.createDataFrame(rows, cs.EVENT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

def test_attribution_stream_matches_batch_across_splits(spark, tmp_path):
    src = str(tmp_path / "attr_src")
    os.makedirs(src)
    # user 1: clicks at 0,30,60; purchase at 90 (3 touches)
    # user 2: click at 0; purchase at 50 (1 touch); click at 55,
    #         purchase at 70 (2 touches: 0 is in-window too -> 3? no:
    #         window 6h, all in window -> touches {0,55})
    _write(spark, src, [(1, 1, "click", _t(0)), (2, 1, "click", _t(30)),
                        (10, 2, "click", _t(0))])
    _write(spark, src, [(3, 1, "click", _t(60)), (11, 2, "purchase", _t(50))])
    _write(spark, src, [(4, 1, "purchase", _t(90)), (12, 2, "click", _t(55)),
                        (13, 2, "purchase", _t(70))])
    # watermark flush sentinels: they must pass the conv/touch
    # filters to reach the watermark nodes (a 'noop' type would be
    # filtered out BEFORE withWatermark and never advance anything),
    # but are placed so the 6h interval can never join them
    _write(spark, src, [(98, 9, "click", _t(100000)),
                        (97, 9, "purchase", _t(150000))])
    _write(spark, src, [(99, 9, "click", _t(200000)),
                        (96, 9, "purchase", _t(250000))])
    _write(spark, src, [(95, 9, "click", _t(300000)),
                        (94, 9, "purchase", _t(350000))])

    stream = (spark.readStream.schema(cs.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = cs.attribution_stream(stream, watermark_delay="1 minute")
    q = (out.writeStream.format("memory").queryName("attr_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted((r["user_id"], r["conversion_id"], r["touch_id"],
                  r["touch_rank"], r["n_touches"], r["credit_ppm"])
                 for r in spark.sql("SELECT * FROM attr_out").collect())

    batch_ev = (spark.read.parquet(src)
                .withColumn("ts", F.unix_micros("event_ts") * 1000)
                .select("event_id", "user_id", "event_type", "ts"))
    want = sorted((r["user_id"], r["conversion_id"], r["touch_id"],
                   r["touch_rank"], r["n_touches"], r["credit_ppm"])
                  for r in multitouch_attribution(batch_ev).collect())
    assert want, "batch reference must be non-empty"
    assert got == want
    # credit conservation: every conversion sums to exactly 1e6
    sums = {}
    for u, c, t, rk, n, cr in got:
        sums[(u, c)] = sums.get((u, c), 0) + cr
    assert set(sums.values()) == {1_000_000}
