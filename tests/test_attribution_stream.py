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


def test_attribution_stream_randomized_splits_match_batch(spark, tmp_path):
    """Property (seeded): random user/type/time events cut into random
    micro-batch files — every conversion old enough to close must
    carry exactly the batch credits."""
    import random
    rng = random.Random(42)
    n = 120
    events = []
    for i in range(n):
        u = rng.randrange(6)
        typ = rng.choice(["click", "purchase", "view"])
        events.append((i, u, typ, _t(rng.randrange(0, 600))))
    src = str(tmp_path / "attr_rand")
    os.makedirs(src)
    # random split points into 5 files (arrival order = list order)
    cuts = sorted(rng.sample(range(1, n), 4))
    parts = [events[a:b] for a, b in
             zip([0] + cuts, cuts + [n])]
    for p in parts:
        _write(spark, src, p)
    # sentinels that pass both filters but can never join
    _write(spark, src, [(900, 99, "click", _t(100000)),
                        (901, 99, "purchase", _t(150000))])
    _write(spark, src, [(902, 99, "click", _t(200000)),
                        (903, 99, "purchase", _t(250000))])
    _write(spark, src, [(904, 99, "click", _t(300000)),
                        (905, 99, "purchase", _t(350000))])

    stream = (spark.readStream.schema(cs.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    # events arrive in RANDOM time order: the watermark delay must
    # cover the max disorder (600 min) or late touches are correctly
    # dropped and the batch comparison fails by design
    out = cs.attribution_stream(stream, watermark_delay="610 minutes")
    q = (out.writeStream.format("memory").queryName("attr_rand_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = sorted((r["user_id"], r["conversion_id"], r["touch_id"],
                  r["touch_rank"], r["n_touches"], r["credit_ppm"])
                 for r in spark.sql(
                     "SELECT * FROM attr_rand_out").collect()
                 if r["user_id"] != 99)

    batch_ev = (spark.read.parquet(src)
                .filter(F.col("user_id") != 99)
                .withColumn("ts", F.unix_micros("event_ts") * 1000)
                .select("event_id", "user_id", "event_type", "ts"))
    from tidb_binlog_spark.operators.funnel import multitouch_attribution
    want = sorted((r["user_id"], r["conversion_id"], r["touch_id"],
                   r["touch_rank"], r["n_touches"], r["credit_ppm"])
                  for r in multitouch_attribution(batch_ev).collect())
    assert want, "seeded fixture must produce conversions"
    assert got == want
