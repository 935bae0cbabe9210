"""Streaming DAU: watermarked (user, day) dedup feeding a per-day
count must equal the batch distinct-user count for every closed day,
across any micro-batch split."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from tidb_binlog_spark.streaming import corpus_stream as cs


def _t(mins):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=mins)


def _write(spark, src, rows):
    spark.createDataFrame(rows, cs.EVENT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)


def test_dau_stream_matches_batch_per_closed_day(spark, tmp_path):
    src = str(tmp_path / "dau_src")
    os.makedirs(src)
    DAY = 24 * 60
    # day 0: users 1,2,1 (dau 2); day 1: users 1,3,3,4 (dau 3);
    # day 2: user 5 (dau 1)
    _write(spark, src, [(1, 1, "view", _t(10)), (2, 2, "view", _t(20))])
    _write(spark, src, [(3, 1, "view", _t(30)),
                        (4, 1, "view", _t(DAY + 10))])
    _write(spark, src, [(5, 3, "view", _t(DAY + 20)),
                        (6, 3, "view", _t(DAY + 30)),
                        (7, 4, "view", _t(DAY + 40))])
    _write(spark, src, [(8, 5, "view", _t(2 * DAY + 10))])
    # far-future sentinels advance the watermark so earlier days close
    _write(spark, src, [(98, 9, "view", _t(50 * DAY))])
    _write(spark, src, [(99, 9, "view", _t(60 * DAY))])

    stream = (spark.readStream.schema(cs.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = cs.dau_stream(stream, watermark_delay="1 minute")
    q = (out.writeStream.format("memory").queryName("dau_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["day_start"]: r["dau"]
           for r in spark.sql("SELECT * FROM dau_out").collect()}

    batch = (spark.read.parquet(src)
             .groupBy(F.window("event_ts", "1 day").alias("w"))
             .agg(F.countDistinct("user_id").alias("dau")))
    want = {r["w"]["start"]: r["dau"] for r in batch.collect()}
    # every day closed by the watermark must match the batch answer
    assert len(got) >= 3
    for day, dau in got.items():
        assert want[day] == dau, day
    for day in (_t(0), _t(DAY), _t(2 * DAY)):
        day = day.replace(hour=0, minute=0)
        assert day in got, day


def test_dau_stream_randomized_splits_match_batch(spark, tmp_path):
    """Property (seeded): random users over random days, random
    micro-batch cuts — closed days equal the batch distinct counts."""
    import random
    rng = random.Random(7)
    DAY = 24 * 60
    n = 150
    events = [(i, rng.randrange(8), "view",
               _t(rng.randrange(0, 5 * DAY))) for i in range(n)]
    src = str(tmp_path / "dau_rand")
    os.makedirs(src)
    cuts = sorted(rng.sample(range(1, n), 5))
    for a, b in zip([0] + cuts, cuts + [n]):
        _write(spark, src, events[a:b])
    _write(spark, src, [(900, 99, "view", _t(100 * DAY))])
    _write(spark, src, [(901, 99, "view", _t(200 * DAY))])

    stream = (spark.readStream.schema(cs.EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    # watermark must cover the random arrival disorder (5 days)
    out = cs.dau_stream(stream, watermark_delay="6 days")
    q = (out.writeStream.format("memory").queryName("dau_rand_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {r["day_start"]: r["dau"]
           for r in spark.sql("SELECT * FROM dau_rand_out").collect()}

    batch = (spark.read.parquet(src).filter(F.col("user_id") != 99)
             .groupBy(F.window("event_ts", "1 day").alias("w"))
             .agg(F.countDistinct("user_id").alias("dau")))
    want = {r["w"]["start"]: r["dau"] for r in batch.collect()}
    assert len(got) >= 5          # all five real days close
    for day, dau in got.items():
        if day in want:           # sentinel days may also emit
            assert want[day] == dau, day
    for day in want:
        assert day in got, day
