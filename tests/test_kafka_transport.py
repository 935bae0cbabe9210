"""Kafka transport wiring (no broker in this sandbox): the produce
frame matches Spark's Kafka sink contract and the reference's
single-partition total-order semantics; the consume projection decodes
what a broker would hand back, byte-for-byte.

Reference: drainer/sync/kafka.go:38-278 (topic naming, manual
partitioner to partition 0, nil key), arbiter/server.go:287-317."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import make_changes
from tidb_binlog_spark.sinks import kafka


def _ch(spark):
    return make_changes(spark, [
        (i, "s0", i * 10, "IUD"[i % 3], i % 5, 0, float(i)) for i in range(30)])


def test_default_topic_matches_reference():
    assert kafka.default_topic(6711494708837530188) == \
        "6711494708837530188_obinlog"


def test_kafka_frame_contract(spark):
    frame = kafka.kafka_frame(_ch(spark), cluster_id=42)
    # exact column contract of spark's kafka sink
    assert [(f.name, type(f.dataType)) for f in frame.schema.fields] == [
        ("key", T.BinaryType), ("value", T.BinaryType),
        ("topic", T.StringType), ("partition", T.IntegerType)]
    rows = frame.collect()
    assert all(r["key"] is None for r in rows)          # nil key
    assert all(r["partition"] == 0 for r in rows)       # manual partition 0
    assert all(r["topic"] == "42_obinlog" for r in rows)
    assert all(isinstance(r["value"], (bytes, bytearray)) for r in rows)


def test_producer_consumer_options():
    p = kafka.producer_options("b1:9092,b2:9092", max_message_bytes=1 << 30)
    assert p["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert p["kafka.acks"] == "all"                     # WaitForAll
    assert p["kafka.max.request.size"] == str(1 << 30)
    c = kafka.consumer_options("b:9092", cluster_id=7)
    assert c["subscribe"] == "7_obinlog"
    assert c["startingOffsets"] == "earliest"


def test_produce_decode_roundtrip_without_broker(spark):
    """kafka_frame -> (simulated broker echo: offset + value) ->
    decode_kafka_batch reconstructs the change rows exactly."""
    from pyspark.sql import Window
    ch = _ch(spark)
    frame = kafka.kafka_frame(ch)
    # what the broker hands back: assigned offsets + the value bytes
    w = Window.partitionBy("partition").orderBy(F.col("value"))
    echoed = frame.withColumn(
        "offset", F.row_number().over(w).cast("long"))
    decoded = kafka.decode_kafka_batch(echoed)
    got = decoded.select("commit_ts", "op", "db", "tbl", "pk", "seq")
    want = ch.select("commit_ts", "op", "db", "tbl", "pk", "seq")
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0
