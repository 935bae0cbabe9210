"""Kafka transport wiring for the obinlog sink / arbiter source.

Reference contract (drainer/sync/kafka.go:38-278):
- topic defaults to ``<clusterID>_obinlog`` (kafka.go:61-62);
- messages are produced with Key=nil to PARTITION 0 via a manual
  partitioner (kafka.go:96,153) — the single-partition topic IS the
  total-order guarantee consumers rely on;
- the value is the marshalled secondary-binlog message (our JSON
  stand-in from sinks/payload, byte-identical across engines);
- the arbiter consumes from a saved offset and deduplicates re-reads
  by commit_ts (arbiter/server.go:287-317 — the dedup operator lives
  in the sink_payload_roundtrip surface).

Spark-first: the produce side is a DataFrame in the exact column
contract Spark's Kafka sink consumes (key/value/topic/partition), so
``df.write.format("kafka")`` / ``writeStream`` need only broker
options; the consume side is ``readStream.format("kafka")`` plus the
existing parse_obinlog projection. This sandbox ships no Kafka broker
or spark-sql-kafka package, so the frame/option construction is
tested here and the send/poll calls stay thin pass-throughs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import payload as payload_mod


def default_topic(cluster_id: int) -> str:
    """kafka.go:61-62: clusterID string + "_obinlog"."""
    return f"{cluster_id}_obinlog"


def kafka_frame(changes: DataFrame, cluster_id: int = 0,
                topic: str | None = None,
                wide_info=None) -> DataFrame:
    """Change events -> the Spark Kafka sink's column contract:
    (key BINARY, value BINARY, topic STRING, partition INT).

    key is NULL and partition is the constant 0, mirroring the manual
    partitioner. A single target partition is NOT by itself a
    total-order guarantee — concurrent Spark tasks would race their
    sends into the broker's append order — so the frame is coalesced
    to ONE producing task sorted by commit_ts, matching the
    reference's single sequential producer goroutine
    (kafka.go:153-187). At 100 TB this is a deliberate single-writer
    bottleneck the REFERENCE also has (total order is the product
    contract); shard-by-table topics would relax it."""
    topic = topic or default_topic(cluster_id)
    if wide_info is not None:
        msgs = payload_mod.obinlog_payload_wide(changes, wide_info)
    else:
        msgs = payload_mod.obinlog_payload(changes)
    frame = msgs.select(
        F.lit(None).cast("binary").alias("key"),
        F.encode(F.col("payload"), "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.col("commit_ts").alias("_order"))
    return (frame.coalesce(1)
            .sortWithinPartitions("_order")
            .drop("_order"))


def producer_options(bootstrap_servers: str,
                     max_message_bytes: int | None = None) -> dict[str, str]:
    """Spark Kafka sink options mirroring the producer config kafka.go
    builds (acks=all WaitForAll, max message size)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.acks": "all",
    }
    if max_message_bytes is not None:
        opts["kafka.max.request.size"] = str(max_message_bytes)
    return opts


def consumer_options(bootstrap_servers: str, cluster_id: int = 0,
                     topic: str | None = None,
                     starting_offsets: str = "earliest") -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic or default_topic(cluster_id),
        "startingOffsets": starting_offsets,
        # single-partition topic: one Spark task consumes in order
        "maxOffsetsPerTrigger": "100000",
    }
    return opts


def write_kafka(changes: DataFrame, bootstrap_servers: str,
                cluster_id: int = 0, topic: str | None = None,
                wide_info=None) -> None:
    """Batch produce (requires the spark-sql-kafka package + broker)."""
    frame = kafka_frame(changes, cluster_id, topic, wide_info)
    writer = frame.write.format("kafka")
    for k, v in producer_options(bootstrap_servers).items():
        writer = writer.option(k, v)
    writer.save()


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str,
                      cluster_id: int = 0, topic: str | None = None,
                      starting_offsets: str = "earliest") -> DataFrame:
    """Arbiter-style streaming consume -> normalized change rows.
    The kafka source emits (key, value, topic, partition, offset,
    timestamp, ...); offset is carried through as arrival_seq so the
    commit_ts dedup downstream matches sink_payload_roundtrip."""
    reader = spark.readStream.format("kafka")
    for k, v in consumer_options(bootstrap_servers, cluster_id, topic,
                                 starting_offsets).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return decode_kafka_batch(raw)


def decode_kafka_batch(raw: DataFrame) -> DataFrame:
    """The decode projection shared by the stream reader and tests:
    value bytes -> payload JSON -> parsed rows, offset -> arrival_seq."""
    msgs = raw.select(
        F.col("offset").alias("arrival_seq"),
        F.decode(F.col("value"), "UTF-8").alias("payload"))
    return payload_mod.parse_obinlog(msgs, carry=("arrival_seq",))
