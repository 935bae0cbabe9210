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
                     checkpoint_dir: str, available_now: bool = True):
    """The DML replication path as one streaming query. Returns the
    StreamingQuery (caller awaits termination)."""
    table = SnapshotTable(spark, table_root)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        ok = ordering.ordered_stream(batch_df)
        compacted = compaction.compact_last_image(ok)
        # D rows must reach the sink (they delete); SnapshotTable
        # resolves cross-batch order by commit_ts.
        table.apply_batch(compacted)

    stream = read_change_stream(spark, source_dir)
    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
