"""Streaming corpus ingestion: the curation pipeline as a Structured
Streaming flow — the shape a continuously-arriving crawl takes before
it reaches batch dedup/packing.

Stages:
- file-source readStream over a documents landing zone (each dropped
  file is one crawl segment; the checkpoint tracks consumed files,
  same replay-from-cursor contract as the change-stream source);
- STATELESS gates run the exact batch expressions (token/quality
  projections — identical code path, so batch and streaming cannot
  drift);
- exact dedup is STATEFUL ``dropDuplicatesWithinWatermark`` keyed on
  the content hash — the ingest-time watermark bounds state, so a
  forever-running ingest does not accumulate unbounded hashes (the
  streaming analog of functions/dedup.exact_dedup's groupBy);
- decontamination runs per micro-batch inside foreachBatch as the
  batch broadcast anti-join (a stream-side re-join of a derived
  stream would be an unsupported stream-stream self-join; foreachBatch
  gives each micro-batch full batch semantics — the pattern the CDC
  apply path already uses);
- per-source rolling quality stats are a windowed aggregation
  (watermark + append mode), the monitoring surface an ingest
  pipeline alarms on.

Scale: the stream side is shuffled only by the stateful dedup (keyed
on content hash — uniform) and the windowed stats (keyed on
(window, source) — bounded cardinality). State stores partition by
key across executors; watermarks cap their size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("ingest_ts", T.TimestampType()),
])


def read_document_stream(spark: SparkSession, source_dir: str,
                         max_files_per_trigger: int | None = None
                         ) -> DataFrame:
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(source_dir)


# shared by the gate and the monitoring surface so the alarm metric
# cannot drift from what the gate actually rejects
DEFAULT_MIN_TOKENS = 5


def curate_stream(docs: DataFrame,
                  watermark_delay: str = "10 minutes",
                  min_tokens: int = DEFAULT_MIN_TOKENS,
                  max_non_alpha: float = 0.4) -> DataFrame:
    """Quality-gate + stateful-dedup a document stream. Returns the
    surviving stream with quality columns attached: (doc_id, source,
    ingest_ts, n_tokens, non_alpha_ratio, content_hash, text)."""
    from ..functions.text import TOKENS
    gated = (docs
             .withWatermark("ingest_ts", watermark_delay)
             .withColumn("toks", F.expr(TOKENS))
             .withColumn("n_tokens", F.expr("size(toks)"))
             .withColumn(
                 "non_alpha_ratio",
                 F.expr("CAST(size(regexp_extract_all(text, '[^a-z ]', 0))"
                        " AS DOUBLE) / CAST(length(text) AS DOUBLE)"))
             .filter((F.col("n_tokens") >= min_tokens)
                     & (F.col("non_alpha_ratio") <= max_non_alpha))
             .withColumn("content_hash", F.md5("text")))
    return (gated
            .dropDuplicatesWithinWatermark(["content_hash"])
            .select("doc_id", "source", "ingest_ts", "n_tokens",
                    "non_alpha_ratio", "content_hash", "text"))


def contaminated_ids(batch_docs: DataFrame,
                     bench_shingles: DataFrame) -> DataFrame:
    """Doc ids sharing any word-3-gram shingle with the (broadcast)
    benchmark set — batch semantics, called per micro-batch."""
    from ..functions.dedup import with_shingles
    doc_sh = (with_shingles(batch_docs.select("doc_id", "text"))
              .select("doc_id", F.explode("shingles").alias("sh")))
    return (doc_sh.join(F.broadcast(bench_shingles), "sh", "left_semi")
            .select("doc_id").distinct())


def source_quality_stats(docs: DataFrame,
                         window_size: str = "1 minute",
                         watermark_delay: str = "2 minutes",
                         min_tokens: int = DEFAULT_MIN_TOKENS) -> DataFrame:
    """Windowed per-source ingest monitoring: doc counts, token
    totals, reject counts — append-mode once the watermark passes a
    window (the alarm surface of a continuously-running ingest)."""
    from ..functions.text import TOKENS
    return (docs
            .withWatermark("ingest_ts", watermark_delay)
            .withColumn("n_tokens", F.expr(f"size({TOKENS})"))
            .groupBy(F.window("ingest_ts", window_size).alias("w"),
                     "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.count(F.when(F.col("n_tokens") < min_tokens, 1))
                  .alias("n_too_short"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "source", "n_docs", "total_tokens", "n_too_short"))


def scrub_contaminated_spans(batch_docs: DataFrame,
                             bench_docs: DataFrame,
                             w: int = 16) -> DataFrame:
    """Span-level decontamination for a micro-batch: remove ONLY the
    >=w-token passages shared with the (broadcast-sized) benchmark
    set, keep the rest of each document. Documents WITHOUT any shared
    span keep their text byte-for-byte (strip_spans' tokenize+rejoin
    rewrite touches only the spanned docs); documents scrubbed down
    to nothing are dropped — they were pure benchmark material.
    Text-derived quality columns attached upstream (content_hash,
    n_tokens) are recomputed for rewritten docs so the written output
    never pairs pre-scrub metadata with post-scrub text."""
    from ..functions.dedup import decontaminate_spans, strip_spans
    from ..functions.text import TOKENS
    texts = batch_docs.select("doc_id", "text")
    spans = decontaminate_spans(texts, bench_docs, w)
    spanned = texts.join(spans.select("doc_id").distinct(), "doc_id",
                         "left_semi")
    cleaned = strip_spans(spanned, spans)
    out = (batch_docs
           .join(cleaned.select("doc_id",
                                F.col("clean_text").alias("_new_text")),
                 "doc_id", "left")
           .withColumn("_rewritten", F.col("_new_text").isNotNull())
           .withColumn("text", F.coalesce("_new_text", "text"))
           .drop("_new_text")
           .filter(F.col("text") != ""))
    for col, expr in (("content_hash", "md5(text)"),
                      ("n_tokens", f"size({TOKENS})")):
        if col in out.columns:
            out = out.withColumn(
                col, F.when(F.col("_rewritten"),
                            F.expr(expr)).otherwise(F.col(col)))
    return out.drop("_rewritten")


def run_curation_stream(spark: SparkSession, source_dir: str,
                        checkpoint_dir: str, out_dir: str,
                        bench_shingles: DataFrame | None = None,
                        bench_docs: DataFrame | None = None,
                        available_now: bool = True):
    """Wire the curated stream to a parquet output directory; the
    optional decontamination runs inside foreachBatch — whole-doc
    drop via ``bench_shingles`` (anti-join) and/or surgical span
    scrub via ``bench_docs`` (quote removed, document kept).
    Returns the StreamingQuery (caller awaits termination)."""
    stream = curate_stream(read_document_stream(spark, source_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if bench_shingles is not None:
            out = out.join(contaminated_ids(out, bench_shingles),
                           "doc_id", "left_anti")
        if bench_docs is not None:
            out = scrub_contaminated_spans(out, bench_docs)
        # idempotent under foreachBatch's at-least-once replay: a
        # re-run of the same micro-batch OVERWRITES its own batch-id
        # partition instead of appending duplicates
        (out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir))

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("event_ts", T.TimestampType()),
])


def read_event_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int | None = None
                      ) -> DataFrame:
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(source_dir)


def sessionize_stream(events: DataFrame,
                      gap: str = "30 minutes",
                      watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming gap-based sessionization — the streaming twin of the
    batch events_sessionize query, on Spark's native session_window
    (state merges windows within the gap; the watermark closes and
    emits sessions whose gap has passed). Returns one row per closed
    (user, session): start/end, event count, distinct event types.

    Scale: session state is keyed (user_id, window) and partitioned
    across executors; the watermark bounds both state size and
    emission latency — exactly the fake-binlog/idle-source trade the
    CDC merge makes, applied to behavioral sessions."""
    return (events
            .withWatermark("event_ts", watermark_delay)
            .groupBy(F.session_window("event_ts", gap).alias("w"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 # countDistinct is unsupported in streaming aggs; the
                 # per-session type set is tiny so collect_set is exact
                 F.size(F.collect_set("event_type"))
                  .alias("n_event_types"),
                 # temporally-first event (ties by id) — same
                 # (ts, event_id) attribution as the batch twin, NOT
                 # min(event_id), which misattributes when ids are not
                 # monotone in time
                 F.min(F.struct("event_ts", "event_id"))
                  .getField("event_id").alias("first_event_id"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "n_event_types", "first_event_id"))


def attribution_stream(events: DataFrame,
                       conversion_type: str = "purchase",
                       touch_type: str = "click",
                       window: str = "6 hours",
                       watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming twin of the batch linear multi-touch attribution
    (operators/funnel.multitouch_attribution): a watermarked
    stream-stream interval join (touches in the ``window`` before
    each conversion, both sides' state bounded by the watermark +
    join range) feeding a per-conversion streaming aggregate, then a
    STATELESS credit split — same floor-ppm arithmetic, last touch
    absorbs the remainder, credits per conversion sum to exactly 1e6.

    Scale: join and aggregate are both keyed on the user/conversion —
    state partitions across executors and the watermark bounds it in
    time exactly like the CDC merge bounds source buffers. The rank
    the batch twin gets from a window function comes here from
    sort_array over the per-conversion touch set (bounded by touch
    density in ``window``), NOT from an unbounded sort.
    """
    conv = (events.filter(F.col("event_type") == conversion_type)
            .select("user_id",
                    F.col("event_id").alias("conversion_id"),
                    F.col("event_ts").alias("conv_ts"))
            .withWatermark("conv_ts", watermark_delay))
    touch = (events.filter(F.col("event_type") == touch_type)
             .select(F.col("user_id").alias("t_user"),
                     F.col("event_id").alias("touch_id"),
                     F.col("event_ts").alias("touch_ts"))
             .withWatermark("touch_ts", watermark_delay))
    j = conv.join(
        touch,
        F.expr(f"user_id = t_user AND touch_ts < conv_ts "
               f"AND touch_ts >= conv_ts - INTERVAL {window}"))
    agg = (j.groupBy("user_id", "conversion_id", "conv_ts")
           .agg(F.sort_array(F.collect_list(
               F.struct("touch_ts", "touch_id"))).alias("touches")))
    return (agg
            .select("user_id", "conversion_id", "conv_ts",
                    F.size("touches").alias("n_touches"),
                    F.posexplode("touches").alias("pos", "t"))
            .select("user_id", "conversion_id", "conv_ts",
                    F.col("t.touch_id").alias("touch_id"),
                    (F.col("pos") + 1).alias("touch_rank"),
                    "n_touches",
                    F.expr("1000000 DIV n_touches "
                           "+ IF(pos + 1 = n_touches, "
                           "1000000 % n_touches, 0)")
                    .alias("credit_ppm")))


def dau_stream(events: DataFrame,
               watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming twin of the batch DAU count (the day column of
    events_dau_wau_mau): watermarked per-(user, day) deduplication
    feeding a per-day streaming count — the chained stateful
    dedup -> aggregate shape (state for both operators is keyed and
    watermark-bounded; after the dedup, COUNT(*) IS the distinct-user
    count, no unsupported streaming countDistinct needed). Emits one
    row per closed day in append mode.

    Scale: dedup state is one entry per (user, day) inside the
    watermark horizon; the day aggregate is a counter per open day.
    Both partition across executors by their keys.
    """
    e = (events
         .withWatermark("event_ts", watermark_delay)
         .withColumn("day", F.window("event_ts", "1 day")))
    d = e.dropDuplicates(["user_id", "day"])
    return (d.groupBy("day")
            .agg(F.count(F.lit(1)).alias("dau"))
            .select(F.col("day.start").alias("day_start"), "dau"))
