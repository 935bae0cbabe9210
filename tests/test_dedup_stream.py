"""Stateful streaming exact dedup: admission decisions must match the
batch first-occurrence rule across any micro-batch split, and
duplicates arriving in LATER batches must still be rejected against
state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tidb_binlog_spark.streaming import dedup_stream as ds


def _write_batch(spark, src, rows):
    df = spark.createDataFrame(rows, ds.DOC_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, name):
    stream = (spark.readStream.schema(ds.DOC_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    out = ds.dedup_stream(stream)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_cross_batch_duplicates_rejected(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [(1, "ha"), (2, "hb"), (3, "ha")])
    _write_batch(spark, src, [(4, "ha"), (5, "hc")])
    _write_batch(spark, src, [(6, "hb"), (7, "hc"), (8, "hd")])
    got = {r["doc_id"]: (r["keep"], r["dup_of"], r["n_seen_before"])
           for r in _run(spark, src, "dd_out")}
    assert got == {
        1: (True, None, 0),          # first 'ha'
        2: (True, None, 0),          # first 'hb'
        3: (False, 1, 1),            # intra-batch dup
        4: (False, 1, 2),            # cross-batch dup, counter advances
        5: (True, None, 0),
        6: (False, 2, 1),
        7: (False, 5, 1),
        8: (True, None, 0),
    }


def test_stream_matches_batch_dedup_on_fixture(spark):
    """Streaming admissions over the documents fixture equal the batch
    first-occurrence rule (min doc_id per md5) when arrival order
    follows doc_id order (range-split files, processed in listing
    order) — the stream rule is earliest-BATCH-wins, so ordered
    arrival makes it coincide with the batch min-doc rule exactly."""
    import tempfile

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.md5("text").alias("content_hash")))
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        # 4 range-split files -> 4 micro-batches in doc_id order
        docs.repartitionByRange(4, F.col("doc_id")).write.parquet(src)
        got = _run(spark, src, "dd_fixture")
    kept_stream = sorted(r["doc_id"] for r in got if r["keep"])
    kept_batch = sorted(
        r["doc_id"] for r in
        docs.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
        .collect())
    assert kept_stream == kept_batch
    # every rejection points at the batch-canonical keeper
    canon = {r["content_hash"]: r["doc_id"] for r in
             docs.groupBy("content_hash")
             .agg(F.min("doc_id").alias("doc_id")).collect()}
    for r in got:
        if not r["keep"]:
            assert r["dup_of"] == canon[r["content_hash"]]
