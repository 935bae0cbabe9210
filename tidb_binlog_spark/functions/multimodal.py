"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions via mapInPandas.

Design for image/audio/video at 100 TB:
- the payload is an opaque BinaryType column (never parsed by Catalyst);
- decode / feature-extract / resize / frame-sample run as mapInPandas
  over Arrow batches — Python touches each batch once, vectorized;
- partitioning is by payload size bucket so batches stay memory-bounded
  (a 4 KB thumbnail and a 4 GB video never share a task's batch budget).

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so
``decode_stub`` produces a deterministic fake "decode" (documented
below) behind the same schema/batching as a real decoder would use —
the Spark-side plumbing (schema, UDF signature, batch shape) is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("header_hex", T.StringType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("fake_width", T.LongType()),
    T.StructField("fake_height", T.LongType()),
])


def as_binary_payload(docs: DataFrame) -> DataFrame:
    """Model an opaque media blob: the document text bytes stand in for
    an image/audio payload (BinaryType), with doc_id as the asset key."""
    from .text import spread
    return spread(docs).select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "header_hex": payloads.map(lambda b: bytes(b)[:4].hex().upper()),
            "content_md5": payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()),
            # STUB DECODE: a real implementation would parse the codec
            # header; we derive fake dimensions deterministically from
            # the byte length so tests are stable.
            "fake_width": (n_bytes % 640 + 1).astype("int64"),
            "fake_height": (n_bytes % 480 + 1).astype("int64"),
        })
        yield out


def decode_stub(docs: DataFrame) -> DataFrame:
    """'Decode' each payload to typed metadata via mapInPandas.

    Real pipelines swap _decode_batch's body for PIL/soundfile/ffmpeg
    calls; everything around it (Arrow batches, schema, ordering
    independence) is production-shaped.
    """
    payloads = as_binary_payload(docs)
    return payloads.mapInPandas(_decode_batch, schema=DECODE_META_SCHEMA)


def frame_sample_stub(docs: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame" offset
    (a real video pipeline emits one row per sampled frame). Exercises
    the 1-to-N mapInPandas shape."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for off in range(0, n, every_n_bytes):
                    rows.append((int(doc_id), off,
                                 bytes(payload)[off:off + 8].hex().upper()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_offset", "frame_hex"])

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_hex", T.StringType()),
    ])
    return as_binary_payload(docs).mapInPandas(sample, schema=schema)
