"""Stateful streaming exact deduplication — the batch ``dedup_exact``
first-occurrence rule as an ``applyInPandasWithState`` operator
(same harness as streaming/sessionize_stream and pc_match_stream):
an ingest stream where every document is admitted or rejected the
moment it arrives, instead of waiting for a batch dedup pass.

Semantics (identical to batch first-occurrence dedup for in-order
input):
- documents group by content hash; the FIRST document carrying a
  hash (lowest doc_id within its micro-batch, earliest batch wins
  across batches) is emitted with ``keep = true``;
- every later carrier — same batch or any later batch — is emitted
  with ``keep = false`` and ``dup_of`` pointing at the kept doc;
- state per distinct hash is ONE small row (kept doc_id + running
  duplicate count), never document content.

Scale honesty: state grows with #distinct hashes, which for a crawl
corpus is corpus-sized. That is the real cost of *streaming* admission
(RocksDB state store territory); when a pipeline can tolerate batch
latency, the right tool is the bounded ``dedup.incremental_dedup``
anti-join against a persisted index (functions/dedup.py) — this
operator exists for the admission-control shape, mirroring how the
reference keeps per-key sorter state only for in-flight work
(pump/storage/sorter.go keeps P-binlogs pending until their C arrives).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("content_hash", T.StringType()),
])

DECISION_SCHEMA = T.StructType([
    T.StructField("content_hash", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("keep", T.BooleanType()),
    T.StructField("dup_of", T.LongType()),
    T.StructField("n_seen_before", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("kept_doc", T.LongType()),
    T.StructField("n_dupes", T.LongType()),
])


def _fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
          state: GroupState) -> Iterator[pd.DataFrame]:
    content_hash = key[0]
    kept = None
    n_dupes = 0
    if state.exists:
        kept, n_dupes = state.get
    out = []
    for pdf in pdfs:
        # lowest doc_id first within the batch — deterministic winner
        # however the micro-batch splits
        pdf = pdf.sort_values("doc_id")
        for row in pdf.itertuples(index=False):
            doc_id = int(row.doc_id)
            if kept is None:
                kept = doc_id
                out.append({"content_hash": content_hash,
                            "doc_id": doc_id, "keep": True,
                            "dup_of": None, "n_seen_before": 0})
            else:
                n_dupes += 1
                out.append({"content_hash": content_hash,
                            "doc_id": doc_id, "keep": False,
                            "dup_of": kept,
                            "n_seen_before": n_dupes})
    if out:
        yield pd.DataFrame(out)
    if kept is not None:
        state.update((kept, n_dupes))


def dedup_stream(docs: DataFrame) -> DataFrame:
    """docs: streaming DataFrame with DOC_SCHEMA columns (hash
    computed upstream — e.g. ``F.md5("text")`` — so state and shuffle
    never carry content). Returns one admission decision per incoming
    document (append mode)."""
    return (docs
            .groupBy("content_hash")
            .applyInPandasWithState(
                _fold,
                outputStructType=DECISION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
