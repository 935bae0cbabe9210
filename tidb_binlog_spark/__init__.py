"""PySpark-native CDC / change-stream analytics engine.

A brand-new engine with the query and data-processing capabilities of
pingcap/tidb-binlog (see SURVEY.md), re-expressed Spark-first:

- change events are a normalized DataFrame (the ``loader.DML`` model,
  reference pkg/loader/model.go:49-115);
- ordering / merge / compaction / causality / filtering / routing are
  DataFrame operators (Catalyst-optimized, no driver loops);
- sinks are foreachBatch appliers with idempotent MERGE semantics;
- beyond the reference surface: large-scale training-data pipeline
  operators (dedup, similarity search, text analysis, multimodal).
"""

__version__ = "0.1.0"
