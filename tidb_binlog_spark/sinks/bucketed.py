"""Bucketed storage for co-located joins and shuffle-free reapply.

The reference keeps per-PK work co-located by construction (one
loader executor owns a causality group, pkg/loader/load.go:136-147).
The Spark-native equivalent at rest is HASH BUCKETING: persist the
change log and the snapshot bucketed (and sorted) by the PK columns,
and every downstream per-PK operation — snapshot apply, wide-row
merge, history diff, incremental re-apply — reads both sides already
partitioned on the join key. Catalyst then plans SortMergeJoin /
HashAggregate with NO Exchange on either side: at 100 TB that deletes
the dominant all-to-all shuffle from every apply cycle, and the
bucket count (not the data size) bounds task fan-in.

Bucket-count discipline: both sides of a co-located join must use the
SAME bucket count and key order; pick n_buckets ~ cluster cores x a
small factor and keep it stable across snapshots so incremental
applies stay aligned round over round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int = 32,
                   sort_keys: list[str] | None = None,
                   mode: str = "overwrite",
                   path: str | None = None) -> None:
    """Persist ``df`` as a session-catalog parquet table hash-bucketed
    by ``keys`` (sorted within each bucket by ``sort_keys``, default
    the bucket keys — pre-sorting lets the merge-join side skip its
    sort when a bucket maps to one file). ``path`` makes it an
    external table at that location instead of the warehouse dir."""
    w = (df.write.mode(mode)
         .bucketBy(n_buckets, keys[0], *keys[1:])
         .sortBy(*(sort_keys or keys))
         .format("parquet"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table. The bucketing metadata rides the
    catalog entry, so the scan reports outputPartitioning =
    HashPartitioning(keys, n) and joins/aggregates on the bucket keys
    plan with no Exchange."""
    return spark.table(table)
