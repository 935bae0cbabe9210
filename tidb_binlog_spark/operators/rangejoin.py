"""Point-in-interval (range) join — for each point, the intervals of
the same key containing it.

Spark's native encoding of ``s <= p AND p <= e`` is a broadcast
nested-loop or cartesian join — quadratic per key. The scale path is
the classic bucketing trick:

1. explode each interval into the fixed-width buckets it covers
   (``floor(s/W) .. floor(e/W)`` — bounded by interval length / W);
2. equi-join points on (key, floor(p/W)) — an ordinary hash-shuffle
   join;
3. refine with the exact ``s <= p <= e`` filter.

Every point carries exactly ONE bucket, so the refine step never
deduplicates — each (point, interval) pair is produced at most once.
Join traffic is |points| + sum(interval_len/W), tunable by W against
the interval-length distribution (W ~ median interval length keeps
the explode factor ~2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           on: list[str], point_ts: str,
                           start_col: str, end_col: str,
                           bucket_width: int,
                           how: str = "inner") -> DataFrame:
    """Join each point row to every interval row (same ``on`` key)
    with ``start_col <= point_ts <= end_col``. ``how='left'`` keeps
    unmatched points with NULL interval columns (built as inner +
    anti-join union, so the bucketed path stays an equi-join)."""
    b = (intervals.withColumn(
        "_buckets", F.expr(
            f"sequence(CAST(floor({start_col} / {bucket_width}) AS LONG), "
            f"CAST(floor({end_col} / {bucket_width}) AS LONG))"))
        .withColumn("_b", F.explode("_buckets")).drop("_buckets"))
    p = points.withColumn(
        "_b", F.expr(f"CAST(floor({point_ts} / {bucket_width}) AS LONG)"))
    joined = (p.join(b, on + ["_b"])
              .filter((F.col(start_col) <= F.col(point_ts))
                      & (F.col(point_ts) <= F.col(end_col)))
              .drop("_b"))
    if how == "inner":
        return joined
    if how != "left":
        raise ValueError(f"unsupported how: {how!r}")
    interval_cols = [c for c in intervals.columns if c not in on]
    unmatched = (points.join(joined.select(*points.columns),
                             points.columns, "left_anti"))
    for c in interval_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return joined.unionByName(unmatched)
