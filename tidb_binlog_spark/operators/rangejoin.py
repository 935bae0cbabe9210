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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           on: list[str], point_ts: str,
                           start_col: str, end_col: str,
                           bucket_width: int,
                           how: str = "inner") -> DataFrame:
    """Join each point row to every interval row (same ``on`` key)
    with ``start_col <= point_ts <= end_col``. ``how='left'`` keeps
    unmatched points with NULL interval columns.

    Left mode is ONE pass: a left bucket join tags each candidate row
    with the exact-range verdict, then a per-point window keeps the
    matched rows — or, for points with no match at all, exactly one
    representative row with the interval columns nulled. (An
    anti-join on the point columns would evaluate the join twice AND
    mis-classify points carrying NULLs in non-join columns, since
    anti-join equality is null-unsafe.)"""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r}")
    b = (intervals.withColumn(
        "_buckets", F.expr(
            f"sequence(CAST(floor({start_col} / {bucket_width}) AS LONG), "
            f"CAST(floor({end_col} / {bucket_width}) AS LONG))"))
        .withColumn("_b", F.explode("_buckets")).drop("_buckets"))
    p = points.withColumn(
        "_b", F.expr(f"CAST(floor({point_ts} / {bucket_width}) AS LONG)"))
    ok = ((F.col(start_col).isNotNull())
          & (F.col(start_col) <= F.col(point_ts))
          & (F.col(point_ts) <= F.col(end_col)))
    if how == "inner":
        return (p.join(b, on + ["_b"]).filter(ok).drop("_b"))
    p = p.withColumn("_rid", F.monotonically_increasing_id())
    j = (p.join(b, on + ["_b"], "left").withColumn("_ok", ok))
    w = Window.partitionBy("_rid")
    w_pick = Window.partitionBy("_rid").orderBy(F.desc("_ok"))
    out = (j.withColumn("_any", F.max(F.col("_ok").cast("int")).over(w))
           .withColumn("_rn", F.row_number().over(w_pick))
           .filter(F.col("_ok")
                   | ((F.col("_any") == 0) & (F.col("_rn") == 1))))
    # a refine-failed candidate chosen as the unmatched representative
    # must not leak its interval values
    for c in [c for c in intervals.columns if c not in on]:
        out = out.withColumn(c, F.when(F.col("_ok"), F.col(c)))
    return out.drop("_b", "_rid", "_ok", "_any", "_rn")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          on: list[str],
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bucket_width: int,
                          how: str = "inner") -> DataFrame:
    """Interval x interval overlap join (closed intervals, same key):
    all (left, right) pairs with ``l_start <= r_end AND r_start <=
    l_end``. Non-key column names must be disjoint across the sides.

    Both sides explode into covered buckets and equi-join on
    (key, bucket); a pair overlapping across k shared buckets would
    surface k times, so matches are confined to the pair's CANONICAL
    bucket — max of the two start buckets. Overlap guarantees both
    sides cover that bucket (the later-starting side starts in it,
    the earlier side must reach past the later start), so every
    overlapping pair is produced exactly once and the refine step
    never deduplicates — no distinct, no post-join shuffle.

    ``how='left'`` keeps unmatched left intervals with the right
    columns nulled (same one-pass window technique as
    point_in_interval_join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r}")

    def burst(df: DataFrame, s: str, e: str) -> DataFrame:
        return (df.withColumn(
            "_buckets", F.expr(
                f"sequence(CAST(floor({s} / {bucket_width}) AS LONG), "
                f"CAST(floor({e} / {bucket_width}) AS LONG))"))
            .withColumn("_b", F.explode("_buckets")).drop("_buckets"))

    lb, rb = burst(left, l_start, l_end), burst(right, r_start, r_end)
    canon = F.greatest(
        F.expr(f"CAST(floor({l_start} / {bucket_width}) AS LONG)"),
        F.expr(f"CAST(floor({r_start} / {bucket_width}) AS LONG)"))
    ok = ((F.col(r_start).isNotNull())
          & (F.col(l_start) <= F.col(r_end))
          & (F.col(r_start) <= F.col(l_end))
          & (F.col("_b") == canon))
    if how == "inner":
        return lb.join(rb, on + ["_b"]).filter(ok).drop("_b")
    # _rid BEFORE the explode: the match/representative window must
    # span ALL of a left interval's bucket rows, or a matched interval
    # would also surface spurious "unmatched" rows from its other
    # buckets (and an unmatched one would surface once per bucket).
    lb = burst(left.withColumn("_rid", F.monotonically_increasing_id()),
               l_start, l_end)
    j = lb.join(rb, on + ["_b"], "left").withColumn("_ok", ok)
    w = Window.partitionBy("_rid")
    w_pick = Window.partitionBy("_rid").orderBy(F.desc("_ok"))
    out = (j.withColumn("_any", F.max(F.col("_ok").cast("int")).over(w))
           .withColumn("_rn", F.row_number().over(w_pick))
           .filter(F.col("_ok")
                   | ((F.col("_any") == 0) & (F.col("_rn") == 1))))
    for c in [c for c in right.columns if c not in on]:
        out = out.withColumn(c, F.when(F.col("_ok"), F.col(c)))
    return out.drop("_b", "_rid", "_ok", "_any", "_rn")
