"""Funnel analysis — per user, the earliest ordered completion of a
step sequence (view -> click -> purchase ...), optionally within a
conversion window of the first step.

Semantics are the standard greedy funnel used by analytics engines:
t0 = earliest step-0 event; t_i = earliest step-i event AFTER
t_{i-1} (and within ``window`` of t0 when given). Each level is one
min-aggregate plus one equi-join keyed on the user — k-1 joins for a
k-step funnel, all co-partitioned on the user key, no window
functions over raw events and nothing quadratic. A user appears iff
they reached step 0; unreached deeper steps are NULL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           window: int | None = None) -> DataFrame:
    """Per-user funnel times: (user, t0..t{k-1}, max_stage).
    ``window`` bounds every later step to ``t_i - t0 <= window``
    (same time unit as ``ts_col``)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    levels = [events.filter(F.col(type_col) == steps[0])
              .groupBy(user_col).agg(F.min(ts_col).alias("t0"))]
    for i in range(1, len(steps)):
        prev = levels[-1]
        cand = (events.filter(F.col(type_col) == steps[i])
                .select(user_col, F.col(ts_col).alias("_ts"))
                .join(prev, user_col)
                .filter(F.col("_ts") > F.col(f"t{i - 1}")))
        if window is not None:
            cand = cand.filter(F.col("_ts") - F.col("t0") <= window)
        levels.append(cand.groupBy(user_col).agg(
            *[F.first(f"t{j}").alias(f"t{j}") for j in range(i)],
            F.min("_ts").alias(f"t{i}")))
    out = reduce(
        lambda acc, lv: acc.join(lv[1].select(user_col, f"t{lv[0]}"),
                                 user_col, "left"),
        enumerate(levels[1:], 1), levels[0])
    stage = reduce(lambda a, i: a + F.col(f"t{i}").isNotNull().cast("int"),
                   range(1, len(steps)), F.lit(1))
    return out.withColumn("max_stage", stage)
