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

from ..cache import managed_persist


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


def multitouch_attribution(events: DataFrame,
                           conversion_type: str = "purchase",
                           touch_type: str = "click",
                           window_ns: int = 6 * 3_600_000_000_000,
                           ts_col: str = "ts",
                           id_col: str = "event_id",
                           user_col: str = "user_id") -> DataFrame:
    """Linear multi-touch attribution: every ``touch_type`` event in
    the ``window_ns`` before a conversion shares the conversion's
    credit equally, in exact integer ppm (floor split; the LAST touch
    absorbs the remainder so credits per conversion always sum to
    exactly 1,000,000). The single-touch as-of join
    (events_asof_attribution) is the last-touch special case; this is
    the model marketing/ads pipelines actually reconcile against.

    Scale shape: one equi-join keyed on the user (co-partitioned;
    per-user touch density bounds the fan-out) with the time-range
    predicate applied inside the join, then one rank window per
    conversion over already-joined rows. At 100 TB the user key is
    high-cardinality and uniform — for pathological single-user
    streams the bucketed interval join (operators/rangejoin.py) is
    the drop-in replacement. All credit arithmetic is BIGINT.
    """
    from pyspark.sql import Window
    conv = (events.filter(F.col("event_type") == conversion_type)
            .select(F.col(user_col).alias("user_id"),
                    F.col(id_col).alias("conversion_id"),
                    F.col(ts_col).alias("conv_ts")))
    touch = (events.filter(F.col("event_type") == touch_type)
             .select(F.col(user_col).alias("user_id"),
                     F.col(id_col).alias("touch_id"),
                     F.col(ts_col).alias("touch_ts")))
    joined = (conv.join(touch, "user_id")
              .filter((F.col("touch_ts") < F.col("conv_ts"))
                      & (F.col("touch_ts") >= F.col("conv_ts")
                         - F.lit(window_ns))))
    w = (Window.partitionBy("user_id", "conversion_id")
         .orderBy(F.asc("touch_ts"), F.asc("touch_id")))
    ranked = (joined
              .withColumn("touch_rank", F.row_number().over(w))
              .withColumn("n_touches",
                          F.count(F.lit(1)).over(
                              Window.partitionBy("user_id",
                                                 "conversion_id"))))
    return ranked.withColumn(
        "credit_ppm",
        F.expr("1000000 DIV n_touches + IF(touch_rank = n_touches, "
               "1000000 % n_touches, 0)")) \
        .select("user_id", "conversion_id", "conv_ts", "touch_id",
                "touch_rank", "n_touches", "credit_ppm")


def markov_attribution(events: DataFrame,
                       conversion_type: str = "purchase",
                       iters: int = 4,
                       ts_col: str = "ts",
                       id_col: str = "event_id",
                       user_col: str = "user_id") -> DataFrame:
    """Markov removal-effect attribution — the principled sibling of
    the linear split (multitouch_attribution): build the first-order
    journey chain (START -> event types -> CONV/NULL, each user's
    sequence truncated at their first conversion), compute the
    ``iters``-step conversion probability from START, then re-compute
    it with each channel's outgoing transitions removed (paths through
    the channel die, the standard removal effect). A channel's credit
    is the conversion probability it would take with it.

    Everything is exact integer arithmetic: transition probabilities
    are floor-ppm, each value iteration divides ONCE after the BIGINT
    dot product, and the report carries full/removed/drop ppm plus
    the normalized share. Fixed ``iters`` (like the PageRank
    operator) keeps the computation a finite, engine-exact formula.

    Scale shape: the distributed work is ONE user-partitioned window
    chain (rank + first-conversion + lead share the same shuffle) and
    one (src,dst) count aggregate. The |states|^2 transition matrix
    is bounded bookkeeping (like the k-means centroid collect) — the
    removal-effect recursion runs on it driver-side in exact ints,
    never shuffling anything again.
    """
    from pyspark.sql import Window
    CONV, NULLS, START = "CONV", "NULL", "START"
    w = Window.partitionBy("u").orderBy("t", "i")
    wu = Window.partitionBy("u")
    e = (events.select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("t"),
                       F.col(id_col).alias("i"),
                       F.col("event_type").alias("typ"))
         .withColumn("rn", F.row_number().over(w))
         .withColumn("conv_rn",
                     F.min(F.when(F.col("typ") == conversion_type,
                                  F.col("rn"))).over(wu)))
    kept = (e.filter(F.col("conv_rn").isNull()
                     | (F.col("rn") <= F.col("conv_rn")))
            .withColumn("state",
                        F.when(F.col("typ") == conversion_type,
                               F.lit(CONV)).otherwise(F.col("typ"))))
    w2 = Window.partitionBy("u").orderBy("rn")
    seq = kept.withColumn("nxt", F.lead("state").over(w2))
    body = (seq.select(
        F.col("state").alias("src"),
        F.coalesce("nxt",
                   F.when(F.col("state") != CONV, F.lit(NULLS)))
         .alias("dst"))
        .filter(F.col("dst").isNotNull()))
    starts = (seq.filter(F.col("rn") == 1)
              .select(F.lit(START).alias("src"),
                      F.col("state").alias("dst")))
    trans = (body.unionByName(starts)
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("cnt")))

    # bounded bookkeeping collect: |states|^2 rows
    rows = trans.collect()
    out: dict[str, int] = {}
    for r in rows:
        out[r["src"]] = out.get(r["src"], 0) + r["cnt"]
    p = {(r["src"], r["dst"]): r["cnt"] * 1_000_000 // out[r["src"]]
         for r in rows}
    channels = sorted({s for s, _ in p if s not in (START, CONV)})

    def conv_prob(removed: str | None) -> int:
        v = {CONV: 1_000_000}
        for _ in range(iters):
            acc: dict[str, int] = {}
            for (s, d), pp in p.items():
                if s == removed:
                    continue
                acc[s] = acc.get(s, 0) + pp * v.get(d, 0)
            v = {s: val // 1_000_000 for s, val in acc.items()
                 if s != CONV}
            v[CONV] = 1_000_000
        return v.get(START, 0)

    full = conv_prob(None)
    per = [(c, full, conv_prob(c)) for c in channels]
    total_drop = sum(full - rc for _, _, rc in per)
    data = [(c, full, rc, full - rc,
             ((full - rc) * 1_000_000 // total_drop
              if total_drop > 0 else None))
            for c, full, rc in per]
    from ..localrel import local_df
    return local_df(
        events.sparkSession,
        data, "channel string, full_ppm bigint, removed_ppm bigint, "
              "drop_ppm bigint, share_ppm bigint")


def conversion_latency(events: DataFrame, steps: list[str],
                       window: int | None = None,
                       user_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """Time-to-convert distribution per funnel transition: for every
    user who reached step i, the latency t_i - t_{i-1} of the greedy
    funnel times, summarized as nearest-rank p50/p90 plus min/max —
    the report that turns a funnel's WHERE into its WHEN (which hop
    loses the user for hours).

    Exact integer nearest-rank (the (pct*n + 99) div 100 form); rank
    windows run per transition over USER-level rows (one per
    converted user), never raw events.
    """
    from pyspark.sql import Window
    fo = funnel(events, steps, user_col=user_col, ts_col=ts_col,
                window=window)
    parts = None
    for i in range(1, len(steps)):
        p = (fo.filter(F.col(f"t{i}").isNotNull())
             .select(F.lit(i).alias("step"),
                     F.lit(f"{steps[i - 1]}->{steps[i]}")
                      .alias("transition"),
                     F.col(user_col).alias("u"),
                     (F.col(f"t{i}") - F.col(f"t{i - 1}"))
                      .alias("lat")))
        parts = p if parts is None else parts.unionByName(p)
    w = Window.partitionBy("step").orderBy("lat", "u")
    ranked = (parts.withColumn("rk", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("step"))))

    def nearest(pct: int, name: str):
        return F.max(F.when(
            F.col("rk") == F.expr(f"({pct} * n + 99) div 100"),
            F.col("lat"))).alias(name)

    return (ranked.groupBy("step", "transition")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.min("lat").alias("min_ns"),
                 nearest(50, "p50_ns"),
                 nearest(90, "p90_ns"),
                 F.max("lat").alias("max_ns")))
