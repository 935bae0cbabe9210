"""Time-series analytics over an event stream: rolling time-window
aggregates and cohort retention.

Neither exists in the reference (it is a CDC pipeline), but both are
the bread-and-butter reads a replica fed by that pipeline serves;
they round out the analytics surface next to funnel / sessionize /
as-of.

Spark-first notes:
- ``rolling_window`` is ONE range-frame window — a single shuffle
  keyed on the entity, no self-join, no point-in-interval explode.
  Spark evaluates the sliding frame with a per-partition two-pointer
  sweep, so cost is O(rows) after the sort, independent of window
  width. Sums use the DECIMAL(38,6) accumulate / DOUBLE surface
  pattern so results are bit-stable across engines and partitionings.
- ``cohort_retention`` reduces events to distinct (user, period)
  pairs BEFORE joining cohorts — the join and final aggregate run on
  |users| x |active periods|, not |events|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_window(df: DataFrame, keys: list[str], ts_col: str,
                   window_ns: int, value_col: str | None = None,
                   ) -> DataFrame:
    """Per row: count (``n_window``) and optional exact value sum
    (``sum_window``) of the key's rows in the closed time range
    ``[ts - window_ns, ts]``."""
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(ts_col).cast("long"))
         .rangeBetween(-window_ns, 0))
    out = df.withColumn("n_window", F.count(F.lit(1)).over(w))
    if value_col is not None:
        out = out.withColumn(
            "sum_window",
            F.sum(F.col(value_col).cast("decimal(38,6)")).over(w)
             .cast("double"))
    return out


def cohort_retention(events: DataFrame, user_col: str, ts_col: str,
                     period_ns: int,
                     cohort_pred: Column | None = None) -> DataFrame:
    """Retention matrix: users bucketed by the period of their first
    qualifying event (``cohort_pred``, e.g. the signup; all events
    when None), counted once per later active period.

    Returns (cohort_period, period_offset, n_users): of the users
    whose first qualifying event fell in ``cohort_period``, how many
    touched the product ``period_offset`` periods later. Offset 0 is
    the cohort size (every cohort user is active in their own first
    period only if they have an event there — with cohort_pred=None
    that is all of them; with a predicate, pre-signup activity is
    excluded so offset 0 still counts exactly the cohort).
    """
    # exact integer division (SQL `div`): epoch-nanos exceed DOUBLE's
    # 53-bit mantissa, so floor(ts / period) computed through a float
    # quotient can land one period off near a boundary
    src = events.filter(cohort_pred) if cohort_pred is not None else events
    first = (src.groupBy(user_col)
             .agg(F.min(ts_col).alias("_t0"))
             .withColumn("cohort_period",
                         F.expr(f"_t0 div {period_ns}")).drop("_t0"))
    active = (events
              .select(user_col, F.col(ts_col).alias("_ts"))
              .withColumn("_p", F.expr(f"_ts div {period_ns}"))
              .drop("_ts")
              .distinct())
    return (active.join(first, user_col)
            .filter(F.col("_p") >= F.col("cohort_period"))
            .groupBy("cohort_period",
                     (F.col("_p") - F.col("cohort_period"))
                     .alias("period_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def rolling_anomaly(df: DataFrame, keys: list[str],
                    order_cols: list[str], value_col: str,
                    trailing_rows: int = 8,
                    z_threshold: int = 3) -> DataFrame:
    """Per-key rolling anomaly flags, ENGINE-EXACT: a row is anomalous
    when its value deviates from the trailing ``trailing_rows`` window
    mean by more than ``z_threshold`` sample deviations. The z-test is
    evaluated in squared integer form — values are milli-quantized to
    BIGINT once, then the comparison
        (n*x - sum)^2 > z^2 * (n*sumsq - sum^2)
    is pure BIGINT arithmetic (no sqrt, no float accumulation), so
    Spark and the DuckDB oracle agree bit-for-bit even on ties.

    Shape: ONE per-key rows-frame window (partitioned, never global);
    the trailing frame EXCLUDES the current row so a spike can't mask
    itself. Rows with fewer than 2 trailing samples or zero variance
    are never flagged (deviation from a constant history is flagged
    whenever x != mean).

    Overflow bound: |v_milli| <= ~2.9e6 at driver scales; with n <= 8,
    (n*x - sum)^2 <= (8 * 5.8e6)^2 ~= 2.2e15 << 2^63."""
    w = (Window.partitionBy(*keys)
         .orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(-trailing_rows, -1))
    v = F.expr(f"CAST(floor({value_col} * 1000) AS BIGINT)")
    out = (df
           .withColumn("v_milli", v)
           .withColumn("n_trail", F.count("v_milli").over(w))
           .withColumn("sum_trail", F.sum("v_milli").over(w))
           .withColumn("sumsq_trail",
                       F.sum(F.expr("v_milli * v_milli")).over(w)))
    dev = "(n_trail * v_milli - sum_trail)"
    var = "(n_trail * sumsq_trail - sum_trail * sum_trail)"
    flag = (f"n_trail >= 2 AND {dev} * {dev} "
            f"> {z_threshold * z_threshold} * {var}")
    return (out.withColumn("is_anomaly", F.expr(flag))
            .select(*keys, *order_cols,
                    "v_milli", "n_trail", "sum_trail", "sumsq_trail",
                    "is_anomaly"))


def ohlc_downsample(events: DataFrame, keys: list[str], ts_col: str,
                    value_col: str, bucket_ns: int,
                    order_cols: list[str] | None = None) -> DataFrame:
    """Per-(keys, time-bucket) OHLC downsample: open/high/low/close of
    ``value_col`` plus count and an exact DECIMAL volume sum — the
    standard telemetry/market downsampling read (Prometheus recording
    rules, candlestick feeds) that turns a raw event stream into a
    bounded per-bucket table.

    Spark-first shape: ONE shuffle keyed (keys, bucket). Open/close
    are first/last in deterministic (ts, tiebreak) order via two
    row_number windows over the SAME partitioning the aggregate uses,
    so Catalyst shares one Exchange across the windows and the final
    groupBy. High/low/count/volume are plain aggregates (map-side
    combinable). At 100 TB the bucket count is bounded by
    time-range/bucket_ns x |keys| — the output is small by
    construction, and no per-key total order ever exceeds one bucket.

    Determinism: ties on ts break by ``order_cols`` (default: the
    value column is NOT used — callers pass a unique event id);
    volume is SUM(DECIMAL(18,2)) surfaced as DOUBLE (engine-exact).
    """
    order_cols = order_cols or []
    bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_ns))
              ).alias("bucket_start")
    df = events.select(*keys, F.col(ts_col), value_col, *order_cols) \
               .withColumn("bucket_start", bucket)
    part = [*keys, "bucket_start"]
    asc = [F.asc(ts_col)] + [F.asc(c) for c in order_cols]
    desc = [F.desc(ts_col)] + [F.desc(c) for c in order_cols]
    w_a = Window.partitionBy(*part).orderBy(*asc)
    w_d = Window.partitionBy(*part).orderBy(*desc)
    flagged = (df.withColumn("_rn_a", F.row_number().over(w_a))
                 .withColumn("_rn_d", F.row_number().over(w_d)))
    return (flagged.groupBy(*part).agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col(value_col)))
         .alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(F.when(F.col("_rn_d") == 1, F.col(value_col)))
         .alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr(f"CAST(SUM(CAST({value_col} AS DECIMAL(18,2))) AS DOUBLE)")
         .alias("volume")))


def representative_points(events: DataFrame, keys: list[str],
                          ts_col: str, value_col: str, id_col: str,
                          bucket_ns: int) -> DataFrame:
    """Per-(keys, bucket) representative-point downsample: keep the
    single event deviating MOST from its bucket mean — the parallel
    stand-in for LTTB (which is inherently sequential across buckets)
    that preserves spikes where min/max/mean downsampling blurs them.

    Deviation is compared WITHOUT division: |n*v - sum(v)| in exact
    centi-integers (DECIMAL(18,2)*100), so selection is engine-exact
    and aggregation-order-invariant. One shuffle keyed (keys, bucket);
    the deviation windows and the final pick share that Exchange.
    """
    bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_ns))
              ).alias("bucket_start")
    centi = f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    df = (events.select(*keys, ts_col, value_col, id_col)
          .withColumn("bucket_start", bucket)
          .withColumn("_centi", F.expr(centi)))
    part = [*keys, "bucket_start"]
    wp = Window.partitionBy(*part)
    scored = (df.withColumn("_n", F.count(F.lit(1)).over(wp))
              .withColumn("_sum", F.sum("_centi").over(wp))
              .withColumn("dev_scaled",
                          F.expr("abs(_n * _centi - _sum)")))
    wr = Window.partitionBy(*part).orderBy(F.desc("dev_scaled"),
                                           F.asc(id_col))
    return (scored.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") == 1)
            .select(*part,
                    F.col("_n").alias("n_events"),
                    F.col(id_col).alias("rep_event_id"),
                    F.col(value_col).alias("rep_value"),
                    "dev_scaled"))


def decayed_topk(events: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", half_life_ns: int = 86_400_000_000_000,
                 max_halvings: int = 20, k: int = 20) -> DataFrame:
    """Exponentially time-decayed activity ranking — the "trending
    now" staple: each event contributes ``2^-(age/half_life)`` so
    yesterday counts half of today, and stale-but-huge keys cannot
    drown out what is hot right now.

    Engine-exact on purpose: age is an INTEGER number of elapsed
    half-lives (``(t_max - ts) div half_life``, capped at
    ``max_halvings``), so the weight is the exact integer
    ``1_000_000 >> age`` micro-units — no float pow, both engines
    agree bit-for-bit (the same quantized-decay trick the reference's
    metrics counters avoid needing only because they reset daily).

    Scale shape: t_max is a one-row aggregate broadcast back; the
    score is ONE key-grouped map-side-combinable SUM over events; the
    top-k is TakeOrderedAndProject with a deterministic (score desc,
    key) tiebreak. No windows over raw events, no global sort.
    """
    t_max = events.agg(F.max(ts_col).alias("t_max"))
    w = (events.crossJoin(F.broadcast(t_max))
         .withColumn("age", F.expr(
             f"least(CAST({max_halvings} AS BIGINT), "
             f"(t_max - {ts_col}) DIV {half_life_ns})"))
         .withColumn("w_micro", F.expr(
             "CAST(1000000 AS BIGINT) DIV "
             "shiftleft(CAST(1 AS BIGINT), CAST(age AS INT))")))
    scored = (w.groupBy(key_col)
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.when(F.col("age") == 0, 1).otherwise(0))
                    .cast("bigint").alias("n_recent"),
                   F.sum("w_micro").cast("bigint")
                    .alias("decayed_micro")))
    wr = Window.orderBy(F.desc("decayed_micro"), F.asc(key_col))
    return (scored.orderBy(F.desc("decayed_micro"), F.asc(key_col))
            .limit(k)
            .withColumn("rank", F.row_number().over(wr))
            .select("rank", key_col, "n_events", "n_recent",
                    "decayed_micro"))


def growth_accounting(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      week_ns: int = 7 * 86_400_000_000_000) -> DataFrame:
    """Weekly growth accounting — the new / retained / resurrected /
    churned decomposition every growth dashboard opens with: a user is
    *new* in their first active week, *retained* when active the week
    before, *resurrected* when returning after a gap, and *churned
    into* week w+1 when active in w but not w+1 (no churn row beyond
    the observed horizon). n_active = new + retained + resurrected by
    construction.

    Scale shape: raw events reduce to DISTINCT (user, week) first —
    every window after that runs on the reduced frame (one lag + one
    lead per user), and the report is two count aggregates joined on
    week. All-integer week ids, engine-exact.
    """
    uw = (events.select(F.col(user_col).alias("u"),
                        F.expr(f"{ts_col} DIV {week_ns}").alias("week"))
          .distinct())
    w = Window.partitionBy("u").orderBy("week")
    lab = (uw.withColumn("prev_w", F.lag("week").over(w))
           .withColumn("next_w", F.lead("week").over(w)))
    act = (lab.groupBy("week")
           .agg(F.count(F.when(F.col("prev_w").isNull(), 1))
                 .alias("n_new"),
                F.count(F.when(F.col("prev_w") == F.col("week") - 1, 1))
                 .alias("n_retained"),
                F.count(F.when(F.col("prev_w") < F.col("week") - 1, 1))
                 .alias("n_resurrected")))
    horizon = uw.agg(F.max("week").alias("max_week"))
    churn = (lab.crossJoin(F.broadcast(horizon))
             .filter((F.col("next_w").isNull()
                      | (F.col("next_w") > F.col("week") + 1))
                     & (F.col("week") + 1 <= F.col("max_week")))
             .select((F.col("week") + 1).alias("week"))
             .groupBy("week")
             .agg(F.count(F.lit(1)).alias("n_churned")))
    out = (act.join(churn, "week", "full_outer")
           .select("week",
                   F.coalesce("n_new", F.lit(0)).alias("n_new"),
                   F.coalesce("n_retained", F.lit(0))
                    .alias("n_retained"),
                   F.coalesce("n_resurrected", F.lit(0))
                    .alias("n_resurrected"),
                   F.coalesce("n_churned", F.lit(0))
                    .alias("n_churned")))
    return out.withColumn(
        "n_active",
        F.expr("n_new + n_retained + n_resurrected"))


def seasonal_residuals(events: DataFrame, ts_col: str = "ts",
                       day_ns: int = 86_400_000_000_000,
                       hour_ns: int = 3_600_000_000_000) -> DataFrame:
    """Seasonal-naive anomaly flags: each (day, hour) cell's event
    count is compared against the mean of its OWN weekly seasonal slot
    (same weekday + hour across all observed days) — the baseline that
    doesn't fire every Monday morning the way a flat rolling mean
    does. Flags are exact cross-multiplied integer comparisons
    (n * n_days vs 2x / 0.5x slot_total): no float division, so the
    flag is engine-exact.

    Slots with no events on a given day contribute no cell row (the
    baseline mean is over OBSERVED days — documented semantics; a
    calendar fill would impute zeros).

    Scale: one (day,dow,hour) count aggregate (map-side combinable),
    one 168-rows-max slot rollup broadcast back. Raw events are never
    windowed or sorted.
    """
    e = events.select(
        F.expr(f"{ts_col} DIV {day_ns}").alias("day"),
        F.expr(f"({ts_col} DIV {day_ns}) % 7").alias("dow"),
        F.expr(f"({ts_col} % {day_ns}) DIV {hour_ns}").alias("hour"))
    cell = (e.groupBy("day", "dow", "hour")
            .agg(F.count(F.lit(1)).alias("n")))
    slot = (cell.groupBy("dow", "hour")
            .agg(F.sum("n").cast("bigint").alias("slot_total"),
                 F.count(F.lit(1)).alias("n_days")))
    return (cell.join(F.broadcast(slot), ["dow", "hour"])
            .select("day", "dow", "hour", "n", "n_days", "slot_total",
                    (F.expr("n * n_days") > F.expr("2 * slot_total"))
                     .alias("is_high"),
                    (F.expr("2 * n * n_days") < F.col("slot_total"))
                     .alias("is_low")))


def activity_gini(events: DataFrame,
                  user_col: str = "user_id") -> DataFrame:
    """Activity-concentration report: the Lorenz decile table plus the
    Gini coefficient of per-user event counts — the quantified answer
    to "how skewed is this workload" that sizes salting and AQE skew
    thresholds (cdc_hot_keys names the offenders; this measures the
    inequality itself).

    Exact integer arithmetic throughout: users are ranked ascending by
    count (deterministic (n, user) tiebreak), Gini comes from the
    rank-weighted sum formula G = (2*sum(rk*x) - (n+1)*sum(x)) /
    (n*sum(x)) in floor ppm, and decile cut points are integer
    ceil-division. Rank-weighted sums accumulate in DECIMAL(38,0) —
    at 100 TB rank*count products overflow BIGINT long before they
    trouble a 38-digit decimal.

    Scale: ranking runs over the COUNT-REDUCED per-user frame (one
    row per user, never raw events) AND is distributed — the global
    (n, user) rank comes from ordering.distributed_rank (range
    partitions + broadcast offset carry), never a single-task
    unpartitioned window, so 10^9 users rank in parallel; the decile
    rollup is 10 rows.
    """
    from ..cache import managed_persist
    from .ordering import distributed_rank
    # persisted BEFORE ranking: repartitionByRange's boundary sampler
    # executes its child once to sample and again to shuffle — over
    # the raw-events aggregate that would be two full source passes
    per_user = managed_persist(
        events.groupBy(user_col).agg(F.count(F.lit(1)).alias("n")))
    ranked = distributed_rank(per_user, ["n", user_col], "rk")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(rk AS DECIMAL(38,0)) * n"))
         .cast("decimal(38,0)").alias("s1"))
    gini = tot.select(
        "n_users",
        F.expr("CAST(((2 * s1 - (n_users + 1) * s) * 1000000) "
               "DIV (n_users * s) AS BIGINT)").alias("gini_ppm"),
        F.col("s").cast("bigint").alias("total_events"))
    dec = (ranked.crossJoin(F.broadcast(gini.select(
               F.col("n_users").alias("nu"))))
           .withColumn("decile",
                       F.expr("(10 * rk + nu - 1) DIV nu"))
           .groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n_users_decile"),
                F.sum("n").cast("bigint").alias("n_events")))
    # Lorenz cumulative as a triangular broadcast self-join over the
    # 10-row decile frame — no unpartitioned window anywhere in the
    # plan (the rank above is distributed_rank; this keeps the whole
    # query free of single-task window stages).
    lower = dec.select(F.col("decile").alias("_d2"),
                       F.col("n_events").alias("_ne2"))
    out = (dec.join(F.broadcast(lower), F.col("_d2") <= F.col("decile"))
           .groupBy("decile", "n_users_decile", "n_events")
           .agg(F.sum("_ne2").cast("bigint").alias("cum_events"))
           .crossJoin(F.broadcast(gini)))
    return (out.withColumn(
                "cum_events_ppm",
                F.expr("(cum_events * 1000000) DIV total_events"))
            .select("decile", "n_users_decile", "n_events",
                    "cum_events_ppm", "gini_ppm"))


def holt_forecast(events: DataFrame, key_col: str = "event_type",
                  ts_col: str = "ts",
                  window_ns: int = 6 * 3_600_000_000_000,
                  horizon: int = 3) -> DataFrame:
    """Holt linear-trend forecast per series (event-type window
    counts): level/trend double-exponential smoothing with
    alpha = beta = 1/2, so every update is an integer halving and the
    whole recursion is exact — both engines fold the same sequence to
    the same milli-quantized state, and the h-step forecasts
    (level + h*trend, clamped at 0) are engine-exact numbers, not
    approximations. Halving uses explicit TRUNCATING division (Spark
    DIV truncates toward zero, DuckDB // floors — sign-split keeps
    negative trends identical on both).

    Empty windows are skipped, not zero-filled (the fold runs over
    observed windows in order — documented semantics).

    Scale: one (key, window) count aggregate, then a per-key
    sort_array + sequential fold over the BOUNDED window-count array
    (#windows per key, not #events). The fold is the standard
    sequential-scan shape for order-dependent recursions.
    """
    tdiv2 = "IF({v} >= 0, ({v}) DIV 2, -((-({v})) DIV 2))"
    cnt = (events.select(F.col(key_col).alias("k"),
                         F.expr(f"{ts_col} DIV {window_ns}")
                          .alias("win"))
           .groupBy("k", "win")
           .agg(F.count(F.lit(1)).alias("x")))
    arr = (cnt.groupBy("k")
           .agg(F.count(F.lit(1)).alias("n_windows"),
                F.expr("sort_array(collect_list(struct(win, x)))")
                 .alias("xs")))
    lp = tdiv2.format(v="e.l + acc.l + acc.b")
    bp = tdiv2.format(v=f"(({lp}) - acc.l) + acc.b")
    fold = f"""aggregate(
        transform(xs, e -> named_struct(
            'l', CAST(e.x * 1000 AS BIGINT),
            'b', CAST(0 AS BIGINT), 's', true)),
        named_struct('l', CAST(0 AS BIGINT),
                     'b', CAST(0 AS BIGINT), 's', false),
        (acc, e) -> IF(NOT acc.s,
            named_struct('l', e.l, 'b', CAST(0 AS BIGINT),
                         's', true),
            named_struct('l', CAST({lp} AS BIGINT),
                         'b', CAST({bp} AS BIGINT), 's', true)),
        acc -> acc)"""
    st = arr.withColumn("st", F.expr(fold))
    out = st.select(
        F.col("k").alias(key_col), "n_windows",
        F.col("st.l").alias("level_milli"),
        F.col("st.b").alias("trend_milli"))
    for h in range(1, horizon + 1):
        out = out.withColumn(
            f"f{h}_milli",
            F.expr(f"greatest(CAST(0 AS BIGINT), "
                   f"level_milli + {h} * trend_milli)"))
    return out


def peak_concurrency(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     gap_ns: int = 30 * 60 * 1_000_000_000,
                     day_ns: int = 86_400_000_000_000) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning curve
    (how many users were on AT ONCE, not how many were active that
    day). Sessions are the standard 30-min-gap sessionization; a
    session is concurrent with time t when s_start <= t <= s_end, and
    boundary ties count the arriving session (at a shared timestamp,
    +1s apply before -1s).

    Two-phase prefix sums (the sequence-packing pattern), NOT a
    global running sort: boundary deltas aggregate per (day, ts),
    each day computes its own running sum, and a tiny per-day ledger
    carries the open-session count across midnight. The only
    unpartitioned window runs over the #days frame.
    """
    w = Window.partitionBy("u").orderBy("t", "i")
    e = events.select(F.col(user_col).alias("u"),
                      F.col(ts_col).alias("t"),
                      F.col(id_col).alias("i"))
    flagged = e.withColumn(
        "new_s",
        F.when(F.lag("t").over(w).isNull()
               | ((F.col("t") - F.lag("t").over(w)) > gap_ns), 1)
        .otherwise(0))
    numbered = flagged.withColumn(
        "s_no", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    sess = (numbered.groupBy("u", "s_no")
            .agg(F.min("t").alias("s_start"),
                 F.max("t").alias("s_end")))
    bounds = (sess.select(F.col("s_start").alias("ts"),
                          F.lit(1).alias("delta"))
              .unionByName(
                  sess.select((F.col("s_end") + 1).alias("ts"),
                              F.lit(-1).alias("delta"))))
    g = (bounds.withColumn("day", F.expr(f"ts DIV {day_ns}"))
         .groupBy("day", "ts")
         .agg(F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
               .cast("bigint").alias("n_plus"),
              F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
               .cast("bigint").alias("n_minus")))
    wd = Window.partitionBy("day").orderBy("ts")
    g = (g.withColumn("net", F.col("n_plus") - F.col("n_minus"))
         .withColumn("run_end", F.sum("net").over(
             wd.rowsBetween(Window.unboundedPreceding, 0)))
         # concurrency peak candidate at ts: after this instant's
         # arrivals, before its departures
         .withColumn("cand",
                     F.col("run_end") - F.col("net")
                     + F.col("n_plus")))
    days = (g.groupBy("day")
            .agg(F.sum("net").cast("bigint").alias("day_net"),
                 F.max("cand").alias("max_cand"),
                 F.count(F.lit(1)).alias("n_boundary_ts")))
    wdd = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1)
    return (days.withColumn(
                "carry_in",
                F.coalesce(F.sum("day_net").over(wdd), F.lit(0))
                 .cast("bigint"))
            .select("day", "n_boundary_ts", "carry_in",
                    (F.col("carry_in") + F.col("max_cand"))
                    .cast("bigint").alias("peak_concurrency")))


# classic RFM label rules — CASE text shared with the oracle
RFM_LABEL_CASE = """CASE
  WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
  WHEN f_score >= 4 THEN 'loyal'
  WHEN m_score >= 4 AND r_score >= 3 THEN 'big_spenders'
  WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
  WHEN r_score <= 2 THEN 'dormant'
  ELSE 'casual' END"""


def rfm_segments(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts",
                 value_col: str = "value") -> DataFrame:
    """RFM segmentation — recency / frequency / monetary quintiles
    per user, rolled up into the classic lifecycle segments
    (champions, loyal, big spenders, at-risk, dormant, casual). The
    marketing-analytics staple, exact on purpose: quintiles are
    integer ceil-division over deterministic (metric, user) ranks,
    monetary is milli-quantized, and the label CASE is shared text
    with the oracle.

    Scale: one per-user aggregate, then THREE distributed ranks over
    the count-reduced user frame (one per dimension —
    ordering.distributed_rank: range partitions + broadcast offset
    carry, never a single-task unpartitioned window), then a tiny
    segment rollup. Raw events are touched once; the user count is a
    broadcast 1-row aggregate, not a whole-frame window.
    """
    from ..cache import managed_persist
    from .ordering import distributed_rank
    per_user = managed_persist(
        events.groupBy(F.col(user_col).alias("u"))
        .agg(F.max(ts_col).alias("r_ts"),
             F.count(F.lit(1)).alias("freq"),
             F.sum(F.expr(
                 f"CAST(floor({value_col} * 1000) AS BIGINT)"))
              .cast("bigint").alias("mon_milli")))
    n_users = per_user.agg(F.count(F.lit(1)).alias("n"))
    # all three dimension ranks in ONE range shuffle: melt the
    # (BIGINT-uniform) metrics to (u, dim, v) long form and rank with
    # a grouped distributed_rank (rank restarts per dim); quintile
    # scores pivot back through a single u-keyed aggregate. One pass
    # over the persisted user frame instead of three.
    melted = per_user.select(
        "u", F.expr("stack(3, 'r_score', r_ts, 'f_score', freq, "
                    "'m_score', mon_milli) AS (dim, v)"))
    ranked = distributed_rank(melted, ["v", "u"], "rk", group_col="dim")
    scores = (ranked.crossJoin(F.broadcast(n_users))
              .withColumn("score", F.expr("(5 * rk + n - 1) DIV n"))
              .groupBy("u")
              .agg(*[F.max(F.when(F.col("dim") == d, F.col("score")))
                     .alias(d)
                     for d in ("r_score", "f_score", "m_score")]))
    out = (per_user.join(scores, "u")
           .crossJoin(F.broadcast(n_users)))
    out = out.withColumn("segment", F.expr(RFM_LABEL_CASE))
    return (out.groupBy("segment", "r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("freq").cast("bigint").alias("n_events"),
                 F.sum("mon_milli").cast("bigint")
                  .alias("total_milli")))


def dau_wau_mau(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts",
                day_ns: int = 86_400_000_000_000) -> DataFrame:
    """Daily / weekly / monthly active users per day plus the DAU/MAU
    stickiness ratio — the engagement dashboard header row. WAU(d)
    counts users active in [d-6, d], MAU(d) in [d-29, d]; stickiness
    is floor ppm so the whole report is engine-exact.

    Scale shape: raw events reduce to DISTINCT (user, day) FIRST; the
    trailing windows come from ONE range join of that reduced frame
    against the day list (each membership row fans out to at most 30
    report days), then per-day conditional distinct counts. No
    windows over raw events, no per-day rescans.
    """
    ud = (events.select(F.col(user_col).alias("u"),
                        F.expr(f"{ts_col} DIV {day_ns}").alias("day"))
          .distinct())
    days = ud.select("day").distinct() \
             .select(F.col("day").alias("d"))
    j = ud.join(F.broadcast(days),
                (F.col("d") >= F.col("day"))
                & (F.col("d") <= F.col("day") + 29))
    return (j.groupBy("d")
            .agg(F.countDistinct(
                     F.when(F.col("d") == F.col("day"), F.col("u")))
                  .alias("dau"),
                 F.countDistinct(
                     F.when(F.col("d") <= F.col("day") + 6,
                            F.col("u"))).alias("wau"),
                 F.countDistinct("u").alias("mau"))
            .select(F.col("d").alias("day"), "dau", "wau", "mau",
                    F.expr("(dau * 1000000) DIV mau")
                     .alias("stickiness_ppm")))


def cusum_changepoint(events: DataFrame, key_col: str = "event_type",
                      ts_col: str = "ts",
                      window_ns: int = 6 * 3_600_000_000_000,
                      threshold_ppm: int = 200_000) -> DataFrame:
    """CUSUM changepoint detection per series: over the window-count
    sequence, the cumulative sum of mean-centered deviations peaks at
    the most likely level-shift point (the classic CUSUM estimator).
    Exact integers via cross-multiplication: dev_t = x_t * n_windows -
    total (zero-sum by construction, no rational mean), the flag
    compares max |cusum| against threshold_ppm * total (so the
    threshold is in fractions of total volume), and the changepoint
    is the first window attaining the max (deterministic tiebreak).

    Scale: one (key, window) count aggregate, one running-sum window
    and one rank window — both over the count-reduced window frame,
    never raw events.
    """
    cnt = (events.select(F.col(key_col).alias("k"),
                         F.expr(f"{ts_col} DIV {window_ns}")
                          .alias("win"))
           .groupBy("k", "win")
           .agg(F.count(F.lit(1)).alias("x")))
    tot = (cnt.groupBy("k")
           .agg(F.count(F.lit(1)).alias("n_windows"),
                F.sum("x").cast("bigint").alias("total")))
    w_run = (Window.partitionBy("k").orderBy("win")
             .rowsBetween(Window.unboundedPreceding, 0))
    c = (cnt.join(tot, "k")
         .withColumn("dev", F.expr("x * n_windows - total"))
         .withColumn("cusum", F.sum("dev").over(w_run).cast("bigint")))
    w_peak = Window.partitionBy("k").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("win"))
    peak = (c.withColumn("pk_rank", F.row_number().over(w_peak))
            .filter(F.col("pk_rank") == 1))
    return (peak.select(
        F.col("k").alias(key_col), "n_windows", "total",
        F.col("win").alias("changepoint_win"),
        F.abs(F.col("cusum")).cast("bigint").alias("max_abs_cusum"),
        (F.abs(F.col("cusum")) * F.lit(1_000_000).cast("bigint")
         > F.expr(f"CAST({threshold_ppm} AS BIGINT) * total"))
        .alias("shift_detected")))
