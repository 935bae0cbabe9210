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
