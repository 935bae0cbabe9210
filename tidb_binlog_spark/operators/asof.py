"""Generic as-of join — for each left row, the latest right row with
``right_ts <= left_ts`` per key (optionally within a tolerance).

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive encodings
are a range join (quadratic blow-up per key) or a per-key loop. This
implementation is the shuffle-friendly one:

1. union the two sides tagged L/R (right rows carry a struct of the
   requested value columns, left rows carry NULL);
2. ONE window per key ordered by (ts, side) — right sorts before left
   at equal timestamps, so ties match inclusively — with
   ``last(value_struct, ignorenulls=true)`` carrying the most recent
   right payload forward;
3. keep the L rows; unpack the carried struct.

Cost: one shuffle of |L| + |R| rows keyed on the join key and a
per-key sort — the same plan shape as sessionization, no row ever
joins more than one partner, no range explosion at any key cardinality.
Carrying the whole value set as ONE struct (not per-column
last(ignorenulls)) keeps NULL-valued right columns correct: a NULL
field inside a matched struct stays NULL instead of leaking an older
row's value.

The right side must be unique per (key, right_ts) — the same contract
DuckDB's ASOF JOIN documents; pre-aggregate (e.g. max_by) if it is
not, identically in any oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              tolerance: int | None = None,
              matched_ts_col: str = "asof_ts") -> DataFrame:
    """Backward inclusive as-of join: left columns + the value columns
    of the latest right row with ``right_ts <= left_ts`` (NULL when no
    such row, or when it is older than ``tolerance`` time units).
    ``matched_ts_col`` receives the matched right timestamp."""
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    reserved = {"_t", "_side", "_r", "_m", "_ts"}
    bad = reserved & set(left.columns) | reserved & set(right.columns)
    if bad:
        raise ValueError(f"asof_join reserves column names {sorted(bad)}")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist on the left side; "
            f"rename before joining")
    if matched_ts_col in left.columns:
        raise ValueError(f"matched_ts_col {matched_ts_col!r} already "
                         f"exists on the left side")
    payload = F.struct(F.col(right_ts).alias("_ts"),
                       *[F.col(c) for c in value_cols])
    r = (right.select(*on,
                      F.col(right_ts).alias("_t"),
                      F.lit(0).alias("_side"),
                      payload.alias("_r")))
    left_cols = left.columns
    l = left.select(*left_cols,
                    F.col(left_ts).alias("_t"),
                    F.lit(1).alias("_side"),
                    F.lit(None).cast(r.schema["_r"].dataType).alias("_r"))
    # align: right rows need NULLs for left-only columns
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(*on).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = merged.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    matched = F.col("_m")
    if tolerance is not None:
        in_tol = F.col("_m").isNotNull() & \
            (F.col("_t") - F.col("_m._ts") <= F.lit(tolerance))
        matched = F.when(in_tol, F.col("_m"))
    return out.select(
        *left_cols,
        matched["_ts"].alias(matched_ts_col),
        *[matched[c].alias(c) for c in value_cols])
