"""Incremental maintenance of group aggregates from a CDC delta stream.

The reference replays every mutation into the downstream table and any
aggregate is recomputed by querying that table. At 100 TB the Spark-
first answer is delta maintenance: each change event carries its old
and new row images (pkg/loader/model.go:50-64 DML.Values/OldValues),
so SUM/COUNT per group are maintainable with a SINGLE group-keyed
partial aggregation over the deltas — no per-PK shuffle, no snapshot
materialization, O(changes) work regardless of table size. This is
the standard incremental-view-maintenance translation of SUM/COUNT
(self-maintainable aggregates: insert adds, delete subtracts, update
adds the difference).

Two pieces:

- ``coherent_changelog``: fixture adapter. A real binlog guarantees
  coherent images (every UPDATE's old image equals the prior version's
  new image, translator/translator.go:229-350). The synthetic stream
  does not, so this derives coherence per PK with ONE lag window:
  liveness before row i is simply ``lag(op) != 'D'`` (dead stays dead
  through a dropped no-op delete, live dies on a real delete), the
  true old value is ``lag(val)``. Production pipelines fed by an
  actual binlog skip this step entirely.

- ``maintain_group_aggregates``: the operator proper. Pure
  ``groupBy(group_keys).agg(sum(delta))`` — Catalyst plans it as a
  partial (map-side) aggregate + one exchange on the GROUP keys (not
  the PK), so a 1000-executor cluster sees one tiny shuffle however
  wide the key space is. Deltas are computed in DECIMAL(38,6) so the
  sum telescopes exactly: the result equals aggregating the applied
  snapshot, in any order, on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PK_KEYS = ["db", "tbl", "pk"]
VERSION_ORDER = ["commit_ts", "seq", "arrival_seq"]


def coherent_changelog(ok_changes: DataFrame,
                       pk_keys: list[str] = PK_KEYS,
                       order_cols: list[str] = VERSION_ORDER,
                       val_col: str = "val") -> DataFrame:
    """Re-image an ordered per-PK op stream into a coherent changelog.

    Output adds ``eff_op`` ('I'/'U'/'D') and ``old_val``:
    - first live-making change of a PK (or any change after a delete)
      is an INSERT regardless of its labeled op;
    - a change while live is an UPDATE carrying the TRUE prior value;
    - a delete while live is a DELETE carrying the prior value as its
      old image; a delete while dead is a no-op and is dropped.
    """
    w = Window.partitionBy(*pk_keys).orderBy(*order_cols)
    prev_op = F.lag("op").over(w)
    prev_val = F.lag(val_col).over(w)
    live = prev_op.isNotNull() & (prev_op != F.lit("D"))
    out = (ok_changes
           .withColumn("_live", live)
           .withColumn("_prev_val", prev_val)
           .withColumn(
               "eff_op",
               F.when(F.col("op") == "D",
                      F.when(F.col("_live"), F.lit("D")))
                .otherwise(F.when(F.col("_live"), F.lit("U"))
                            .otherwise(F.lit("I"))))
           .withColumn("old_val",
                       F.when(F.col("_live"), F.col("_prev_val"))))
    return out.filter(F.col("eff_op").isNotNull()).drop("_live", "_prev_val")


def maintain_group_aggregates(changelog: DataFrame,
                              group_keys: list[str],
                              val_col: str = "val",
                              old_col: str = "old_val",
                              op_col: str = "eff_op",
                              drop_empty: bool = True,
                              as_decimal: bool = False,
                              rollup: bool = False) -> DataFrame:
    """Maintain COUNT(*) and SUM(val) per group purely from deltas.

    insert: +val / +1 row; update: +(val - old_val) / +0;
    delete: -old_val / -1. With ``drop_empty`` groups whose net row
    count is zero are omitted (no live rows — matching an aggregate
    over the applied snapshot); a streaming fold that merges per-batch
    partials into a state store passes ``drop_empty=False`` so interim
    zero groups stay mergeable, and ``as_decimal=True`` to keep the
    raw ``sum_dec`` column (decimal addition is associative, double
    addition is not — exactness across any batch split requires the
    state itself to stay decimal). Exact DECIMAL(38,6) arithmetic
    makes the telescoped sum identical to the snapshot aggregate.
    """
    dec = "decimal(38,6)"
    new_v = F.col(val_col).cast(dec)
    old_v = F.col(old_col).cast(dec)
    delta = (F.when(F.col(op_col) == "I", new_v)
              .when(F.col(op_col) == "U", new_v - old_v)
              .otherwise(-old_v))
    cnt = (F.when(F.col(op_col) == "I", F.lit(1))
            .when(F.col(op_col) == "U", F.lit(0))
            .otherwise(F.lit(-1)))
    # rollup=True maintains EVERY granularity of the cube in the same
    # single pass: deltas telescope per grouping set just as they do
    # per group (Catalyst plans one Expand + one aggregate)
    grouped = (changelog.rollup(*group_keys) if rollup
               else changelog.groupBy(*group_keys))
    out = grouped.agg(F.sum(delta).alias("sum_dec"),
                      F.sum(cnt).cast("long").alias("n_rows"))
    if drop_empty:
        out = out.filter(F.col("n_rows") > 0)
    if as_decimal:
        return out
    return (out.withColumn("sum_val", F.col("sum_dec").cast("double"))
               .drop("sum_dec"))


def maintain_group_extrema(changelog: DataFrame,
                           group_keys: list[str],
                           val_col: str = "val",
                           old_col: str = "old_val",
                           op_col: str = "eff_op") -> DataFrame:
    """Maintain MIN/MAX per group from deltas — the textbook
    non-self-maintainable aggregate (a delete may retire the current
    extremum, which pure +/- cannot see). The classical fix: maintain
    the auxiliary MULTISET of live values as per-(group, value)
    reference counts — itself fully delta-maintainable (insert +1 on
    the new value, update -1 old / +1 new, delete -1 old) — and read
    the extrema off the counts > 0 support.

    Scale shape: the aux table is #distinct live (group, value) pairs
    (bounded by live rows, usually far smaller); both the count
    maintenance and the extrema read are ONE map-side-combinable
    aggregate each, keyed on (group, value) then group. Per-batch aux
    partials merge by addition, so the streaming fold is exact.
    """
    return extrema_from_multiset(
        value_multiset(changelog, group_keys, val_col, old_col, op_col),
        group_keys)


def value_multiset(changelog: DataFrame, group_keys: list[str],
                   val_col: str = "val", old_col: str = "old_val",
                   op_col: str = "eff_op") -> DataFrame:
    """The auxiliary state: per-(group, value) live reference counts
    from deltas. Per-batch partials merge by summing ``live_count``
    (the streaming fold)."""
    up = (F.when(F.col(op_col).isin("I", "U"), F.col(val_col)))
    down = (F.when(F.col(op_col).isin("D", "U"), F.col(old_col)))
    return (changelog
            .select(*group_keys,
                    F.explode(F.array(
                        F.struct(up.alias("v"), F.lit(1).alias("d")),
                        F.struct(down.alias("v"), F.lit(-1).alias("d"))))
                     .alias("m"))
            .select(*group_keys, "m.v", "m.d")
            .filter(F.col("v").isNotNull())
            .groupBy(*group_keys, "v")
            .agg(F.sum("d").cast("long").alias("live_count")))


def live_support(aux: DataFrame) -> DataFrame:
    """The counts > 0 support of the maintained multiset — the single
    liveness definition every multiset reader shares (extrema,
    quantiles, top-k, distinct count), so a future change to the
    predicate (e.g. retraction-underflow handling) lands once."""
    return aux.filter(F.col("live_count") > 0)


def extrema_from_multiset(aux: DataFrame,
                          group_keys: list[str]) -> DataFrame:
    """Read MIN/MAX (+ live distinct-value count) off the counts > 0
    support of the maintained multiset."""
    return (live_support(aux)
            .groupBy(*group_keys)
            .agg(F.min("v").alias("min_val"),
                 F.max("v").alias("max_val"),
                 F.count(F.lit(1)).alias("n_distinct_live")))


def quantiles_from_multiset(aux: DataFrame, group_keys: list[str],
                            quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                            ) -> DataFrame:
    """EXACT nearest-rank quantiles per group read off the maintained
    value multiset — the same aux state that serves MIN/MAX also
    serves p50/p90/p99 with no snapshot and no sort of the raw rows:
    a cumulative sum over the (far smaller) distinct-value table
    ranks every live row implicitly through its value's refcount.

    Nearest-rank definition (matches scoring.corpus_length_quantiles):
    the value whose cumulative live count first reaches
    ceil(q * n_live).
    """
    live = live_support(aux)
    w_cum = (Window.partitionBy(*group_keys).orderBy("v")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(*group_keys)
    cum = (live
           .withColumn("cum", F.sum("live_count").over(w_cum))
           .withColumn("n", F.sum("live_count").over(w_all)))
    aggs = [F.max("n").cast("long").alias("n_live")]
    for q in quantiles:
        pct = int(round(q * 100))
        # exact integer nearest-rank: see corpus_length_quantiles
        # (float q*n diverges between DuckDB DECIMAL and Spark DOUBLE)
        target = F.expr(f"({pct} * n + 99) div 100")
        aggs.append(F.min(F.when(F.col("cum") >= target, F.col("v")))
                    .alias(f"p{pct}_val"))
    return cum.groupBy(*group_keys).agg(*aggs)


def top_values_from_multiset(aux: DataFrame, group_keys: list[str],
                             n: int = 3) -> DataFrame:
    """Per-group heavy hitters read off the maintained multiset: the
    ``n`` most frequent live values (live_count desc, value asc for a
    total order). One rank window over the distinct-value table —
    never over raw rows."""
    w = (Window.partitionBy(*group_keys)
         .orderBy(F.desc("live_count"), F.asc("v")))
    return (live_support(aux)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select(*group_keys, "rank", "v", "live_count"))


def maintain_join_aggregate(fact_changelog: DataFrame,
                            dim_last: DataFrame,
                            fk_cols: list[str],
                            dim_group_cols: list[str],
                            val_col: str = "val",
                            old_col: str = "old_val",
                            op_col: str = "eff_op") -> DataFrame:
    """Aggregate-over-join IVM: SUM/COUNT per DIMENSION attribute,
    maintained without ever joining raw facts to the dimension.

    Two-level maintenance (the standard warehouse decomposition):
    level 1 is the per-foreign-key partial sum table, maintained
    purely from fact deltas (self-maintainable, #distinct-fk rows);
    level 2 joins those partials to the CURRENT dimension image and
    regroups — a broadcast join over #fk rows, never #fact rows.
    A dimension row changing its attribute moves the fk's whole
    partial between groups at the next read; fact churn touches only
    level 1. Unmatched foreign keys surface as a NULL group (left
    join), never silently dropped.
    """
    fk_sums = maintain_group_aggregates(
        fact_changelog, fk_cols, val_col=val_col, old_col=old_col,
        op_col=op_col, drop_empty=False, as_decimal=True)
    return regroup_partials(fk_sums, dim_last, fk_cols, dim_group_cols)


def regroup_partials(fk_sums: DataFrame, dim_last: DataFrame,
                     fk_cols: list[str],
                     dim_group_cols: list[str]) -> DataFrame:
    """Level 2 of the join IVM, shared by the batch operator and the
    streaming read: broadcast-join the per-key PARTIALS (sum_dec,
    n_rows) to the current dimension image and regroup."""
    return (fk_sums
            .join(F.broadcast(dim_last), fk_cols, "left")
            .groupBy(*dim_group_cols)
            .agg(F.sum("sum_dec").cast("decimal(38,6)").alias("_s"),
                 F.sum("n_rows").cast("long").alias("n_rows"))
            .filter(F.col("n_rows") > 0)
            .withColumn("sum_val", F.col("_s").cast("double"))
            .drop("_s"))


def maintain_group_moments(changelog: DataFrame,
                           group_keys: list[str],
                           val_col: str = "val",
                           old_col: str = "old_val",
                           op_col: str = "eff_op",
                           drop_empty: bool = True,
                           as_decimal: bool = False) -> DataFrame:
    """Maintain the first two moments per group from deltas: COUNT,
    SUM, and SUM of squares are all self-maintainable, so mean /
    variance / stddev come with zero extra state. Squares are exact
    DECIMAL(38,12) (inputs are DECIMAL(38,6), so products carry 12
    fractional digits exactly and telescope in any order); the
    variance read is the standard population form
    ``(ss - s^2/n) / n`` computed at the very end in DOUBLE.
    """
    dec, dec2 = "decimal(38,6)", "decimal(38,12)"
    new_v = F.col(val_col).cast(dec)
    old_v = F.col(old_col).cast(dec)
    # squares multiply (18,6) operands -> (37,12): exact, no engine
    # hits its 38-digit cap (a (38,6)x(38,6) product would force a
    # silent scale reduction on Spark and an overflow on DuckDB)
    new_s = F.col(val_col).cast("decimal(18,6)")
    old_s = F.col(old_col).cast("decimal(18,6)")
    d1 = (F.when(F.col(op_col) == "I", new_v)
           .when(F.col(op_col) == "U", new_v - old_v)
           .otherwise(-old_v))
    d2 = (F.when(F.col(op_col) == "I", (new_s * new_s).cast(dec2))
           .when(F.col(op_col) == "U",
                 (new_s * new_s).cast(dec2) - (old_s * old_s).cast(dec2))
           .otherwise(-(old_s * old_s).cast(dec2)))
    cnt = (F.when(F.col(op_col) == "I", F.lit(1))
            .when(F.col(op_col) == "U", F.lit(0))
            .otherwise(F.lit(-1)))
    out = (changelog
           .groupBy(*group_keys)
           .agg(F.sum(d1).cast(dec).alias("sum_dec"),
                F.sum(d2).cast(dec2).alias("sumsq_dec"),
                F.sum(cnt).cast("long").alias("n_rows")))
    if drop_empty:
        out = out.filter(F.col("n_rows") > 0)
    if as_decimal:
        return out
    s = F.col("sum_dec").cast("double")
    ss = F.col("sumsq_dec").cast("double")
    n = F.col("n_rows").cast("double")
    return (out.withColumn("mean_val", s / n)
               .withColumn("var_val", (ss - s * s / n) / n)
               .select(*group_keys, "n_rows",
                       F.col("sum_dec").cast("double").alias("sum_val"),
                       "mean_val", "var_val"))


def maintain_group_aggregates_wide(changelog: DataFrame,
                                   group_keys: list[str],
                                   field: str,
                                   values_col: str = "values",
                                   old_values_col: str = "old_values",
                                   op_col: str = "eff_op",
                                   drop_empty: bool = True) -> DataFrame:
    """The map-model twin of ``maintain_group_aggregates``: deltas
    extracted from the reference's full row images
    (``Values``/``OldValues`` string maps, pkg/loader/model.go:50-64)
    — the shape a real binlog feed arrives in. One element_at + cast
    per row, then the identical group-keyed DECIMAL fold.
    """
    dec = "decimal(38,6)"
    new_v = F.element_at(F.col(values_col), field).cast(dec)
    old_v = F.element_at(F.col(old_values_col), field).cast(dec)
    delta = (F.when(F.col(op_col) == "I", new_v)
              .when(F.col(op_col) == "U", new_v - old_v)
              .otherwise(-old_v))
    cnt = (F.when(F.col(op_col) == "I", F.lit(1))
            .when(F.col(op_col) == "U", F.lit(0))
            .otherwise(F.lit(-1)))
    out = (changelog
           .groupBy(*group_keys)
           .agg(F.sum(delta).alias("_s"),
                F.sum(cnt).cast("long").alias("n_rows")))
    if drop_empty:
        out = out.filter(F.col("n_rows") > 0)
    return (out.withColumn("sum_val", F.col("_s").cast("double"))
               .drop("_s"))


def distinct_count_from_multiset(aux: DataFrame,
                                 group_keys: list[str]) -> DataFrame:
    """EXACT per-group COUNT(DISTINCT value) read off the maintained
    value multiset — the aggregate SQL engines usually approximate
    (HLL) becomes a trivial count of live (group, value) rows in the
    same aux state that already serves MIN/MAX/quantiles/top-k. A
    delete that retires a value's last reference drops it from the
    count automatically (live_count reaches 0); no snapshot rescan,
    state is #distinct live pairs."""
    return (live_support(aux)
            .groupBy(*group_keys)
            .agg(F.count(F.lit(1)).alias("n_distinct"),
                 F.sum("live_count").alias("n_live")))
