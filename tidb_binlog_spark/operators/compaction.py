"""Per-primary-key compaction ("merge by primary key").

Reference: pkg/loader/merge.go:22-129 — within an apply batch, the DML
sequence for one PK collapses to a single final operation:

    insert + update  -> insert          (new image wins)
    update + update  -> update          (first old image, last new image)
    update + delete  -> delete
    delete + insert  -> insert

Spark-first design: this is a single wide aggregation per (db, tbl, pk)
— no driver loop, no UDF. We use ``max_by``-style window ranking on the
global order key (commit_ts, seq), which Catalyst executes as one
shuffle + sort within partitions; at 100 TB the shuffle is keyed on the
PK so it scales horizontally and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["db", "tbl", "pk"]


def compact_last_image(changes: DataFrame) -> DataFrame:
    """Last-writer-wins image per PK: one row per key holding the final
    op and the final row image. Downstream appliers turn this into one
    statement per key (the whole point of the reference's merge: cut
    write amplification before hitting the sink).
    """
    w = Window.partitionBy(*KEY).orderBy(*[c.desc() for c in [
        F.col("commit_ts"), F.col("seq"), F.col("arrival_seq")]])
    return (
        changes
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def merged_op(changes: DataFrame) -> DataFrame:
    """Classify the *merged* operation per PK following merge.go's rule
    table, given the full in-batch history:

    - last op D                -> 'D'
    - an I at or after the last D (or an I with no D) -> 'I'
    - otherwise                -> 'U'

    This reproduces insert+update->insert, delete+insert->insert,
    update+update->update, update+delete->delete as one aggregation.

    NOTE ``first_val`` is the first event's NEW image (a scalar
    convenience for single-value streams); the reference's
    update+update rule keeps the first update's OLD image for the
    WHERE clause — that semantics lives in ``compact_wide`` (the
    values/old_values map model), whose first_old_val is the one to
    use for WHERE generation.

    The order key is a per-key row_number over the full
    (commit_ts, seq, arrival_seq) tuple — an arithmetic packing like
    commit_ts*K+seq would invert order once seq >= K (the reference
    allows arbitrarily long transactions).
    """
    w = Window.partitionBy(*KEY).orderBy("commit_ts", "seq", "arrival_seq")
    agg = (
        changes.select(*KEY, "op", "val", "commit_ts", "seq", "arrival_seq")
        .withColumn("ord", F.row_number().over(w).cast("long"))
        .groupBy(*KEY)
        .agg(
            F.max("ord").alias("last_ord"),
            F.max(F.when(F.col("op") == "D", F.col("ord"))).alias("last_d"),
            F.max(F.when(F.col("op") == "I", F.col("ord"))).alias("last_i"),
            F.max_by("val", "ord").alias("final_val"),
            F.min_by("val", "ord").alias("first_val"),
            F.count(F.lit(1)).alias("n_ops"),
        )
    )
    return agg.select(
        *KEY,
        F.when(F.col("last_d") == F.col("last_ord"), F.lit("D"))
         .when(F.col("last_i").isNotNull()
               & (F.col("last_d").isNull() | (F.col("last_i") > F.col("last_d"))),
               F.lit("I"))
         .otherwise(F.lit("U")).alias("merged_op"),
        "final_val", "first_val", "n_ops",
    )


def compact_wide(changes: DataFrame) -> DataFrame:
    """Map-model compaction (pkg/loader/merge.go:84-118 over
    DML.Values/OldValues, model.go:50-64):

    - merged op per the merge rule table (same as ``merged_op``);
    - final image = the LAST event's ``values`` map (insert+update ->
      insert keeps the last new image; update+update keeps the last
      new image; delete keeps the delete's row image);
    - old image = the FIRST update's ``old_values`` map
      (update+update -> ``dml.OldValues = oldDML.OldValues``), taken
      from updates AFTER the last delete (a delete resets the row's
      lineage), and only reported when the merged op is 'U'
      (insert-update -> insert clears OldValues, merge.go:104-107).

    Emitted EXPLODED per column — (db, tbl, pk, merged_op, col,
    final_val, first_old_val, n_ops) — one row per (key, column):
    engine-portable output (map rendering differs across engines) and
    the shape a per-column statement builder consumes anyway.

    Scale shape: one window + one aggregation keyed on the PK (same
    shuffle as merged_op), then a per-(key, column) explode — no
    per-row Python, no driver loops.
    """
    w = Window.partitionBy(*KEY).orderBy("commit_ts", "seq", "arrival_seq")
    w_all = Window.partitionBy(*KEY)
    orded = (changes
             .select(*KEY, "op", "values", "old_values",
                     "commit_ts", "seq", "arrival_seq")
             .withColumn("ord", F.row_number().over(w).cast("long"))
             .withColumn("last_d",
                         F.max(F.when(F.col("op") == "D", F.col("ord")))
                          .over(w_all)))
    agg = (orded.groupBy(*KEY).agg(
        F.max("ord").alias("last_ord"),
        F.max(F.when(F.col("op") == "D", F.col("ord"))).alias("last_d_ord"),
        F.max(F.when(F.col("op") == "I", F.col("ord"))).alias("last_i"),
        F.max_by("values", "ord").alias("final_values"),
        F.min_by(
            "old_values",
            F.when((F.col("op") == "U")
                   & (F.col("last_d").isNull()
                      | (F.col("ord") > F.col("last_d"))),
                   F.col("ord"))).alias("first_old_values"),
        F.count(F.lit(1)).alias("n_ops"),
    ))
    merged = agg.select(
        *KEY,
        F.when(F.col("last_d_ord") == F.col("last_ord"), F.lit("D"))
         .when(F.col("last_i").isNotNull()
               & (F.col("last_d_ord").isNull()
                  | (F.col("last_i") > F.col("last_d_ord"))),
               F.lit("I"))
         .otherwise(F.lit("U")).alias("merged_op"),
        "final_values", "first_old_values", "n_ops",
    )
    exploded = merged.select(
        *KEY, "merged_op", "n_ops",
        F.explode("final_values").alias("col", "final_val"),
        "first_old_values")
    return exploded.select(
        *KEY, "merged_op", "col", "final_val",
        F.when(F.col("merged_op") == "U",
               F.try_element_at("first_old_values", F.col("col")))
         .alias("first_old_val"),
        "n_ops")


def apply_snapshot(changes: DataFrame) -> DataFrame:
    """Materialize the final table snapshot: compact to the last image
    per key, drop keys whose final op is DELETE. This is the batch
    equivalent of the full loader apply path (pkg/loader/load.go:636-724)
    with MERGE semantics at the sink.
    """
    last = compact_last_image(changes)
    return last.filter(F.col("op") != "D").select(
        "db", "tbl", "pk", "commit_ts", "op", "val", "row_json")
