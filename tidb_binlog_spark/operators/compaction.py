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


def apply_snapshot(changes: DataFrame) -> DataFrame:
    """Materialize the final table snapshot: compact to the last image
    per key, drop keys whose final op is DELETE. This is the batch
    equivalent of the full loader apply path (pkg/loader/load.go:636-724)
    with MERGE semantics at the sink.
    """
    last = compact_last_image(changes)
    return last.filter(F.col("op") != "D").select(
        "db", "tbl", "pk", "commit_ts", "op", "val", "row_json")
