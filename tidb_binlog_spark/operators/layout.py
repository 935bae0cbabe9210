"""Data-layout primitives: z-order (Morton) interleaved sort keys and
the per-file locality report that justifies them.

At 100 TB the dominant scan cost is files read, and min/max zone maps
prune files only when each file's key range is TIGHT. A single-column
sort makes one dimension tight and leaves every other dimension
spanning the whole domain; the z-order key interleaves the bits of
two dimensions so files sorted by it get bounded spans in BOTH — the
layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed here as
plain integer arithmetic (engine-exact, oracle-checkable).

Reference analog: the drainer's file dump is ordered by commit-ts
only (drainer/sync/pb.go); a pk+ts z-order would let reparo prune
dump files by table key range as well as by ts — same idea, applied
to the corpus/snapshot tables here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zorder_expr(x: str, y: str, bits: int = 16) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of two
    non-negative BIGINT expressions: x occupies even bit positions, y
    odd. Unrolled shifts/masks — whole-stage-codegen'd, no UDF."""
    terms = []
    for b in range(bits):
        terms.append(f"shiftleft(shiftright(CAST({x} AS BIGINT), {b}) & 1,"
                     f" {2 * b})")
        terms.append(f"shiftleft(shiftright(CAST({y} AS BIGINT), {b}) & 1,"
                     f" {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout_report(df: DataFrame, x: str, y: str,
                         bits: int = 16,
                         file_bits: int = 10) -> DataFrame:
    """Assign each row the file it would land in under a z-order
    layout (top ``file_bits`` of the interleaved key = file id, i.e.
    an equal-width z-range split) and report per-file zone-map stats:
    row count and min/max of BOTH dimensions.

    The report IS the pruning guarantee: a predicate on either
    dimension can skip every file whose [min, max] misses it. One
    map-side-combinable aggregate keyed on the (<= 2^file_bits) file
    ids — no sort, no shuffle beyond the final small agg."""
    zkey = zorder_expr("xv", "yv", bits)
    shift = 2 * bits - file_bits
    per = (df.select(F.col(x).cast("long").alias("xv"),
                     F.col(y).cast("long").alias("yv"))
           .withColumn("file_id",
                       F.expr(f"shiftright({zkey}, {shift})")))
    return (per.groupBy("file_id")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("xv").alias("x_min"), F.max("xv").alias("x_max"),
                 F.min("yv").alias("y_min"), F.max("yv").alias("y_max"))
            .select("file_id", "n_rows", "x_min", "x_max",
                    "y_min", "y_max",
                    (F.col("x_max") - F.col("x_min")).alias("x_span"),
                    (F.col("y_max") - F.col("y_min")).alias("y_span")))


def compaction_plan(files: DataFrame, part_cols: list[str],
                    file_col: str, size_col: str,
                    target_bytes: int) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE bin-packing
    primitive): within each partition, files are packed in file-id
    order into output bins of ~``target_bytes`` by assigning each
    file the bin its cumulative start offset falls in
    (``bin = prefix_bytes DIV target``). Deterministic, one-pass, and
    exactly the greedy consecutive packing Delta/Iceberg OPTIMIZE
    uses — expressed as a window prefix sum instead of a driver loop.

    Scale shape: ONE window keyed on the partition columns (file
    listings are metadata — millions of rows, not corpus bytes); for
    a pathological million-file single partition the two-phase
    bucketed prefix sum (operators/batching.py) is the documented
    drop-in. Output is one row per planned output file: the rewrite
    task list.
    """
    w = (Window.partitionBy(*part_cols).orderBy(file_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    planned = (files
               .withColumn("_offset",
                           F.coalesce(F.sum(size_col).over(w), F.lit(0)))
               .withColumn("bin_id",
                           F.expr(f"_offset DIV {int(target_bytes)}")))
    return (planned.groupBy(*part_cols, "bin_id")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(size_col).cast("bigint").alias("bin_bytes"),
                 F.min(file_col).alias("first_file"),
                 F.max(file_col).alias("last_file")))
