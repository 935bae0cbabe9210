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


def partition_stats_with_merge_proof(df: DataFrame, part_expr: str,
                                     value_expr: str, ndv_expr: str,
                                     k: int = 64) -> DataFrame:
    """Partition-level table statistics (row count, value min/max,
    KMV NDV sketch) plus an in-query proof that the GLOBAL stats fold
    from the per-partition ones — the ANALYZE-maintenance contract
    that lets a 100 TB table keep CBO stats fresh by scanning only
    changed partitions and merging (count: sum, min/max: min/max,
    NDV: union the k-minimum hash sets and re-truncate).

    Output: one row per partition (merge_ok NULL) and one
    scope='GLOBAL' row whose merge_ok asserts the directly-computed
    global stats equal the merged ones (count/min/max AND the KMV
    kth hash). All integer/md5 arithmetic — engine-exact.
    """
    base = df.select(
        F.expr(part_expr).alias("scope"),
        F.expr(value_expr).cast("long").alias("v"),
        F.expr(f"CAST(conv(substring(md5(CAST(({ndv_expr}) AS STRING)), "
               "1, 12), 16, 10) AS BIGINT)").alias("h"))
    from tidb_binlog_spark.cache import managed_persist
    base = managed_persist(base)
    agg = base.groupBy("scope").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("min_v"), F.max("v").alias("max_v"))
    dh = base.select("scope", "h").distinct()
    # scope = one partition value (e.g. ship-month): cardinality grows
    # with the table, so the single rank window stays parallel — the
    # two-phase stratum_smallest_k treatment measured SLOWER here
    # (33.7 vs 28.6-30.5 s at the 100x dir; it pays off only for
    # handful-of-strata groupings like the KMV source sketches)
    wp = Window.partitionBy("scope").orderBy("h")
    mins = managed_persist(
        dh.withColumn("rnk", F.row_number().over(wp))
          .filter(F.col("rnk") <= k))
    sk = mins.groupBy("scope").agg(F.max("h").alias("kth_hash"),
                                   F.count(F.lit(1)).alias("k_used"))
    parts = (agg.join(sk, "scope")
             .withColumn("merge_ok", F.lit(None).cast("boolean")))

    def global_sketch(hashes):
        # TakeOrderedAndProject: each partition keeps its own k smallest
        # hashes, the driver merges — never funnels the full distinct-hash
        # frame (NDV-sized at 100 TB) through one WindowExec partition.
        return (hashes.select("h").distinct()
                .orderBy("h").limit(k)
                .agg(F.max("h").alias("kth_hash"),
                     F.count(F.lit(1)).alias("k_used")))

    # the direct global sketch reads the per-(scope, h) distinct frame
    # instead of re-distincting the raw base (r14, guide §2.4): the
    # distinct-of-h SET is identical either way, so the sketch value
    # is unchanged, but one full-width distinct exchange over the base
    # disappears; the merge proof keeps its independence — its MERGED
    # side folds the truncated per-partition sketches (``mins``), a
    # genuinely different path from any data-wide distinct.
    direct = (base.agg(F.count(F.lit(1)).alias("n_rows"),
                       F.min("v").alias("min_v"),
                       F.max("v").alias("max_v"))
              .crossJoin(global_sketch(dh)))
    merged = (agg.agg(F.sum("n_rows").cast("long").alias("m_n"),
                      F.min("min_v").alias("m_min"),
                      F.max("max_v").alias("m_max"))
              .crossJoin(global_sketch(mins)
                         .select(F.col("kth_hash").alias("m_kth"),
                                 F.col("k_used").alias("m_k"))))
    g = (direct.crossJoin(merged)
         .select(F.lit("GLOBAL").alias("scope"), "n_rows", "min_v",
                 "max_v", "kth_hash", "k_used",
                 F.expr("n_rows = m_n AND min_v = m_min "
                        "AND max_v = m_max AND kth_hash = m_kth "
                        "AND k_used = m_k").alias("merge_ok")))
    return parts.unionByName(g)
