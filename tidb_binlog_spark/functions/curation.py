"""Corpus-curation operators beyond dedup: benchmark decontamination,
deterministic stratified sampling, and token-budget sequence packing —
the remaining staples of a pretraining data pipeline at 100 TB.

Scale design:
- decontamination is a distinct-shingle semi-join against a BROADCAST
  benchmark shingle set (benchmarks are tiny next to the corpus; the
  corpus is never shuffled beyond its own per-doc distinct);
- stratified sampling is a pure Catalyst filter on an md5-hex
  threshold — no randomness, no shuffle, fully pushdown-friendly, and
  deterministic across replays (the same doc always draws the same
  "ticket", so re-runs produce identical samples);
- packing reuses the two-phase prefix-sum shape (operators/batching.py
  assign_txn_batches): per-(stratum, id-bucket) windows in parallel,
  then a per-stratum carry over one tiny row per bucket — no global
  single-task window at any scale.

Determinism doubles as oracle parity: every operator is reproducible
in DuckDB bit-for-bit (md5 hex strings, integer token counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import managed_persist
from .dedup import with_shingles


def contamination(corpus: DataFrame, bench: DataFrame) -> DataFrame:
    """Benchmark contamination per corpus doc: the fraction of its
    distinct word-3-gram shingles that also occur in the benchmark
    set (the n-gram-overlap decontamination used for pretraining
    corpora). Returns (doc_id, n_shingles, n_hits, contamination)
    for contaminated docs only.

    Shape: corpus -> distinct (doc_id, shingle); bench -> distinct
    shingle, broadcast; one hash join + map-side-combinable counts.
    """
    c_sh = managed_persist(
        with_shingles(corpus)
        .select("doc_id", F.explode("shingles").alias("sh"))
        .distinct())
    b_sh = (with_shingles(bench)
            .select(F.explode("shingles").alias("sh"))
            .distinct())
    totals = c_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"))
    hits = (c_sh.join(F.broadcast(b_sh), "sh")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    return (totals.join(hits, "doc_id")
            .select("doc_id", "n_shingles", "n_hits",
                    (F.col("n_hits").cast("double")
                     / F.col("n_shingles").cast("double"))
                    .alias("contamination")))


def stratified_sample(docs: DataFrame, rates: dict[str, str],
                      default_threshold: str = "00000000",
                      stratum_col: str = "lang",
                      key_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum downsampling (domain/language mixing):
    keep a row iff the first 8 hex chars of md5(key) sort below the
    stratum's threshold — e.g. '80000000' keeps ~50%, '40000000' ~25%.

    Hex-string comparison (not float conversion) keeps the draw
    engine-exact; thresholds express rates with 32-bit resolution.
    Strata not in ``rates`` use ``default_threshold`` ('00000000'
    drops them)."""
    ticket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr = F.lit(default_threshold)
    for stratum, threshold in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum,
                     F.lit(threshold)).otherwise(thr)
    return docs.withColumn("_ticket", ticket).filter(F.col("_ticket") < thr) \
               .drop("_ticket")


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   stratum_col: str = "lang",
                   id_bucket: int = 1 << 16) -> DataFrame:
    """Token-budget sequence packing: assign docs (per stratum, in
    doc_id order) to consecutive bins of ~``budget`` whitespace tokens
    — the contiguous greedy packing used to build fixed-length training
    sequences. A doc lands in the bin where the running token total
    *before* it falls; oversized docs occupy bins alone.

    Two-phase prefix sum (see operators/batching.assign_txn_batches):
    phase 1 windows partition by (stratum, doc_id-bucket) and run in
    parallel; phase 2 carries per-bucket totals (one row per bucket)
    per stratum. No task ever sees a whole stratum's rows."""
    from .text import TOKENS
    sized = managed_persist(
        docs.select(stratum_col, "doc_id",
                    F.expr(f"size({TOKENS})").alias("n_tokens"))
            .withColumn("_b", F.floor(F.col("doc_id") / id_bucket)))
    w_in = (Window.partitionBy(stratum_col, "_b").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    within = sized.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    bucket_tot = within.groupBy(stratum_col, "_b").agg(
        F.sum("n_tokens").alias("tot"))
    w_carry = (Window.partitionBy(stratum_col).orderBy("_b")
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = bucket_tot.withColumn(
        "offset", F.coalesce(F.sum("tot").over(w_carry), F.lit(0)))
    return (within
            .join(F.broadcast(offsets.select(stratum_col, "_b", "offset")),
                  [stratum_col, "_b"])
            .withColumn("cum", F.col("offset") + F.col("cum_in"))
            .withColumn("bin_id",
                        F.floor((F.col("cum") - F.col("n_tokens")) / budget)
                         .cast("long"))
            .select(stratum_col, "doc_id", "n_tokens", "bin_id"))
