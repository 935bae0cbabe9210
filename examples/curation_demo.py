"""End-to-end training-data curation demo: the 100 TB pipeline shape
run at fixture scale, self-verifying (exit 0 = every stage agreed).

  1. profile + language-ID + quality-gate the raw documents;
  2. dedup: exact clusters, then line-level boilerplate removal,
     then MinHash+LSH near-dup canonicalization (keep lowest id);
  3. decontaminate against a benchmark set (span-level strip);
  4. mix sources to target weights and deterministically shuffle;
  5. pack to a fixed token budget and write training shards;
  6. cross-check: every stage's row accounting, replay-stability of
     the shuffle/shards, and the packing budget invariant.

Run:  python examples/curation_demo.py  [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tidb_binlog_spark.functions import curation, dedup, text
from tidb_binlog_spark.session import get_spark, load_tables

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else \
        tempfile.mkdtemp(prefix="curation_demo_")
    spark = get_spark("curation_demo")
    load_tables(spark, SF_DIR, "documents")
    docs = spark.table("documents")
    n_raw = docs.count()

    # 1. profile + gates: language, quality, repetition
    lang = text.lang_id(docs).select("doc_id", "pred_lang")
    qual = text.quality_score(docs).select(
        "doc_id", "n_tokens", "stopword_ratio")
    gated = (docs.join(lang, "doc_id").join(qual, "doc_id")
             .filter((F.col("n_tokens") >= 5)
                     & (F.col("pred_lang").isNotNull())))
    n_gated = gated.count()
    assert 0 < n_gated <= n_raw

    # 2a. exact dedup: keep cluster canonicals
    ex = dedup.exact_dedup(gated)
    canon = (gated.join(
        ex.filter(F.col("doc_id") == F.col("canonical_id"))
          .select("doc_id"), "doc_id"))
    n_exact = canon.count()
    assert n_exact <= n_gated

    # 2a'. incremental ingest with a Bloom pre-filter: "tomorrow's"
    # batch probes "today's" filter; only bloom-positive docs pay the
    # exact membership join. Admission must EQUAL the plain anti-join
    # (a Bloom filter has no false negatives), with the filter itself
    # a broadcast-sized position set at any corpus size.
    day1 = canon.filter(F.col("doc_id") % 2 == 0)
    day2 = canon.filter(F.col("doc_id") % 2 == 1)
    verdicts = dedup.bloom_membership(day2, day1,
                                      m_bits=1 << 16, k_hashes=4)
    admitted = verdicts.filter(~F.col("seen_exact")).select("doc_id")
    plain = (day2.select("doc_id", F.md5("text").alias("h"))
             .join(day1.select(F.md5("text").alias("h")).distinct(),
                   "h", "left_anti").select("doc_id"))
    assert admitted.exceptAll(plain).count() == 0
    assert plain.exceptAll(admitted).count() == 0
    n_fp = verdicts.filter(F.col("false_positive")).count()
    n_skip = verdicts.filter(~F.col("maybe_seen")).count()
    print(f"bloom ingest: {n_skip} definitely-new skipped the exact "
          f"join, {n_fp} false positives paid it needlessly")

    # 2b. line-level boilerplate removal (does not drop docs;
    # clean_text becomes the working text, source rides along)
    cleaned = (curation.line_dedup(canon)
               .select("doc_id", F.col("clean_text").alias("text"))
               .join(canon.select("doc_id", "source"), "doc_id"))
    assert cleaned.count() == n_exact

    # 2c. near-dup canonicalization: LSH pairs -> drop higher ids
    pairs = dedup.minhash_lsh_pairs(cleaned)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # localCheckpoint, not persist: each later stage JOINS frames
    # derived from this one, and Catalyst re-walks the full shared
    # lineage per branch — truncating it here keeps the composed
    # plan tree linear in stages instead of exponential
    kept = cleaned.join(losers, "doc_id", "left_anti").localCheckpoint()
    n_kept = kept.count()
    assert n_kept + losers.count() >= n_exact  # losers may overlap

    # 3. benchmark decontamination: find overlapping spans against
    # the held-out set, then surgically strip ONLY those passages
    bench = docs.filter(F.col("doc_id") % 97 == 0) \
                .select("doc_id", "text")
    spans = dedup.decontaminate_spans(kept, bench)
    # persist at the fan-out: the stripped text feeds the mixer, the
    # shuffle, the packer, and the shard writer — without it the
    # exists()-lambda strip recomputes for every consumer
    stripped = (dedup.strip_spans(kept, spans)
                .select("doc_id",
                        F.col("clean_text").alias("text"))
                .join(kept.select("doc_id", "source"), "doc_id")
                .localCheckpoint())
    n_stripped = stripped.count()
    assert n_stripped == n_kept       # strip edits text, keeps rows
    # contaminated docs really lost tokens
    assert spans.select("doc_id").distinct().count() > 0

    # 4. mix to target source weights + deterministic shuffle
    # (weights over the sources actually present, heavier head)
    have = sorted(r["source"] for r in
                  stripped.select("source").distinct().collect())
    weights = {s: (2.0 if i < 3 else 1.0)
               for i, s in enumerate(have)}
    tot = sum(weights.values())
    weights = {s: w / tot for s, w in weights.items()}
    # the mixer returns the SELECTION (ids + per-stratum targets);
    # rejoin the doc bodies for the downstream stages
    picked = curation.mix_to_weights(
        stripped.select("doc_id", "source"), weights,
        stratum_col="source")
    mixed = stripped.join(picked.select("doc_id"), "doc_id") \
        .localCheckpoint()
    order = curation.deterministic_shuffle(mixed, seed="demo")
    again = curation.deterministic_shuffle(mixed, seed="demo")
    assert order.exceptAll(again).count() == 0     # replay-stable
    shuffled = mixed.join(order, "doc_id")

    # 5. pack + shards — greedy prefix packing: a doc starts in the
    # bin its running total lands in, so bin count is exactly
    # ceil-bounded by total_tokens / budget per stratum
    packed = curation.pack_sequences(
        shuffled.select("doc_id", "text", "source"),
        budget=512, stratum_col="source")
    tots = packed.groupBy("source").agg(
        F.sum("n_tokens").alias("t"), F.max("bin_id").alias("mx"))
    bad = tots.filter(F.col("mx") > F.col("t") / 512).count()
    assert bad == 0                   # bin ids never outrun the budget
    out_dir = os.path.join(work, "shards")
    curation.write_training_shards(
        shuffled.select("doc_id", "text", "source"), out_dir,
        n_shards=4, seed="demo", stratum_col="source")
    shards = spark.read.parquet(out_dir)
    assert shards.count() == shuffled.count()

    print(f"raw {n_raw} -> gated {n_gated} -> exact {n_exact} "
          f"-> near-dup kept {n_kept} -> mixed {mixed.count()} "
          f"-> {shards.count()} rows in 4 shards")
    print("ALL STAGES AGREE")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
