"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data pipeline staples, designed for 100 TB.

Scale design:
- exact dedup is one hash-groupBy (map-side combinable);
- MinHash/LSH turns the O(n^2) pair problem into per-(band, bucket)
  self-joins — the shuffle is keyed on the band hash, so skew is
  bounded by bucket size, not corpus size;
- SimHash pairs join on 8-bit chunk equality (pigeonhole: hamming<=3
  over 32 bits guarantees one equal chunk);
- everything is Catalyst expressions (md5 / transform / aggregate):
  no Python in the hot path, whole-stage codegen end to end.

Determinism: md5 hex strings as the hash primitive and *string* mins
for the signatures, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import managed_persist
from .text import TOKENS

# word 3-gram shingles over whitespace tokens (fallback: whole text)
SHINGLES = (
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
    "ELSE array(text) END"
)


def with_shingles(docs: DataFrame) -> DataFrame:
    return (docs.withColumn("toks", F.expr(TOKENS))
                .withColumn("shingles", F.expr(SHINGLES)))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate clusters by content hash: every doc mapped to its
    cluster representative (min doc_id with identical text) + cluster
    size. One shuffle on the 128-bit content hash."""
    hashed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    clusters = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return (hashed.join(clusters, "content_hash")
            .select("doc_id", "canonical_id", "cluster_size"))


def minhash_signatures(docs: DataFrame, k: int = 12) -> DataFrame:
    """k-permutation MinHash signature per doc.

    One md5 per shingle; permutation j orders shingles by an 8-hex-char
    slice of that digest at offset (j*5 mod 24) — k near-independent
    orderings for the price of a single digest pass (12x fewer md5
    calls than hashing per permutation; at 100 TB the signature pass is
    the dominant linear cost). The signature element is the
    *lexicographic min* slice — an order statistic identical in any
    engine."""
    # one digest per shingle inline (shingle vocab is nearly as large
    # as the corpus, so a distinct+join would shuffle more than it
    # saves — unlike simhash's word vocab); k orderings via substring
    # slices of that digest.
    base = "transform(shingles, s -> md5(s))"
    sig = (f"transform(sequence(0, {k - 1}), "
           f"j -> array_min(transform(base_hashes, "
           f"h -> substring(h, 1 + (j * 5) % 24, 8))))")
    return (with_shingles(docs)
            .withColumn("base_hashes", F.expr(base))
            .withColumn("sig", F.expr(sig))
            .select("doc_id", "sig"))


def minhash_lsh_pairs(docs: DataFrame, k: int = 12, bands: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH + exact-signature
    similarity estimate (fraction of agreeing minhashes).

    rows-per-band r = k/bands; collision threshold ~ (1/bands)^(1/r).
    """
    r = k // bands
    sigs = minhash_signatures(docs, k)
    band_exprs = []
    for b in range(bands):
        parts = ", ".join(f"sig[{b * r + j}]" for j in range(r))
        band_exprs.append(f"named_struct('band', {b}, 'key', md5(concat({parts})))")
    exploded = (sigs
                .withColumn("band", F.explode(F.expr(f"array({', '.join(band_exprs)})")))
                .select("doc_id", "sig",
                        F.col("band.band").alias("band"),
                        F.col("band.key").alias("bucket")))
    # materialize once: both sides of the self-join would otherwise
    # recompute the whole tokenize->shingle->signature pipeline (2x
    # scan cost; at 100 TB you persist signatures to a table instead).
    exploded = managed_persist(exploded)
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sig").alias("sig_a"),
                     F.col("b.sig").alias("sig_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    est = (f"CAST(size(filter(sequence(0, {k - 1}), j -> sig_a[j] = sig_b[j])) AS DOUBLE)"
           f" / CAST({k} AS DOUBLE)")
    return pairs.select("doc_a", "doc_b", F.expr(est).alias("est_jaccard"))


SIMHASH_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash over word unigrams: bit p is the sign of the sum
    of +-1 votes, where token t votes by bit p of md5(t) (hex digit p's
    top bit). Emitted as a '0'/'1' string so engines agree exactly.

    Shape: explode tokens -> hash each DISTINCT token once -> join the
    per-token vote vector back -> one map-side-combinable aggregation.
    Digest cost scales with vocabulary size; the per-bit sums are
    commutative integer adds, so the result is engine-exact."""
    from .text import with_tokens
    ex = with_tokens(docs).select("doc_id", F.explode("toks").alias("t"))
    vocab = ex.select("t").distinct().withColumn("h", F.md5("t"))
    joined = ex.join(vocab, "t")
    sums = joined.groupBy("doc_id").agg(*[
        F.sum(F.when(F.substring("h", p, 1) >= "8", 1).otherwise(-1))
         .alias(f"_s{p}")
        for p in range(1, SIMHASH_BITS + 1)])
    bits = F.concat(*[
        F.when(F.col(f"_s{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(1, SIMHASH_BITS + 1)])
    return sums.select("doc_id", bits.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup candidates: docs sharing any of the four 8-bit simhash
    chunks (pigeonhole guarantee for hamming <= 3; wider distances are
    still *candidates*), filtered to hamming <= max_hamming."""
    sh = simhash(docs)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(F.expr(
            "transform(sequence(0, 3), c -> "
            "named_struct('chunk', c, 'key', substring(simhash, c * 8 + 1, 8)))"
        )).alias("ck"))
    chunks = chunks.select("doc_id", "simhash",
                           F.col("ck.chunk").alias("chunk"),
                           F.col("ck.key").alias("key"))
    chunks = managed_persist(chunks)
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    hamming = (f"size(filter(sequence(1, {SIMHASH_BITS}), "
               f"p -> substring(sh_a, p, 1) <> substring(sh_b, p, 1)))")
    return (pairs.withColumn("hamming", F.expr(hamming))
                 .filter(F.col("hamming") <= max_hamming)
                 .select("doc_a", "doc_b", "hamming"))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact word-3-gram Jaccard over candidate pairs that share their
    global MinHash minimum (single-permutation candidate generation) —
    the cheap exact-verification pattern layered over LSH candidates."""
    sh = with_shingles(docs).withColumn(
        "min_shingle_hash", F.expr("array_min(transform(shingles, s -> md5(s)))")
    )
    sh = managed_persist(sh)
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (a.join(b, (F.col("a.min_shingle_hash") == F.col("b.min_shingle_hash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.shingles").alias("sh_a"),
                     F.col("b.shingles").alias("sh_b")))
    inter = "size(array_intersect(sh_a, sh_b))"
    union = "size(array_distinct(sh_a)) + size(array_distinct(sh_b)) - size(array_intersect(sh_a, sh_b))"
    jac = f"CAST({inter} AS DOUBLE) / CAST({union} AS DOUBLE)"
    return (pairs.withColumn("jaccard", F.expr(jac))
                 .filter(F.col("jaccard") >= threshold)
                 .select("doc_a", "doc_b", "jaccard"))
