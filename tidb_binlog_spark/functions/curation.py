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


# the standard pretraining-scrub targets; each pattern is supported by
# both Spark (Java regex) and DuckDB (RE2) so oracle parity holds
_PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("phone", r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction pass: mask emails / phone-ish numbers / IPv4
    addresses / SSN-shaped ids with typed placeholders, and count each
    class per document so the pipeline can gate or audit (the standard
    pre-training scrub, e.g. the C4/Dolma cleanup stage).

    Pure per-row regex projection — zero shuffle, scales as a map-only
    stage; counts come from the length delta of a sentinel-free
    replace so each class is counted on the ORIGINAL text (classes
    never cascade)."""
    out = docs.select("doc_id", "text")
    counts = []
    for name, pat in _PII_PATTERNS:
        # the SQL-literal path eats one level of backslashes; the
        # Column-API path (regexp_replace below) takes them raw
        sql_pat = pat.replace("\\", "\\\\")
        counts.append(
            F.expr(f"size(regexp_extract_all(text, '{sql_pat}', 0))")
             .alias(f"n_{name}"))
    scrubbed = F.col("text")
    for name, pat in _PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.select(
        "doc_id", *counts, scrubbed.alias("clean_text")).withColumn(
        "has_pii",
        sum(F.col(f"n_{n}") for n, _ in _PII_PATTERNS) > 0)


_URL_PATTERN = r"https?://[^\s\"'<>]+"


def url_domains(docs: DataFrame) -> DataFrame:
    """Per-document URL extraction + corpus-level domain frequency —
    the input to domain allow/block-list filtering (Common-Crawl-style
    curation). Extraction is a zero-shuffle projection; the domain
    rollup is one map-side-combinable groupBy."""
    sql_pat = _URL_PATTERN.replace("\\", "\\\\").replace("'", "\\'")
    urls = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{sql_pat}', 0)"))
         .alias("url"))
    domains = urls.select(
        "doc_id",
        F.lower(F.regexp_extract("url", r"https?://([^/:]+)", 1))
         .alias("domain"))
    return (domains.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("doc_id").alias("n_docs")))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    stride: int = 48) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the unit a
    training pipeline actually tokenizes (context-window packing,
    paragraph-granularity dedup, retrieval indexing all consume
    chunks, not whole documents).

    One chunk starts every ``stride`` tokens; each carries
    ``chunk_tokens`` tokens (the last may be shorter, and a trailing
    start that would duplicate a full earlier window is still emitted
    iff it adds tokens — start < n). Output: (doc_id, chunk_seq,
    tok_off, chunk_text, n_tokens).

    Scale shape: split + sequence + posexplode are all per-row array
    expressions — ZERO shuffles, whole-stage codegen, linear in corpus
    bytes. Stride/window are plan literals so Catalyst constant-folds
    the slice arithmetic.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.expr(
        f"sequence(0, greatest(size(_toks) - 1, 0), {stride})")
    chunk = F.expr(f"slice(_toks, tok_off + 1, {chunk_tokens})")
    return (docs
            .withColumn("_toks", toks)
            .select("doc_id",
                    F.posexplode(starts).alias("chunk_seq", "tok_off"),
                    "_toks")
            .filter(F.col("tok_off") < F.size("_toks"))
            .select("doc_id", "chunk_seq", "tok_off",
                    F.array_join(chunk, " ").alias("chunk_text"),
                    F.least(F.size("_toks") - F.col("tok_off"),
                            F.lit(chunk_tokens)).alias("n_tokens")))


def line_dedup(docs: DataFrame, line_tokens: int = 8,
               min_docs: int = 3) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/RefinedWeb dedup
    stage): lines occurring in >= ``min_docs`` DISTINCT documents are
    boilerplate (headers, nav bars, cookie banners) and are stripped
    from every document; the rest of each document survives in order.

    The corpus here carries no newlines, so a 'line' is a fixed
    non-overlapping ``line_tokens``-token window — the same shape at
    paragraph granularity, and what a chunk-level dedup consumes.

    Returns (doc_id, n_lines, n_removed, clean_text) for every doc.

    Scale shape: explode lines -> md5 -> count distinct docs per line
    hash (map-side-combinable) -> hash join back -> per-doc ordered
    re-assembly. Both shuffles key on high-cardinality columns (line
    hash, doc_id); no broadcast of the corpus, no global sort.
    """
    from .text import with_tokens
    lines_expr = (
        f"CASE WHEN size(toks) = 0 THEN array() ELSE "
        f"transform(sequence(0, CAST(ceil(size(toks) / {line_tokens}.0) "
        f"AS INT) - 1), "
        f"i -> array_join(slice(toks, i * {line_tokens} + 1, "
        f"{line_tokens}), ' ')) END")
    lines = managed_persist(
        with_tokens(docs)
        .select("doc_id", F.posexplode(F.expr(lines_expr))
                .alias("line_no", "line"))
        .withColumn("lh", F.md5("line")))
    freq = (lines.groupBy("lh")
            .agg(F.countDistinct("doc_id").alias("n_docs_with")))
    flagged = (lines.join(freq, "lh")
               .withColumn("is_boiler",
                           F.col("n_docs_with") >= min_docs))
    agg = (flagged.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("is_boiler").cast("long")).alias("n_removed"),
                # collect_list skips NULLs, so boiler lines vanish and
                # the ordered re-join rebuilds the surviving text
                F.expr("array_join(transform(sort_array(collect_list("
                       "CASE WHEN NOT is_boiler "
                       "THEN struct(line_no, line) END)), "
                       "x -> x.line), ' ')").alias("clean_text")))
    # zero-token docs have no lines to explode; the promised
    # one-row-per-doc contract still holds via the left-join fill
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                    F.coalesce("clean_text", F.lit(""))
                     .alias("clean_text")))


def deterministic_shuffle(docs: DataFrame, seed: str = "0",
                          id_col: str = "doc_id",
                          n_buckets: int = 256) -> DataFrame:
    """Seeded, replay-stable global shuffle order for training-data
    emission: position = rank of md5(seed || ':' || id) — any engine,
    any partitioning, any run produces the SAME permutation (the
    property a resumable data loader needs).

    Scale shape: NO global sort. The rank's first two hex chars give
    256 FIXED ranges (no sampled boundaries — deterministic, unlike
    repartitionByRange): within a bucket, row_number over the
    key-partitioned window; bucket offsets are a 256-row aggregate
    broadcast back. position = offset + within - 1, exactly the
    global rank.
    """
    ranked = docs.select(
        id_col,
        F.md5(F.concat(F.lit(str(seed) + ":"),
                       F.col(id_col).cast("string"))).alias("_rank"))
    bucket = F.conv(F.substring("_rank", 1, 2), 16, 10).cast("int")
    ranked = ranked.withColumn("_b", bucket % n_buckets)
    w_in = Window.partitionBy("_b").orderBy("_rank", id_col)
    counts = ranked.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (Window.orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))) \
        .select("_b", "_off")
    return (ranked
            .withColumn("_within", F.row_number().over(w_in))
            .join(F.broadcast(offsets), "_b")
            .select(id_col,
                    (F.col("_off") + F.col("_within") - 1)
                    .alias("shuffle_pos")))


def write_training_shards(docs: DataFrame, out_dir: str,
                          n_shards: int = 8,
                          budget: int = 2048,
                          seed: str = "0",
                          stratum_col: str = "lang") -> None:
    """Terminal sink of the curation pipeline: emit the corpus as
    training-ready parquet shards. Documents get the deterministic
    global shuffle order, are packed into ~``budget``-token bins per
    stratum, and land in ``n_shards`` shard directories; a data
    loader streams shard files in name order and sees a replay-stable,
    well-mixed, bin-annotated sequence.

    Shard assignment is md5-rank based (shuffle_pos % n_shards), so
    every shard holds a uniform slice of the global order — loaders
    can consume any subset of shards and still get an unbiased mix.

    Scale shape: reuses deterministic_shuffle (fixed-bucket rank) and
    pack_sequences (two-phase prefix sum); the write repartitions by
    shard id ONLY (n_shards ~ loader parallelism), and each shard file
    is internally ordered by shuffle_pos via sortWithinPartitions.
    """
    order = deterministic_shuffle(docs, seed=seed)
    bins = pack_sequences(docs, budget=budget, stratum_col=stratum_col)
    out = (docs.join(order, "doc_id").join(bins, ["doc_id", stratum_col])
           .withColumn("shard", (F.col("shuffle_pos") % n_shards)
                       .cast("int")))
    (out.repartition(n_shards, "shard")
        .sortWithinPartitions("shuffle_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir))


CDC_BASE = 131                  # polynomial base (odd, > alphabet)
CDC_MOD = 1_000_000_007         # mixing prime for the boundary test


def cdc_poly_expr(window: int, codes: str = "codes",
                  pos: str = "p") -> str:
    """Polynomial window-gram hash at character position ``pos``
    (1-based) over a precomputed char-code array ``codes``: sum of
    code(char_{p+j}) * BASE^(window-1-j), taken mod CDC_MOD. Unrolled
    (no fold state, no nested lambda) so it stays inside whole-stage
    codegen — integer multiply-adds instead of a full md5 digest per
    position (the r5 constant-factor weak spot, VERDICT r5 item 7).

    Indexing a code ARRAY matters: ``substring(text, p, 1)`` walks
    the string's bytes from the start on every call (UTF-8 offsets),
    turning the scan quadratic per document; ``element_at(codes, p)``
    is O(1). Codes are clamped to ``% 256`` when materialized
    (cdc_chunks below): ascii() returns the full Unicode codepoint,
    and an unclamped CJK char (~2e4) times BASE^7 would overflow
    int64. With codes < 256 the partial sums never exceed window *
    255 * BASE^(window-1) < 2^63 for window <= 8, so ANSI-mode Spark
    cannot overflow on ANY text."""
    if window > 8:
        raise ValueError(
            f"cdc_poly_expr unrolls without intermediate mods; "
            f"window={window} > 8 would overflow int64 — extend via a "
            f"Horner fold with per-step mods if larger windows are needed")
    terms = " + ".join(
        f"element_at({codes}, {pos} + {j}) * "
        f"CAST({CDC_BASE ** (window - 1 - j)} AS BIGINT)"
        for j in range(window))
    return f"(({terms}) % {CDC_MOD})"


def cdc_chunks(docs: DataFrame, window: int = 8,
               zero_digits: int = 1,
               passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER any
    position whose ``window``-gram polynomial hash is 0 mod
    16^zero_digits (boundary probability 16^-zero_digits, expected
    chunk length ~16^zero_digits chars). Unlike fixed-size chunking,
    an insertion early in a document only perturbs the chunks around
    it — the locality property dedup storage (and chunk-level
    near-dup) relies on.

    Returns (doc_id, chunk_no, start, chunk_len, chunk_md5), chunks
    covering the document exactly. ``passthrough`` names extra doc
    columns to carry onto every chunk row — cheaper than re-joining
    the (much larger) chunk frame back to docs on doc_id when a
    consumer needs e.g. ``source`` (the r9 100x sweep measured that
    join + persist as most of corpus_chunk_savings' 64x ratio).

    Scale shape: boundary detection + chunk emission are per-row
    array expressions over character positions — no data shuffle
    (spread only fans out pathologically-few input splits), linear in
    corpus bytes, same family as winnowing fingerprints. The char
    codes are materialized ONCE per doc into an array (O(1) lookups;
    per-position substring would re-walk the string's UTF-8 bytes);
    the boundary test is pure integer arithmetic (cdc_poly_expr); md5
    survives only as the one-per-chunk content digest.
    """
    from .text import spread
    divisor = 16 ** zero_digits
    poly = cdc_poly_expr(window)
    bounds = (
        f"CASE WHEN length(text) <= {window} THEN array(length(text)) "
        f"ELSE concat(filter(transform("
        f"sequence(1, length(text) - {window}), "
        f"p -> IF({poly} % {divisor} = 0, p + {window} - 1, -1)), "
        # a candidate at the exact end would duplicate the appended
        # final boundary; exclude it so the list is strictly increasing
        f"x -> x > 0 AND x < length(text)), "
        f"array(length(text))) END")
    starts = ("transform(bnds, (b, i) -> "
              "named_struct('chunk_no', i, "
              "'start', IF(i = 0, 1, bnds[i-1] + 1), "
              "'stop', b))")
    extra = list(passthrough)
    return (spread(docs)
            .withColumn("codes",
                        F.expr("transform(split(text, ''), "
                               "ch -> ascii(ch) % 256)"))
            .withColumn("bnds", F.expr(bounds))
            .select("doc_id", "text", *extra,
                    F.explode(F.expr(starts)).alias("c"))
            .filter(F.col("c.stop") >= F.col("c.start"))
            .select("doc_id", *extra,
                    F.col("c.chunk_no").alias("chunk_no"),
                    F.col("c.start").alias("start"),
                    (F.col("c.stop") - F.col("c.start") + 1)
                    .alias("chunk_len"),
                    F.expr("md5(substring(text, c.start, "
                           "c.stop - c.start + 1))").alias("chunk_md5")))


def mix_to_weights(docs: DataFrame, weights: dict[str, float],
                   stratum_col: str = "lang",
                   key_col: str = "doc_id",
                   seed: str = "mix") -> DataFrame:
    """Down-sample strata to hit an exact target mixture (the
    domain-reweighting step of training-data recipes — e.g. The Pile's
    per-source epochs or DoReMi-style domain weights, applied as a
    one-pass deterministic selection).

    Given target proportions ``weights`` (relative; normalized here),
    the achievable total is pinned by the scarcest stratum:
    ``scale = min_s(n_s / w_s)`` and each stratum keeps its first
    ``floor(w_s * scale)`` documents ordered by md5 ticket — so the
    output mixture matches ``weights`` to integer rounding, no stratum
    is over-drawn, and the draw is replay-stable under reshuffling
    (ticket depends only on seed + key). Strata not in ``weights``
    contribute nothing. A WEIGHTED stratum absent from the corpus pins
    ``min_s(n_s / w_s)`` to 0 — the target mixture is unachievable and
    the output is EMPTY rather than silently renormalized to whatever
    strata happen to exist (check the per-stratum ``k_target`` caps
    when diagnosing; an all-zero cap column means a missing stratum).

    Scale: stratum counts are a tiny map-side-combinable aggregate;
    caps broadcast back; the per-stratum selection is ONE rank window
    keyed on the stratum (the standard top-k-per-group shape). For a
    corpus where one stratum holds most rows, swap the rank window for
    a two-phase ticket-threshold draw; at benchmark strata counts the
    single window is the exact, simplest plan.
    """
    total_w = sum(weights.values())
    norm = {k: v / total_w for k, v in sorted(weights.items())}
    spark = docs.sparkSession
    from ..localrel import local_df
    wdf = local_df(
        spark,
        [(k, v) for k, v in norm.items()], f"{stratum_col} string, w double")
    counts = docs.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_stratum"))
    # LEFT join from the weights side: a weighted stratum with no
    # corpus rows must keep its row (n=0 -> ratio 0 -> scale 0), not
    # vanish and let the mixture drift to the remaining strata
    capped = (wdf.join(counts, stratum_col, "left")
              .withColumn("n_stratum",
                          F.coalesce(F.col("n_stratum"), F.lit(0)))
              .withColumn("_ratio", F.col("n_stratum") / F.col("w")))
    scale = capped.agg(F.min("_ratio").alias("_scale"))
    caps = (capped.crossJoin(F.broadcast(scale))
            .select(stratum_col, "n_stratum",
                    F.floor(F.col("w") * F.col("_scale"))
                     .cast("long").alias("k_target")))
    ticket = F.md5(F.concat(F.lit(seed + ":"),
                            F.col(key_col).cast("string")))
    w_rank = Window.partitionBy(stratum_col).orderBy("_ticket", key_col)
    return (docs.join(F.broadcast(caps), stratum_col)
            .withColumn("_ticket", ticket)
            .withColumn("_rk", F.row_number().over(w_rank))
            .filter(F.col("_rk") <= F.col("k_target"))
            .select(key_col, stratum_col, "n_stratum", "k_target"))


def split_bounds(fractions: dict[str, float] | None) -> list[tuple[str, str]]:
    """(name, hex upper bound) ranges for split_corpus — ONE place
    computes the cumulative-threshold arithmetic so the Spark operator
    and its DuckDB oracle can never diverge on boundary tickets."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    bounds: list[tuple[str, str]] = []
    cum = 0.0
    for name, frac in fractions.items():     # insertion order = ranges
        cum += frac / total
        bounds.append((name, format(min(int(cum * 2**32), 2**32 - 1),
                                    "08x")))
    return bounds


def split_corpus(docs: DataFrame,
                 fractions: dict[str, float] | None = None,
                 key_col: str = "doc_id",
                 seed: str = "split") -> DataFrame:
    """Deterministic disjoint train/val/test assignment: the first 8
    hex chars of md5(seed:key) place each doc on [0, 2^32); cumulative
    fraction boundaries become hex thresholds, and the label is the
    first range containing the ticket. Replay-stable (depends only on
    seed + key), leak-proof (a doc can never change split when the
    corpus grows), zero shuffles — a pure projection any engine
    reproduces exactly."""
    bounds = split_bounds(fractions)
    ticket = F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))),
        1, 8)
    # ascending when-chain: the FIRST upper bound at or above the
    # ticket wins; the last range catches the tail
    expr = None
    for name, upper in bounds[:-1]:
        cond = ticket <= F.lit(upper)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = (expr.otherwise(bounds[-1][0]) if expr is not None
             else F.lit(bounds[-1][0]))
    return docs.select(key_col, label.alias("split"))


def weighted_sample(docs: DataFrame, weight_col: str, k: int,
                    stratum_col: str | None = None,
                    key_col: str = "doc_id",
                    seed: str = "ws") -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): u = (hex32(md5(seed:key)) + 1) / 2^32
    in (0, 1], rank key ln(u) / w, keep the k largest per stratum —
    inclusion probability proportional to weight, replay-stable (no
    RNG), identical on any engine.

    Scores quantize to integer micro-units BEFORE ranking (the BM25 /
    LM-surprisal convention) so both engines order identical integers;
    ties break on the sample key. Weights must be > 0.

    Scale shape: one window keyed on the stratum (rank <= k filter);
    for a single gigantic stratum the documented swap is a two-phase
    threshold draw — sample score quantiles, broadcast the k-th
    threshold, filter, exact-rank only the boundary — same result
    shape, no full-stratum sort.
    """
    part = [stratum_col] if stratum_col else []
    h = (F.conv(F.substring(
            F.md5(F.concat(F.lit(seed + ":"),
                           F.col(key_col).cast("string"))), 1, 8),
         16, 10).cast("long"))
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    score = F.floor(F.log(u) / F.col(weight_col) * 1_000_000) \
        .cast("long")
    w = Window.partitionBy(*part).orderBy(
        F.desc("score_micro"), F.col(key_col))
    return (docs.withColumn("score_micro", score)
            .withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k))


def temperature_mix(docs: DataFrame, budget: int, alpha: float = 0.7,
                    stratum_col: str = "lang",
                    key_col: str = "doc_id",
                    seed: str = "tmix") -> DataFrame:
    """Temperature-based mixture sampling (the mT5 / multilingual-LM
    alpha-sampling staple): stratum s draws k_s = min(n_s,
    (budget * n_s^alpha) / sum_t n_t^alpha) documents — alpha < 1
    upweights small strata relative to their natural share, alpha = 1
    reproduces proportional sampling. Complements mix_to_weights
    (explicit targets) with the power-law recipe.

    Determinism/parity: n_s^alpha is quantized to MICRO-units per
    stratum BEFORE the cap arithmetic, so every k_s is an exact
    integer expression over BIGINTs (the pow/ln-then-floor contract
    scoring.py already relies on); the draw itself is the md5-ticket
    rank (replay-stable, engine-exact, no RNG).

    Scale: the stratum-count aggregate is tiny (#strata rows); its
    total joins back via broadcast (no global window over data); the
    per-stratum rank window partitions on the stratum like every
    other sampler here.

    Returns (doc_id, stratum, n_stratum, k_target, sample_rank) for
    the kept documents.
    """
    counts = (docs.groupBy(stratum_col)
              .agg(F.count(F.lit(1)).alias("n_stratum"))
              .withColumn("q_micro",
                          F.expr(f"CAST(FLOOR(POWER(CAST(n_stratum AS "
                                 f"DOUBLE), {alpha}) * 1000000.0) AS "
                                 f"BIGINT)")))
    # cap arithmetic runs DRIVER-side over the tiny per-stratum rows:
    # budget * q_micro can exceed int64 at web scale (1e9 budget x
    # 4e14 micro-weight), and Python/DuckDB-HUGEINT integer math stays
    # exact where a Spark BIGINT expression would overflow
    stat_rows = counts.collect()
    q_total = sum(r["q_micro"] for r in stat_rows)
    from ..localrel import local_df
    caps = local_df(
        docs.sparkSession,
        [(r[stratum_col], r["n_stratum"],
          min(r["n_stratum"], (int(budget) * r["q_micro"]) // q_total))
         for r in stat_rows],
        f"{stratum_col} string, n_stratum long, k_target long")
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(seed),
                          F.col(key_col).cast("string"))),
        F.col(key_col))
    ranked = (docs.select(key_col, stratum_col)
              .withColumn("sample_rank", F.row_number().over(w)))
    return (ranked.join(F.broadcast(caps), stratum_col)
            .filter(F.col("sample_rank") <= F.col("k_target"))
            .select(key_col, F.col(stratum_col).alias("stratum"),
                    "n_stratum", "k_target", "sample_rank"))


def gate_report(docs: DataFrame, min_tokens: int = 30,
                max_stopword_ratio: float = 0.45,
                max_non_alpha: float = 0.2,
                allowed_langs: tuple[str, ...] = ("en", "es")
                ) -> DataFrame:
    """Explainable filtering: every document with its gating verdict
    AND the reasons — the audit surface a curation pipeline needs
    before dropping data (per-reason counts tell you which gate is
    doing the cutting; a doc-level sample tells you whether it cuts
    the right things). Composes the existing quality/lang signals as
    pure projections + one doc-keyed join; reasons render as a
    fixed-order comma-joined string (engine-stable, no array-hash
    ambiguity).

    Returns (doc_id, pred_lang, n_tokens, passed, n_failed,
    fail_reasons)."""
    from .text import lang_id, quality_score
    q = quality_score(docs)
    lid = lang_id(docs).select("doc_id", "pred_lang")
    j = q.join(lid, "doc_id")
    checks = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("stopword_heavy", F.col("stopword_ratio") > max_stopword_ratio),
        ("non_alpha_heavy", F.col("non_alpha_ratio") > max_non_alpha),
        ("lang_blocked", ~F.col("pred_lang").isin(*allowed_langs)),
    ]
    reasons = F.concat_ws(",", *[
        F.when(cond, F.lit(name)) for name, cond in checks])
    # NULL-safe: a NULL condition (e.g. 0/0 stopword_ratio on an empty
    # doc) counts as not-failed, matching the oracle's CASE...ELSE 0
    n_failed = sum(F.coalesce(cond, F.lit(False)).cast("int")
                   for _, cond in checks)
    return j.select("doc_id", "pred_lang", "n_tokens",
                    (reasons == "").alias("passed"),
                    n_failed.alias("n_failed"),
                    reasons.alias("fail_reasons"))


def retrieve_pack(docs: DataFrame, topk: DataFrame,
                  budget_tokens: int = 192) -> DataFrame:
    """RAG context assembly over a retrieval result: per query, drop
    retrieved documents whose TEXT duplicates a better-ranked hit
    (exact md5 content dedup — near-dup retrieval results are the
    norm on crawled corpora), then greedily pack the survivors in
    rank order until the token budget is exhausted. The end-to-end
    retrieve -> dedup -> pack step every retrieval-augmented pipeline
    runs between the index and the prompt.

    ``topk`` is any (query_id, doc_id, rank) frame (tfidf_topk,
    ann top-k, ...); returns (query_id, doc_id, rank, n_tokens,
    cum_tokens) for the packed context, cum_tokens exact.

    Scale shape: one doc-keyed join to fetch (hash, length) metadata,
    then two windows BOTH partitioned per query (dup rank, running
    token sum) — per-query state only, never a corpus-wide window.
    """
    from .text import with_tokens
    meta = with_tokens(docs).select(
        "doc_id", F.md5("text").alias("thash"),
        F.expr("size(toks)").alias("n_tokens"))
    j = topk.join(meta, "doc_id")
    w_dup = Window.partitionBy("query_id", "thash").orderBy("rank")
    dd = (j.withColumn("dup_rn", F.row_number().over(w_dup))
          .filter(F.col("dup_rn") == 1))
    w_pack = (Window.partitionBy("query_id").orderBy("rank")
              .rowsBetween(Window.unboundedPreceding, 0))
    return (dd.withColumn("cum_tokens", F.sum("n_tokens").over(w_pack))
            .filter(F.col("cum_tokens") <= budget_tokens)
            .select("query_id", "doc_id", "rank", "n_tokens",
                    "cum_tokens"))


def url_canonical_dedup(docs: DataFrame) -> DataFrame:
    """URL-keyed deduplication report: extract every URL, canonicalize
    (lowercase host + path, query string / fragment / trailing slash
    stripped), and roll up per canonical URL — the crawl-frontier
    dedup step that collapses `http://ex.net/q?x=1` with
    `http://ex.net/q?x=2` before any content fetch or text dedup
    runs. Returns (canon_url, n_occurrences, n_raw_variants, n_docs,
    canonical_doc = lowest doc_id carrying it).

    Scale shape: zero-shuffle extraction/canonicalization projection,
    then ONE canon-keyed aggregate (map-side combinable; countDistinct
    expands to two phases on the same key). The canonical key is the
    natural partition key for a crawl store, so at scale this
    aggregate co-locates with the frontier's own layout.
    """
    sql_pat = _URL_PATTERN.replace("\\", "\\\\").replace("'", "\\'")
    urls = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{sql_pat}', 0)"))
         .alias("url"))
    canon = (F.concat(
        F.lower(F.regexp_extract("url", r"https?://([^/\s?#]+)", 1)),
        F.regexp_replace(
            F.regexp_extract("url", r"https?://[^/\s?#]+([^?#\s]*)", 1),
            r"/$", "")))
    return (urls.withColumn("canon_url", canon)
            .groupBy("canon_url")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct("url").alias("n_raw_variants"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min("doc_id").alias("canonical_doc")))


def budget_select(docs: DataFrame, budget_tokens: int = 2_000,
                  by: str = "source") -> DataFrame:
    """Quality-ranked token-budget selection (the DCLM/FineWeb "take
    the best documents until the token budget is full" recipe): score
    every doc with the hashed linear classifier, rank within each
    stratum by score (desc, doc_id tiebreak), and admit greedily while
    the stratum's cumulative token count stays within budget — a doc
    is admitted iff the running total INCLUDING it fits.

    Scale shape: the classifier is one explode + doc-keyed sum; the
    admission is ONE stratum-keyed prefix-sum window (rows, not
    range). No global sort, no driver loop; strata fill in parallel.
    All-integer (exact classifier scores, exact token counts), so the
    selection is engine-reproducible.

    Returns admitted docs: (doc_id, stratum, score_num, n_tokens,
    cum_tokens).
    """
    from .scoring import hashed_linear_score
    scored = (hashed_linear_score(docs)
              .join(docs.select("doc_id", F.col(by).alias("stratum")),
                    "doc_id"))
    w = (Window.partitionBy("stratum")
         .orderBy(F.col("score_num").desc(), "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (scored
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget_tokens)
            .select("doc_id", "stratum", "score_num", "n_tokens",
                    "cum_tokens"))


def gate_sweep(docs: DataFrame, n_bins: int = 10,
               bin_width: int = 200) -> DataFrame:
    """Threshold-sweep curve for a quality gate: for each candidate
    classifier threshold, how many docs and tokens survive — the
    audit a curation run reads BEFORE fixing its gate (one pass, every
    threshold at once, instead of re-running the pipeline per
    candidate).

    Scores come from the hashed linear classifier (swap in a learned
    model without changing the plan); thresholds are fixed-width bins
    clamped to [0, n_bins-1]. Shape: one score pass + one tiny
    (n_bins-row) aggregate + ONE cumulative window over those n_bins
    rows — the corpus is scanned once, the sweep itself is free."""
    from pyspark.sql import Window
    from .scoring import hashed_linear_score
    scored = hashed_linear_score(docs)
    binned = scored.withColumn(
        "bin", F.expr(f"greatest(CAST(0 AS BIGINT), least("
                      f"CAST({n_bins - 1} AS BIGINT), "
                      f"score_num DIV {bin_width}))"))
    per = (binned.groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens")))
    # survivors at threshold t = docs in bins >= t: a suffix sum over
    # the n_bins aggregated rows (unpartitioned window over <= n_bins
    # rows — never data-sized)
    w = (Window.orderBy(F.desc("bin"))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (per.withColumn("docs_kept", F.sum("n_docs").over(w))
            .withColumn("tokens_kept", F.sum("n_tokens").over(w))
            .select(F.expr(f"bin * {bin_width}").alias("threshold"),
                    "n_docs", "n_tokens", "docs_kept", "tokens_kept"))


def semantic_chunks(docs: DataFrame, w: int = 8,
                    threshold_micro: int = 200_000) -> DataFrame:
    """TextTiling-style semantic chunking: split a document where the
    vocabulary shifts — the boundary score at token position p is the
    Jaccard overlap of the w-token windows before/after p; positions
    scoring below ``threshold_micro`` (micro-quantized) become chunk
    breaks. The long-document splitting primitive that respects topic
    boundaries where fixed-size windows (chunk_documents) cut
    mid-thought.

    Zero-shuffle: boundaries, spans and chunk digests are all array
    expressions per document (same plan family as cdc_chunks); the
    Jaccard is exact integer micro-division, and the intersection /
    union are spelled with the SAME distinct+contains formula on both
    engines (array_intersect's dedup semantics differ subtly)."""
    from .text import with_tokens
    # boundary scoring runs on 48-bit md5 token ids, hashed ONCE per
    # document (integer window ops instead of per-position string
    # slicing/distinct — this row was 28.6 s of the sf0.1 bench as
    # string expressions, the cdc_chunks digest-per-position disease).
    # Both engines hash with the same formula, so the boundary sets
    # stay engine-identical by construction; chunk_md5 still digests
    # the real token strings.
    hs = ("transform(toks, t -> CAST(conv(substring(md5(t), 1, 12), "
          "16, 10) AS BIGINT))")
    # one struct per position: L = distinct left window (built once),
    # R = raw right window; inter/uni then reuse them
    wins = (f"transform(sequence({w}, size(toks) - {w}), "
            f"p -> named_struct("
            f"'p', p, "
            f"'L', array_distinct(slice(hs, p - {w} + 1, {w})), "
            f"'R', slice(hs, p + 1, {w})))")
    inter = "size(filter(e.L, x -> array_contains(e.R, x)))"
    uni = f"(size(e.L) + size(array_distinct(e.R)) - {inter})"
    bnds = (f"CASE WHEN size(toks) <= {2 * w} THEN array(size(toks)) "
            f"ELSE concat(filter(transform({wins}, "
            f"e -> IF((CAST({inter} AS BIGINT) * 1000000) DIV {uni} "
            f"< {threshold_micro}, e.p, -1)), x -> x > 0), "
            f"array(size(toks))) END")
    # boundary positions are strictly increasing and all < size(toks),
    # so the list is duplicate-free by construction (no distinct —
    # DuckDB's list_distinct does not guarantee order)
    # managed_persist is a CORRECTNESS-OF-COST barrier here, not a
    # cache: the five chunk columns below each reference bnds, and
    # projection collapse would inline the whole boundary scan into
    # EVERY reference of EVERY exploded row (measured 26 s at sf0.1;
    # the persisted plan is ~1 s)
    from ..cache import managed_persist
    b = managed_persist(
        with_tokens(docs)
        .filter(F.expr("size(toks) >= 1"))
        .withColumn("hs", F.expr(hs))
        .select("doc_id", "toks", F.expr(bnds).alias("bnds")))
    e = b.select(
        "doc_id", "toks", "bnds",
        F.expr("explode(sequence(1, size(bnds)))").alias("i"))
    return (e.select(
        "doc_id",
        F.expr("CAST(i - 1 AS INT)").alias("chunk_no"),
        F.expr("IF(i = 1, 1, bnds[i - 2] + 1)").alias("start_tok"),
        F.expr("bnds[i - 1]").alias("end_tok"),
        F.expr("bnds[i - 1] - IF(i = 1, 1, bnds[i - 2] + 1) + 1")
         .alias("n_tokens"),
        F.expr("md5(concat_ws(' ', slice(toks, "
               "IF(i = 1, 1, bnds[i - 2] + 1), "
               "bnds[i - 1] - IF(i = 1, 1, bnds[i - 2] + 1) + 1)))")
         .alias("chunk_md5"))
        .filter(F.col("n_tokens") >= 1))
