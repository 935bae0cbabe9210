"""Text-analysis operators for large-scale training-data pipelines:
tokenization, language ID, quality scoring, token counting, document
fingerprinting (winnowing).

These extend the reference's surface (SURVEY §7 phase 5) — they are
pure Catalyst expression pipelines (no Python UDFs in the hot path), so
they scale to 100 TB: every operator is a narrow projection over the
documents table, embarrassingly parallel, no shuffle at all until a
downstream groupBy.

Determinism contract: md5 hex strings are the only hash primitive
(identical output in any engine), ratios are computed as BIGINT/BIGINT
-> DOUBLE single IEEE divisions, folds are sequential — so the DuckDB
oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word tokens: split on single spaces, drop empties (the corpus is
# space-separated); all expressions are Spark SQL via F.expr so the
# DuckDB oracle can mirror them clause by clause.
TOKENS = "filter(split(text, ' '), x -> x <> '')"


def ngram_zip_expr(n: int, empty: str = "array()") -> str:
    """Word n-gram array over a `toks` column via zip_with over
    shifted slices. NOT an index lambda on purpose: after projection
    collapse inlines the toks derivation, every `toks[i]` inside a
    transform lambda re-evaluates the split PER ELEMENT (measured
    ~9x slower on the shingle path); zip_with evaluates its array
    children once per ROW. Output strings are byte-identical to the
    concat_ws form."""
    length = f"size(toks) - {n - 1}"
    expr = f"slice(toks, 1, {length})"
    for k in range(2, n + 1):
        expr = (f"zip_with({expr}, slice(toks, {k}, {length}), "
                f"(a, b) -> concat(a, ' ', b))")
    return (f"CASE WHEN size(toks) >= {n} THEN {expr} "
            f"ELSE {empty} END")

# simple per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow source out to all cores before heavy per-row
    compute — but ONLY when the input is under-split. The fixture
    tables are single parquet files (one split = one task); a real
    100 TB corpus arrives in thousands of splits, where the old
    unconditional repartition was a full shuffle of the whole corpus
    for nothing. No-op once the input supplies at least half the
    cluster parallelism. Round-robin repartition keeps results
    row-wise deterministic."""
    if df.isStreaming:
        # micro-batches already arrive split; .rdd (the split probe)
        # is unsupported on streaming frames anyway
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Guard the probe (r13 opt 2): .rdd on a frame shaped by an
    # exchange FINALIZES the AQE plan — which RUNS every upstream
    # shuffle stage as an untracked side job (measured: 8 jobs /
    # 3.8 s re-running the whole line_dedup chain when
    # corpus_full_curation's unigram pass probed its cached input).
    # spread exists for under-split FILE SCANS, where the probe is a
    # metadata-only split count; any other plan shape keeps AQE's own
    # output sizing (callers that need a pinned-parallel cached frame
    # repartition explicitly before persisting — see
    # q_corpus_full_curation's docs2).
    if not _scan_shaped(df):
        return df
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)


# Analyzed-plan node classes whose .rdd partition probe is a
# metadata-only split count: narrow 1:1 (or leaf) nodes that can sit
# between a spread() call site and its file scan. Everything else —
# aggregates, joins, windows, sorts, set ops, repartitions, limits,
# and any node Spark adds or renames later — fails the allowlist and
# keeps the frame ungated.
_SCAN_SHAPED_NODES = frozenset({
    "LogicalRelation",           # v1 file scan (parquet)
    "DataSourceV2Relation",      # v2 scan spellings, for conf drift
    "DataSourceV2ScanRelation",
    "StreamingRelation",
    "LocalRelation",             # Arrow/local frames — probe is trivial
    "OneRowRelation",
    "Range",
    "Project",
    "Filter",
    "Generate",                  # explode: narrow, partition-preserving
    "Union",                     # splits sum over children, no exchange
    "SubqueryAlias",
    "View",
    "UnresolvedHint",
})


def _scan_shaped(df: DataFrame) -> bool:
    """True when the analyzed logical plan is a pure narrow chain over
    leaf scans — the only shape whose ``.rdd`` partition probe is a
    metadata-only split count. Fail-CLOSED allowlist walk over the JVM
    node classes (r14, VERDICT r13 item 7 + ADVICE): the r13 regex
    over ``analyzed().toString()`` failed OPEN on any spelling it had
    not listed (Intersect/Except were missing outright) and would have
    silently resumed the probe's side jobs had Spark renamed a node.
    An unknown node, or a subquery anywhere (a scalar/IN subquery in a
    Filter hides its own exchanges), gates the frame. The walk is over
    ``analyzed()`` — cache substitution happens later (withCachedData),
    so a persisted-but-scan-shaped frame keeps its fan-out, exactly as
    the r13 gate behaved."""
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() not in _SCAN_SHAPED_NODES:
            return False
        if node.subqueries().nonEmpty():
            return False
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return True


def with_tokens(docs: DataFrame) -> DataFrame:
    return spread(docs).withColumn("toks", F.expr(TOKENS))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letters runs,
    digit runs, single punctuation — the pre-tokenizer shape most BPE
    vocabularies assume)."""
    return with_tokens(docs).select(
        "doc_id",
        F.expr("size(toks)").alias("n_ws_tokens"),
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
            .alias("n_bpe_tokens"),
        F.expr("length(text)").alias("n_chars_measured"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals: token count, mean token length,
    stopword ratio, non-alpha ratio — the standard cheap filters a
    pretraining pipeline applies before expensive dedup."""
    en = ",".join(f"'{w}'" for w in STOPWORDS["en"])
    return with_tokens(docs).select(
        "doc_id",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr("CAST(length(replace(text, ' ', '')) AS DOUBLE)"
               " / CAST(size(toks) AS DOUBLE)").alias("mean_token_len"),
        F.expr(f"CAST(size(filter(toks, t -> t IN ({en}))) AS DOUBLE)"
               " / CAST(size(toks) AS DOUBLE)").alias("stopword_ratio"),
        F.expr("CAST(size(regexp_extract_all(text, '[^a-z ]', 0)) AS DOUBLE)"
               " / CAST(length(text) AS DOUBLE)").alias("non_alpha_ratio"),
    )


def lang_scores() -> list[tuple[str, str]]:
    """(lang, spark-sql count expression) per language."""
    out = []
    for lang, words in STOPWORDS.items():
        lst = ",".join(f"'{w}'" for w in words)
        out.append((lang, f"size(filter(toks, t -> t IN ({lst})))"))
    return out


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID with deterministic ties (score desc,
    then lang asc). Emits the winning language per document."""
    df = with_tokens(docs)
    for lang, expr in lang_scores():
        df = df.withColumn(f"score_{lang}", F.expr(expr))
    # argmax via greatest + chained CASE (ties -> alphabetical lang)
    langs = sorted(STOPWORDS)
    best: Column = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return df.select("doc_id", "lang",
                     pred.alias("pred_lang"),
                     best.alias("best_score"))


def normalize_text(docs: DataFrame) -> DataFrame:
    """Cleaning pass every pretraining pipeline runs before analysis:
    strip control/non-printable bytes, collapse whitespace runs, trim —
    with audit counts so upstream corruption is observable (no silent
    mutation). Pure regexp projections, zero shuffles; the character
    classes are ASCII-range so Java and RE2 regex dialects agree."""
    stripped = F.regexp_replace("text", "[\\x00-\\x1f\\x7f]", "")
    collapsed = F.trim(F.regexp_replace(stripped, " {2,}", " "))
    return docs.select(
        "doc_id",
        collapsed.alias("clean_text"),
        (F.length("text") - F.length(stripped)).alias("n_ctrl_removed"),
        (F.length(stripped) - F.length(collapsed)).alias("n_ws_collapsed"),
        (F.length("text") > F.length(collapsed)).alias("was_dirty"))


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText-style repetition filters: the most frequent
    word's share of the document and the duplicate word-bigram
    fraction (Rae et al. 2021 §A1.1 'repetitious text' — documents
    dominated by one token or by repeated n-grams are low-quality
    boilerplate/spam).

    Pure per-row array expressions: no explode, no shuffle, bounded by
    document length (top-word count is O(distinct·n) per doc — fine for
    bounded-length documents; corpus-scale cost stays linear in total
    tokens). Clause-by-clause mirrorable in DuckDB list functions.
    """
    bigrams = ngram_zip_expr(2)
    top_cnt = ("array_max(transform(array_distinct(toks), "
               "w -> size(filter(toks, x -> x = w))))")
    return (with_tokens(docs)
            .withColumn("bi", F.expr(bigrams))
            .select(
                "doc_id",
                F.expr("size(toks)").alias("n_words"),
                F.expr(f"CAST({top_cnt} AS DOUBLE) / CAST(size(toks) AS DOUBLE)")
                    .alias("top_word_frac"),
                F.expr("CASE WHEN size(bi) > 0 THEN "
                       "CAST(size(bi) - size(array_distinct(bi)) AS DOUBLE)"
                       " / CAST(size(bi) AS DOUBLE) ELSE 0.0 END")
                    .alias("dup_bigram_frac"))
            .withColumn("is_repetitive",
                        (F.col("top_word_frac") > 0.2)
                        | (F.col("dup_bigram_frac") > 0.3)))


def fingerprints(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints: md5 over character k-grams,
    minimum per sliding window of w, distinct per doc. The standard
    near-dup/plagiarism fingerprint (Schleimer et al., SIGMOD'03).

    Shape: posexplode the k-gram hashes, then a per-doc row window
    [pos, pos+w-1] minimum. Each k-gram is hashed exactly ONCE — an
    array-lambda formulation gets its k-gram array inlined by
    CollapseProject into every window evaluation (O(n^2) digests per
    doc; measured 30x slower) — and rows never hold the whole doc's
    hash array, so memory stays bounded for huge documents."""
    from pyspark.sql import Window
    kg = (f"CASE WHEN length(text) >= {k} THEN "
          f"transform(sequence(1, length(text) - {k} + 1), i -> md5(substring(text, i, {k}))) "
          f"ELSE array(md5(text)) END")
    exploded = spread(docs).select(
        "doc_id", F.posexplode(F.expr(kg)).alias("pos", "kh"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    w_doc = Window.partitionBy("doc_id")
    return (exploded
            .withColumn("fp", F.min("kh").over(win))
            .withColumn("_max_pos", F.max("pos").over(w_doc))
            # windows start at pos 0..n-w; a doc shorter than w keeps
            # its single clipped window (= min of all its k-grams)
            .filter((F.col("pos") <= F.col("_max_pos") - (w - 1))
                    | (F.col("pos") == 0))
            .select("doc_id", F.col("fp").alias("fingerprint"))
            .distinct())
