"""DuckDB oracle SQL mirroring functions/{text,dedup,similarity}.py.

Each string reproduces the Spark operator's semantics clause-by-clause
in DuckDB dialect. Differences are mechanical only:
- DuckDB lists are 1-based (Spark arrays 0-based);
- generate_series(a, b) vs sequence(a, b);
- list_* names vs array_*/transform/aggregate;
- folds: DuckDB list_reduce has no init, so a 0.0 is prepended —
  0.0 + x == x exactly, so the IEEE operation order matches Spark's
  aggregate(…, 0.0, +) bit-for-bit.
"""

# shared fragments -----------------------------------------------------------

TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
    "ELSE [text] END"
)


def _dot(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip({a}, {b}), "
            f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), "
            f"(acc, v) -> acc + v)")


def _norm(a: str) -> str:
    return (f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
            f"(acc, v) -> acc + v))")


def cosine(a: str, b: str) -> str:
    return f"({_dot(a, b)}) / (({_norm(a)}) * ({_norm(b)}))"


LSH_BUCKET = (
    "array_to_string(list_transform(generate_series(0, 5), p -> "
    "CASE WHEN (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(0, 63), d -> "
    "CAST(embedding[d+1] AS DOUBLE) * "
    "(CASE WHEN substring(md5(CAST(p AS STRING) || ':' || CAST(d AS STRING)), 1, 1) >= '8' "
    "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END))), "
    "(acc, v) -> acc + v)) > 0 THEN '1' ELSE '0' END), '')"
)

# full queries ----------------------------------------------------------------

DEDUP_EXACT = """
WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
clusters AS (
  SELECT content_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS cluster_size
  FROM hashed GROUP BY content_hash)
SELECT h.doc_id, c.canonical_id, c.cluster_size
FROM hashed h JOIN clusters c USING (content_hash)
"""

_SIG = ("list_transform(generate_series(0, 11), j -> "
        "list_min(list_transform(base_hashes, "
        "h -> substring(h, 1 + (j * 5) % 24, 8))))")

def minhash_pairs_ctes(source: str = "documents") -> str:
    """The banded-MinHash candidate CTE chain over any
    (doc_id, text) source — kept as a builder so chunk-level and
    incremental variants share the exact band keys."""
    return f"""
toks AS (SELECT doc_id, text, {TOKS} AS toks FROM {source}),
sh AS (SELECT doc_id, {SHINGLES} AS shingles FROM toks),
bh AS (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS base_hashes
       FROM sh),
sigs AS (SELECT doc_id, {_SIG} AS sig FROM bh),
bands AS (
  SELECT doc_id, sig, b.band,
         md5(sig[b.band * 3 + 1] || sig[b.band * 3 + 2] || sig[b.band * 3 + 3]) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS band) b),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
"""


MINHASH_PAIRS_CTES = minhash_pairs_ctes()

DEDUP_MINHASH_LSH = f"""
WITH {MINHASH_PAIRS_CTES}
SELECT doc_a, doc_b,
  CAST(len(list_filter(generate_series(0, 11), j -> sig_a[j+1] = sig_b[j+1])) AS DOUBLE)
    / CAST(12 AS DOUBLE) AS est_jaccard
FROM pairs
"""

DEDUP_MINHASH_CLUSTERS = f"""
WITH RECURSIVE {MINHASH_PAIRS_CTES},
e0 AS (
  SELECT doc_a AS txn_id, CAST(doc_b AS STRING) AS key FROM pairs
  UNION ALL
  SELECT doc_b AS txn_id, CAST(doc_b AS STRING) AS key FROM pairs),
tk AS (SELECT DISTINCT txn_id, key FROM e0),
e AS (SELECT DISTINCT a.txn_id AS src, b.txn_id AS dst
      FROM tk a JOIN tk b ON a.key = b.key),
r AS (
  SELECT txn_id, txn_id AS label FROM (SELECT DISTINCT txn_id FROM tk)
  UNION
  SELECT e.src AS txn_id, r.label FROM r JOIN e ON e.dst = r.txn_id
)
SELECT txn_id AS doc_id, MIN(label) AS cluster_id FROM r GROUP BY txn_id
"""

# 64-bit simhash packed two-bits-per-hex-digit into ONE md5: bit p
# (1..32) = digit p's top bit (>= '8'); bit p (33..64) = digit
# (p-32)'s second bit (digit & 4, i.e. in 4567cdef)
_SIMHASH = (
    "array_to_string(list_transform(generate_series(1, 64), p -> "
    "CASE WHEN list_sum(list_transform(tok_hashes, h -> "
    "CASE WHEN (CASE WHEN p <= 32 THEN substring(h, p, 1) >= '8' "
    "ELSE list_contains(['4','5','6','7','c','d','e','f'], "
    "substring(h, p - 32, 1)) END) THEN 1 ELSE -1 END)) > 0 "
    "THEN '1' ELSE '0' END), '')"
)

_TOK_HASHES = "list_transform(toks, t -> md5(t))"

DEDUP_SIMHASH = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
th AS (SELECT doc_id, {_TOK_HASHES} AS tok_hashes FROM toks)
SELECT doc_id, {_SIMHASH} AS simhash FROM th
"""

DEDUP_SIMHASH_PAIRS = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
th AS (SELECT doc_id, {_TOK_HASHES} AS tok_hashes FROM toks),
sh AS (SELECT doc_id, {_SIMHASH} AS simhash FROM th),
chunks AS (
  SELECT doc_id, simhash, c.chunk,
         substring(simhash, c.chunk * 16 + 1, 16) AS key
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS chunk) c),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
  len(list_filter(generate_series(1, 64),
      p -> substring(sh_a, p, 1) <> substring(sh_b, p, 1))) AS hamming
FROM pairs
WHERE len(list_filter(generate_series(1, 64),
      p -> substring(sh_a, p, 1) <> substring(sh_b, p, 1))) <= 6
"""

# exact Jaccard verification over the banded-LSH candidates (same
# candidate generation as DEDUP_MINHASH_LSH)
DEDUP_NGRAM_JACCARD = f"""
WITH {MINHASH_PAIRS_CTES},
j AS (
  SELECT p.doc_a, p.doc_b, a.shingles AS sh_a, b.shingles AS sh_b
  FROM pairs p
  JOIN sh a ON p.doc_a = a.doc_id
  JOIN sh b ON p.doc_b = b.doc_id),
scored AS (
  SELECT doc_a, doc_b,
    CAST(len(list_filter(list_distinct(sh_a), x -> list_contains(sh_b, x))) AS DOUBLE)
      / CAST(len(list_distinct(sh_a)) + len(list_distinct(sh_b))
             - len(list_filter(list_distinct(sh_a), x -> list_contains(sh_b, x))) AS DOUBLE)
      AS jaccard
  FROM j)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
"""

# query set = derived fixed-size sample (~64 queries), mirroring the
# Spark side's sampled_query_mod — keeps the exact Q x N audit scan
# Theta(N) at any corpus size
ANN_COSINE_TOPK = f"""
WITH qmod AS (SELECT GREATEST(1, COUNT(*) // 64) AS m FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id % (SELECT m FROM qmod) = 0),
j AS (SELECT q.query_id, e.vec_id, {cosine('q.q_emb', 'e.embedding')} AS cosine
      FROM embeddings e, q WHERE e.vec_id <> q.query_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM j)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 10
"""

ANN_LSH_TOPK = f"""
WITH b AS (SELECT vec_id, embedding, {LSH_BUCKET} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
      FROM b WHERE vec_id % 100 = 0),
j AS (SELECT q.query_id, b.vec_id, {cosine('q.q_emb', 'b.embedding')} AS cosine
      FROM b JOIN q ON b.bucket = q.q_bucket AND b.vec_id <> q.query_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM j)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5
"""

ANN_IVF_TOPK = f"""
WITH cmod AS (
  -- sqrt(N)-derived coarse-quantizer sizing, identical to the Spark
  -- side's sqrt_centroid_mod (IEEE sqrt + integer division, exact)
  SELECT GREATEST(2, COUNT(*) // CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))
         AS m FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb
  FROM embeddings WHERE vec_id % (SELECT m FROM cmod) = 1),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {cosine('e.embedding', 'c.c_emb')} DESC, c.centroid_id) AS crank
    FROM embeddings e, cents c) t
  WHERE crank = 1),
qmod AS (SELECT GREATEST(1, COUNT(*) // 64) AS m FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id % (SELECT m FROM qmod) = 0),
probes AS (
  SELECT query_id, q_emb, centroid_id FROM (
    SELECT q.query_id, q.q_emb, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY {cosine('q.q_emb', 'c.c_emb')} DESC, c.centroid_id) AS prank
    FROM q, cents c) t
  WHERE prank <= 2),
cands AS (
  SELECT p.query_id, a.vec_id,
         {cosine('p.q_emb', 'a.embedding')} AS cosine
  FROM probes p JOIN assigned a USING (centroid_id)
  WHERE a.vec_id <> p.query_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM cands)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5
"""

# collapse-first mirror of similarity.embedding_near_dups: identical
# vectors group to a min-id representative; non-reps emit one star
# edge against their rep (cosine evaluated on the pair, so the
# threshold applies identically); the LSH pairwise join runs over
# representatives only. Bit-identical to the historical all-pairs
# form whenever no vector repeats (true of every fixture), linear
# instead of quadratic on mass-duplicate corpora.
EMBEDDING_NEAR_DUPS = f"""
WITH g AS (SELECT vec_id, embedding,
                  MIN(vec_id) OVER (PARTITION BY embedding) AS rep_id
           FROM embeddings),
member AS (
  SELECT rep_id AS vec_a, vec_id AS vec_b,
         {cosine('embedding', 'embedding')} AS cosine
  FROM g WHERE vec_id <> rep_id
    AND {cosine('embedding', 'embedding')} >= 0.3),
reps AS (SELECT vec_id, embedding FROM g WHERE vec_id = rep_id),
b AS (SELECT vec_id, embedding, {LSH_BUCKET} AS bucket FROM reps),
rp AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         {cosine('x.embedding', 'y.embedding')} AS cosine
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  WHERE {cosine('x.embedding', 'y.embedding')} >= 0.3)
SELECT vec_a, vec_b, cosine FROM rp
UNION ALL
SELECT vec_a, vec_b, cosine FROM member
"""

TEXT_TOKEN_COUNT = f"""
WITH toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
SELECT doc_id,
  len(toks) AS n_ws_tokens,
  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
  length(text) AS n_chars_measured
FROM toks
"""

_EN = "'the','and','of','to','a','in','is','it','for','on'"

TEXT_QUALITY = f"""
WITH toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
SELECT doc_id,
  len(toks) AS n_tokens,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
    AS mean_token_len,
  CAST(len(list_filter(toks, t -> list_contains([{_EN}], t))) AS DOUBLE)
    / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
  CAST(len(regexp_extract_all(text, '[^a-z ]')) AS DOUBLE)
    / CAST(length(text) AS DOUBLE) AS non_alpha_ratio
FROM toks
"""


TEXT_REPETITION = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
bi AS (SELECT doc_id, toks,
  CASE WHEN len(toks) >= 2 THEN
    list_transform(generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1])
  ELSE [] END AS bi
FROM toks)
SELECT doc_id,
  len(toks) AS n_words,
  CAST(list_max(list_transform(list_distinct(toks),
                w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
    / CAST(len(toks) AS DOUBLE) AS top_word_frac,
  CASE WHEN len(bi) > 0 THEN
    CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / CAST(len(bi) AS DOUBLE)
  ELSE 0.0 END AS dup_bigram_frac,
  (CAST(list_max(list_transform(list_distinct(toks),
                 w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
     / CAST(len(toks) AS DOUBLE) > 0.2)
  OR (CASE WHEN len(bi) > 0 THEN
        CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / CAST(len(bi) AS DOUBLE)
      ELSE 0.0 END > 0.3) AS is_repetitive
FROM bi
"""


def _lang_case(stopwords: dict[str, list[str]]) -> str:
    langs = sorted(stopwords)
    score = {lang: f"len(list_filter(toks, t -> list_contains([{', '.join(repr(w) for w in stopwords[lang])}], t)))"
             for lang in langs}
    scores_sql = ",\n  ".join(f"{score[lang]} AS score_{lang}" for lang in langs)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = best THEN '{lang}'" for lang in langs) + " END"
    return f"""
WITH toks AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
scored AS (SELECT doc_id, lang,
  {scores_sql}
FROM toks),
withbest AS (SELECT *, {best} AS best FROM scored)
SELECT doc_id, lang, {case} AS pred_lang, best AS best_score FROM withbest
"""


def text_lang_id_sql(stopwords: dict[str, list[str]]) -> str:
    return _lang_case(stopwords)


DOC_FINGERPRINT = """
WITH kg AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 8 THEN
      list_transform(generate_series(1, length(text) - 7),
                     i -> md5(substring(text, i, 8)))
    ELSE [md5(text)] END AS kgrams
  FROM documents),
wins AS (
  SELECT doc_id,
    CASE WHEN len(kgrams) >= 4 THEN
      list_transform(generate_series(0, len(kgrams) - 4),
                     j -> list_min(kgrams[j+1:j+4]))
    ELSE [list_min(kgrams)] END AS wins
  FROM kg)
SELECT DISTINCT doc_id, unnest(wins) AS fingerprint FROM wins
"""


# curation.py mirrors ---------------------------------------------------------

TEXT_CONTAMINATION = f"""
WITH bench AS (SELECT * FROM documents WHERE doc_id % 50 = 0),
corpus AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
ct AS (SELECT doc_id, text, {TOKS} AS toks FROM corpus),
csh AS (SELECT DISTINCT doc_id, unnest({SHINGLES}) AS sh
        FROM (SELECT doc_id, text, toks FROM ct)),
bt AS (SELECT doc_id, text, {TOKS} AS toks FROM bench),
bsh AS (SELECT DISTINCT unnest({SHINGLES}) AS sh
        FROM (SELECT doc_id, text, toks FROM bt)),
totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM csh GROUP BY doc_id),
hits AS (SELECT c.doc_id, COUNT(*) AS n_hits
         FROM csh c JOIN bsh b USING (sh) GROUP BY c.doc_id)
SELECT t.doc_id, t.n_shingles, h.n_hits,
       CAST(h.n_hits AS DOUBLE) / CAST(t.n_shingles AS DOUBLE)
         AS contamination
FROM totals t JOIN hits h USING (doc_id)
"""

TEXT_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE substring(md5(CAST(doc_id AS STRING)), 1, 8) <
      CASE lang WHEN 'en' THEN '80000000'
                WHEN 'es' THEN '40000000'
                ELSE '00000000' END
"""

TEXT_PACK_SEQUENCES = f"""
WITH sized AS (
  SELECT lang, doc_id, len({TOKS}) AS n_tokens FROM documents),
cum AS (
  SELECT lang, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM sized)
SELECT lang, doc_id, n_tokens,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT)
         AS bin_id
FROM cum
"""


EMBEDDING_CLUSTERS = f"""
WITH RECURSIVE
g AS (SELECT vec_id, embedding,
             MIN(vec_id) OVER (PARTITION BY embedding) AS rep_id
      FROM embeddings),
reps AS (SELECT vec_id, embedding FROM g WHERE vec_id = rep_id),
b AS (SELECT vec_id, embedding, {LSH_BUCKET} AS bucket FROM reps),
pairs AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  WHERE {cosine('x.embedding', 'y.embedding')} >= 0.3
  UNION ALL
  SELECT rep_id AS vec_a, vec_id AS vec_b FROM g
  WHERE vec_id <> rep_id
    AND {cosine('embedding', 'embedding')} >= 0.3),
e0 AS (
  SELECT vec_a AS txn_id, CAST(vec_b AS STRING) AS key FROM pairs
  UNION ALL
  SELECT vec_b AS txn_id, CAST(vec_b AS STRING) AS key FROM pairs),
tk AS (SELECT DISTINCT txn_id, key FROM e0),
e AS (SELECT DISTINCT a.txn_id AS src, b.txn_id AS dst
      FROM tk a JOIN tk b ON a.key = b.key),
r AS (
  SELECT txn_id, txn_id AS label FROM (SELECT DISTINCT txn_id FROM tk)
  UNION
  SELECT e.src AS txn_id, r.label FROM r JOIN e ON e.dst = r.txn_id
)
SELECT txn_id AS vec_id, MIN(label) AS cluster_id FROM r GROUP BY txn_id
"""


# --- scoring.py mirrors ------------------------------------------------------
# Quantization contract (see functions/scoring.py docstring): per-term
# doubles come from identical expression trees over exact integers;
# floor(x * 1e6) -> BIGINT before any cross-row sum, so aggregation
# order cannot perturb the result.

def bm25_sql(terms, k1: str = "1.2", b: str = "0.75") -> str:
    """DuckDB mirror of scoring.bm25_scores for the same term tuple —
    clause-by-clause identical arithmetic, list_* for array_*."""
    dfs = ",\n  ".join(
        f"SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END)"
        f" AS df_{i}" for i, t in enumerate(terms))
    dl = "CAST(len(toks) AS DOUBLE)"
    avgdl = "(CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for i, t in enumerate(terms):
        tf = f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)"
        idf = (f"ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
               f" / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)")
        score = (f"({idf}) * (({tf}) * ({k1} + 1.0)) / "
                 f"(({tf}) + {k1} * (1.0 - {b} + {b} * ({dl}) / {avgdl}))")
        parts.append(f"CAST(floor(({score}) * 1000000.0) AS BIGINT)")
    micro = " + ".join(parts)
    matched = " + ".join(
        f"CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END"
        for t in terms)
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
stats AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
  {dfs}
  FROM toks)
SELECT doc_id,
  CAST(({matched}) AS INT) AS n_matched_terms,
  CAST(len(toks) AS INT) AS dl,
  ({micro}) AS bm25_micro
FROM toks, stats
WHERE ({matched}) > 0
"""


def unigram_surprisal_sql(source: str = "documents") -> str:
    """The unigram-surprisal mirror over any (doc_id, text) source —
    reused by the composed corpus-curation oracle."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM {source}),
exploded AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
totals AS (SELECT COUNT(*) AS total_tokens FROM exploded),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM exploded GROUP BY tok),
scored AS (SELECT tok,
    CAST(floor(-ln(CAST(cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE))
               * 1000000.0) AS BIGINT) AS micro_nats
  FROM vocab, totals)
SELECT doc_id, COUNT(*) AS n_tokens,
  CAST(SUM(micro_nats) AS BIGINT) AS surprisal_micro,
  CAST(SUM(micro_nats) AS BIGINT) // COUNT(*) AS mean_surprisal_micro
FROM exploded JOIN scored USING (tok)
GROUP BY doc_id
"""


UNIGRAM_SURPRISAL = unigram_surprisal_sql()


def line_dedup_sql(header: str, line_tokens: int = 8,
                   min_docs: int = 3) -> str:
    """DuckDB mirror of curation.line_dedup over the header-injected
    corpus (every 5th doc gets the boilerplate header prepended)."""
    n = line_tokens
    return f"""
WITH d AS (SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN '{header} ' || text ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id, {TOKS} AS toks FROM d),
e AS (SELECT doc_id, toks,
    unnest(range(0, CAST(ceil(len(toks) / {n}.0) AS INT))) AS i
  FROM toks),
lines AS (SELECT doc_id, CAST(i AS INT) AS line_no,
    array_to_string(toks[i * {n} + 1 : i * {n} + {n}], ' ') AS line
  FROM e),
freq AS (SELECT md5(line) AS lh, COUNT(DISTINCT doc_id) AS n_docs_with
         FROM lines GROUP BY 1),
flagged AS (SELECT l.*, f.n_docs_with >= {min_docs} AS is_boiler
            FROM lines l JOIN freq f ON md5(l.line) = f.lh),
agg AS (SELECT doc_id, COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  COALESCE(string_agg(CASE WHEN NOT is_boiler THEN line END, ' '
                      ORDER BY line_no), '') AS clean_text
FROM flagged GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(agg.n_lines, 0) AS n_lines,
  COALESCE(agg.n_removed, 0) AS n_removed,
  COALESCE(agg.clean_text, '') AS clean_text
FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


def _pq_sq_fold(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip({a}, {b}), "
            f"z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * "
            f"(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))), "
            f"(acc, v) -> acc + v)")


def pq_cte_block(m: int = 8, dims: int = 64, codebook_mod: int = 59,
                 codebook_size: int = 16) -> str:
    """The PQ encode CTE chain (``s, cbrows, cbagg, coded, enc``):
    sampled codebooks, per-subspace argmin encode, reconstruction —
    shared by pq_topk_sql and the IVF-PQ composition so the two
    oracles can never diverge on codebook/encode semantics."""
    sub = dims // m
    code_cols = []
    for j in range(m):
        sv = f"embedding[{j * sub + 1} : {j * sub + sub}]"
        dists = (f"list_transform(list_filter(cb, x -> x.j = {j}), "
                 f"c -> {_pq_sq_fold(sv, 'c.codeword')})")
        code_cols.append(
            f"CAST(list_position({dists}, list_min({dists})) - 1 AS INT)"
            f" AS c{j}")
    recon = " || ".join(
        f"list_filter(cb, x -> x.j = {j})[c{j} + 1].codeword"
        for j in range(m))
    return f"""s AS (SELECT vec_id, embedding,
    ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % {codebook_mod} = 1
        ORDER BY vec_id LIMIT {codebook_size})),
cbrows AS (SELECT j, code,
    embedding[j * {sub} + 1 : j * {sub} + {sub}] AS codeword
  FROM s, (SELECT unnest(generate_series(0, {m - 1})) AS j)),
cbagg AS (SELECT list(struct_pack(j := j, code := code,
                                  codeword := codeword)
                      ORDER BY j, code) AS cb FROM cbrows),
coded AS (SELECT vec_id, embedding, {', '.join(code_cols)}
  FROM embeddings, cbagg),
enc AS (SELECT vec_id, ({recon}) AS pq_recon FROM coded, cbagg)"""


def pq_topk_sql(m: int = 8, dims: int = 64, codebook_mod: int = 59,
                query_mod: int | None = 100, k: int = 5,
                codebook_size: int = 16) -> str:
    """DuckDB mirror of similarity.pq_topk: sampled codebooks, per-
    subspace argmin encode, reconstruction, asymmetric-distance rank.
    Folds are list_reduce with a prepended 0.0 (== Spark aggregate
    with 0.0 init, bit-for-bit). ``query_mod=None`` mirrors the Spark
    side's derived fixed-size query sample (sampled_query_mod)."""
    qmod = (str(query_mod) if query_mod is not None else
            "(SELECT GREATEST(1, COUNT(*) // 64) FROM embeddings)")
    return f"""
WITH {pq_cte_block(m, dims, codebook_mod, codebook_size)},
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id % {qmod} = 0),
scored AS (SELECT q.query_id, e.vec_id,
    {_pq_sq_fold('q.q_emb', 'e.pq_recon')} AS adc_dist
  FROM enc e, q WHERE e.vec_id <> q.query_id),
ranked AS (SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, adc_dist, rank FROM ranked WHERE rank <= {k}
"""


def ivfpq_topk_sql(m: int = 8, dims: int = 64, codebook_mod: int = 59,
                   codebook_size: int = 16,
                   centroid_mod: int | None = 37,
                   query_mod: int = 100, nprobe: int = 2,
                   rerank: int = 15, k: int = 5) -> str:
    """DuckDB mirror of similarity.ivfpq_topk: IVF coarse probe ->
    PQ asymmetric-distance shortlist -> exact cosine re-rank. Shares
    pq_cte_block with pq_topk_sql and the probe/assign shapes with
    ANN_IVF_TOPK. ``centroid_mod=None`` mirrors the Spark side's
    sqrt(N)-derived sizing (sqrt_centroid_mod) via a scalar
    subquery — IEEE sqrt + integer division, engine-exact."""
    cmod = (str(centroid_mod) if centroid_mod is not None else
            "(SELECT GREATEST(2, COUNT(*) // "
            "CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)")
    return f"""
WITH {pq_cte_block(m, dims, codebook_mod, codebook_size)},
cents AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb
  FROM embeddings WHERE vec_id % {cmod} = 1),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {cosine('e.embedding', 'c.c_emb')} DESC,
                 c.centroid_id) AS crank
    FROM embeddings e, cents c) t
  WHERE crank = 1),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id % {query_mod} = 0),
probes AS (
  SELECT query_id, q_emb, centroid_id FROM (
    SELECT q.query_id, q.q_emb, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY {cosine('q.q_emb', 'c.c_emb')} DESC,
                 c.centroid_id) AS prank
    FROM q, cents c) t
  WHERE prank <= {nprobe}),
adc AS (
  SELECT p.query_id, p.q_emb, a.vec_id,
         {_pq_sq_fold('p.q_emb', 'e.pq_recon')} AS adc_dist
  FROM probes p
  JOIN assigned a USING (centroid_id)
  JOIN enc e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id),
short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY adc_dist ASC, vec_id ASC) AS adc_rank
    FROM adc) t
  WHERE adc_rank <= {rerank}),
ex AS (
  SELECT sh.query_id, sh.vec_id, sh.adc_dist,
         {cosine('sh.q_emb', 'f.embedding')} AS cosine
  FROM short sh JOIN embeddings f ON f.vec_id = sh.vec_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM ex)
SELECT query_id, vec_id, adc_dist, cosine, rank FROM r WHERE rank <= {k}
"""


# scoring.hash_embed mirror: DuckDB computes each dimension as a
# per-doc fold over the token list; Spark uses explode + groupBy.
# The routes agree EXACTLY because every component is a sum of +/-1.0
# (small integers are exact in doubles, addition order irrelevant).
HASH_EMBED_VEC = """list_transform(generate_series(0, 63), d ->
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(toks, t -> CASE WHEN
        CAST(concat('0x', substring(md5(t), 1, 4)) AS INTEGER) % 64 = d
        THEN (CASE WHEN substring(md5(t), 5, 1) >= '8'
              THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)
        ELSE CAST(0.0 AS DOUBLE) END)),
      (acc, u) -> acc + u))"""

HASH_EMBED = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
emb AS (SELECT doc_id,
  {HASH_EMBED_VEC} AS v
  FROM toks)
SELECT doc_id,
  array_to_string(list_transform(v, x ->
    CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS embed_csv,
  len(list_filter(v, x -> x <> 0)) AS nnz,
  CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(v, x -> x * x)), (acc, u) -> acc + u) AS BIGINT)
    AS l2_sq
FROM emb
"""


CORPUS_TOKEN_STATS = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
ex AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
counts AS (SELECT tok, COUNT(*) AS cnt FROM ex GROUP BY tok),
totals AS (SELECT COUNT(*) AS vocab_size,
                  CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts),
top AS (SELECT * FROM counts ORDER BY cnt DESC, tok LIMIT 50),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank,
        CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
      FROM top)
SELECT rank, tok, cnt, cum_cnt,
  CAST(cum_cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS cum_share,
  vocab_size, total_tokens
FROM r, totals
"""


BIGRAM_SURPRISAL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
ex AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
uni AS (SELECT tok, COUNT(*) AS c1 FROM ex GROUP BY tok),
total AS (SELECT COUNT(*) AS t FROM ex),
bi0 AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i,
               toks
        FROM toks WHERE len(toks) >= 2),
bi AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM bi0),
bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
sb AS (SELECT doc_id,
    CAST(floor(-ln(0.75 * (CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) +
                   (1.0 - 0.75) * (CAST(c1w2 AS DOUBLE) / CAST(t AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS micro
  FROM bi
  JOIN bic USING (w1, w2)
  JOIN uni u1 ON bi.w1 = u1.tok
  JOIN (SELECT tok AS tok2, c1 AS c1w2 FROM uni) u2 ON bi.w2 = u2.tok2,
  total),
sh AS (SELECT doc_id,
    CAST(floor(-ln(CAST(c1 AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0)
         AS BIGINT) AS micro
  FROM (SELECT doc_id, toks[1] AS tok FROM toks WHERE len(toks) >= 1) h
  JOIN uni USING (tok), total)
SELECT doc_id, COUNT(*) AS n_scored,
  CAST(SUM(micro) AS BIGINT) AS surprisal_micro,
  CAST(SUM(micro) AS BIGINT) // COUNT(*) AS mean_surprisal_micro
FROM (SELECT * FROM sb UNION ALL SELECT * FROM sh)
GROUP BY doc_id
"""


def corpus_full_curation_sql(header: str,
                             min_tokens: int = 20,
                             max_mean_surprisal: int = 3_450_000,
                             budget: int = 2048) -> str:
    """The composed end-to-end curation oracle: line dedup over the
    header-injected corpus -> surprisal scoring on the CLEANED text ->
    quality + surprisal gates -> per-language token packing. Mirrors
    q_corpus_full_curation stage for stage."""
    return f"""
WITH docs2 AS (
  SELECT doc_id, clean_text AS text
  FROM ({line_dedup_sql(header)}) ld
  WHERE ld.n_lines > ld.n_removed),
surp AS (SELECT * FROM ({unigram_surprisal_sql('docs2')}) s),
kept AS (
  SELECT surp.doc_id, dd.lang, surp.n_tokens, surp.mean_surprisal_micro
  FROM surp JOIN documents dd USING (doc_id)
  WHERE surp.n_tokens >= {min_tokens}
    AND surp.mean_surprisal_micro <= {max_mean_surprisal}),
cum AS (
  SELECT lang, doc_id, n_tokens, mean_surprisal_micro,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM kept)
SELECT doc_id, lang, n_tokens,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {budget}) AS BIGINT)
         AS bin_id,
       mean_surprisal_micro
FROM cum
"""


def ann_doc_lsh_sql(query_mod: int = 50, k: int = 5) -> str:
    """Composed doc-ANN mirror: hash-embed vectors -> LSH buckets ->
    in-bucket exact cosine top-k. Vectors are exact integer counts so
    every projection/cosine fold is engine-exact."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
emb0 AS (SELECT doc_id, {HASH_EMBED_VEC} AS v FROM toks),
b AS (SELECT doc_id AS vec_id, v AS embedding, {LSH_BUCKET} AS bucket
      FROM emb0 WHERE len(list_filter(v, x -> x <> 0)) > 0),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
      FROM b WHERE vec_id % {query_mod} = 0),
j AS (SELECT q.query_id, b.vec_id,
             {cosine('q.q_emb', 'b.embedding')} AS cosine
      FROM b JOIN q ON b.bucket = q.q_bucket AND b.vec_id <> q.query_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM j)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= {k}
"""


def _band_index_sql(source: str, p: str) -> str:
    """Banded-MinHash index CTEs over any (doc_id, text) source —
    identical band keys to MINHASH_PAIRS_CTES."""
    return f"""
{p}toks AS (SELECT doc_id, text, {TOKS} AS toks FROM {source}),
{p}sh AS (SELECT doc_id, {SHINGLES} AS shingles FROM {p}toks),
{p}bh AS (SELECT doc_id, list_transform(shingles, s -> md5(s))
            AS base_hashes FROM {p}sh),
{p}sigs AS (SELECT doc_id, {_SIG} AS sig FROM {p}bh),
{p}bands AS (SELECT doc_id, b.band,
    md5(sig[b.band * 3 + 1] || sig[b.band * 3 + 2] || sig[b.band * 3 + 3])
      AS bucket
  FROM {p}sigs, (SELECT unnest(generate_series(0, 3)) AS band) b)"""


DEDUP_INCREMENTAL = f"""
WITH new0 AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % 15 = 0 AND n.text IS NOT NULL THEN n.text
         WHEN d.doc_id % 21 = 0 AND n.text IS NOT NULL
           THEN n.text || ' extraword'
         ELSE d.text END AS text
  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1
  WHERE d.doc_id % 3 = 0),
seen AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
nh AS (SELECT doc_id, md5(text) AS content_hash FROM new0),
shh AS (SELECT DISTINCT md5(text) AS content_hash FROM seen),
surv AS (SELECT * FROM nh
         WHERE content_hash NOT IN (SELECT content_hash FROM shh)),
ex_ok AS (SELECT MIN(doc_id) AS doc_id, content_hash
          FROM surv GROUP BY content_hash),
{_band_index_sql('new0', 'n')},
{_band_index_sql('seen', 's')},
near AS (SELECT DISTINCT nb.doc_id
         FROM nbands nb
         JOIN (SELECT DISTINCT band, bucket FROM sbands) sb
           USING (band, bucket))
SELECT doc_id, content_hash FROM ex_ok
WHERE doc_id NOT IN (SELECT doc_id FROM near)
"""


# the boundary hash mirrors curation.cdc_poly_expr (window=8,
# zero_digits=1): an unrolled polynomial over the window-gram's char
# codes mod CDC_MOD, boundary when divisible by 16 — same integer
# arithmetic on both engines, no per-position md5
def _cdc_poly_sql(window: int = 8) -> str:
    from .curation import CDC_BASE as base
    from .curation import CDC_MOD as mod
    terms = " + ".join(
        f"(ascii(substring(text, p + {j}, 1)) % 256) * "
        f"CAST({base ** (window - 1 - j)} AS BIGINT)"
        for j in range(window))
    return f"(({terms}) % {mod})"


CDC_CHUNKS = f"""
WITH b AS (SELECT doc_id, text,
    CASE WHEN length(text) <= 8 THEN [length(text)]
      ELSE list_concat(list_filter(list_transform(
        generate_series(1, length(text) - 8),
        p -> CASE WHEN {_cdc_poly_sql()} % 16 = 0
             THEN p + 8 - 1 ELSE -1 END),
        x -> x > 0 AND x < length(text)), [length(text)]) END AS bnds
  FROM documents),
e AS (SELECT doc_id, text, bnds,
        unnest(generate_series(1, len(bnds))) AS i FROM b),
c AS (SELECT doc_id, text, CAST(i - 1 AS INT) AS chunk_no,
        CASE WHEN i = 1 THEN 1 ELSE bnds[i - 1] + 1 END AS start,
        bnds[i] AS stop
      FROM e)
SELECT doc_id, chunk_no, CAST(start AS INT) AS start,
  CAST(stop - start + 1 AS INT) AS chunk_len,
  md5(substring(text, start, CAST(stop - start + 1 AS INT))) AS chunk_md5
FROM c WHERE stop >= start
"""


CONTAINMENT_PAIRS = f"""
WITH {MINHASH_PAIRS_CTES},
shset AS (SELECT doc_id, list_distinct(shingles) AS shset FROM sh),
j AS (SELECT p.doc_a, p.doc_b, a.shset AS sh_a, b.shset AS sh_b
      FROM pairs p
      JOIN shset a ON p.doc_a = a.doc_id
      JOIN shset b ON p.doc_b = b.doc_id),
scored AS (SELECT doc_a, doc_b,
    len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS n_common,
    CAST(len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS DOUBLE)
      / CAST(len(sh_a) AS DOUBLE) AS containment_a_in_b,
    CAST(len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS DOUBLE)
      / CAST(len(sh_b) AS DOUBLE) AS containment_b_in_a
  FROM j)
SELECT * FROM scored
WHERE containment_a_in_b >= 0.8 OR containment_b_in_a >= 0.8
"""


CORPUS_SOURCE_REPORT = f"""
WITH per_doc AS (SELECT source, lang, doc_id,
    len({TOKS}) AS n_tokens, md5(text) AS content_hash
  FROM documents)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  COUNT(CASE WHEN n_tokens < 20 THEN 1 END) AS n_short,
  COUNT(DISTINCT lang) AS n_langs,
  COUNT(DISTINCT content_hash) AS n_unique_texts,
  CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS mean_tokens,
  COUNT(*) - COUNT(DISTINCT content_hash) AS n_dup_texts
FROM per_doc GROUP BY source
"""


# paragraph-granularity near dedup: 32-token non-overlapping chunks as
# units, composite unit id = doc_id * 1000 + chunk_seq, then the SAME
# banded candidate chain + signature-agreement estimate
CHUNK_MINHASH_PAIRS = f"""
WITH t0 AS (SELECT doc_id,
    string_split_regex(trim(text), '\\s+') AS dtoks
  FROM documents),
e AS (SELECT doc_id, dtoks,
    unnest(range(0, greatest(len(dtoks), 1), 32)) AS i
  FROM t0),
units AS (SELECT doc_id * 1000 + CAST(i / 32 AS INT) AS doc_id,
    array_to_string(dtoks[i + 1 : i + 32], ' ') AS text
  FROM e WHERE i < len(dtoks)),
{minhash_pairs_ctes('units')}
SELECT doc_a // 1000 AS doc_a, CAST(doc_a % 1000 AS INT) AS chunk_a,
  doc_b // 1000 AS doc_b, CAST(doc_b % 1000 AS INT) AS chunk_b,
  CAST(len(list_filter(generate_series(0, 11),
      j -> sig_a[j+1] = sig_b[j+1])) AS DOUBLE)
    / CAST(12 AS DOUBLE) AS est_jaccard
FROM pairs
"""


def _span_occ_sql(src: str, prefix: str, w: int) -> str:
    """CTE fragment: (doc_id, pos, w-token window md5) over ``src`` —
    the shared occurrence stage of the span-dedup oracles (mirrors
    dedup._window_occurrences)."""
    return f"""
{prefix}t AS (SELECT doc_id, {TOKS} AS toks FROM {src}),
{prefix}e AS (SELECT doc_id, toks,
        unnest(CASE WHEN len(toks) >= {w}
               THEN generate_series(0, len(toks) - {w}) ELSE [] END) AS pos
      FROM {prefix}t),
{prefix}occ AS (SELECT doc_id, CAST(pos AS INT) AS pos,
          md5(array_to_string(toks[pos + 1 : pos + {w}], ' ')) AS whash
        FROM {prefix}e)"""


def _span_merge_sql(w: int, cte_name: str | None = None) -> str:
    """CTE chain + final select: merge a ``marked`` (doc_id, pos) set
    into maximal spans (mirrors dedup._merge_marked_spans). With
    ``cte_name`` the final select is wrapped as a further CTE
    ``, <name> AS (...)`` so callers can keep composing instead of
    patching the generated SQL text."""
    final = f"""
SELECT doc_id, MIN(pos) AS span_start,
       CAST(MAX(pos) + {w} - 1 AS INT) AS span_end,
       COUNT(*) AS n_windows
FROM isl3 GROUP BY doc_id, island"""
    if cte_name is not None:
        final = f", {cte_name} AS ({final})"
    return f"""
isl AS (SELECT doc_id, pos,
          MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            + {w} - 1 AS prev_end
        FROM marked),
isl2 AS (SELECT doc_id, pos,
           CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                THEN 1 ELSE 0 END AS is_new
         FROM isl),
isl3 AS (SELECT doc_id, pos,
           SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
         FROM isl2){final}"""


def duplicate_spans_sql(w: int = 16, min_count: int = 2) -> str:
    """DuckDB mirror of dedup.duplicate_spans (keep_first=True):
    window-hash occurrence table -> corpus-duplicated hashes ->
    rank-within-hash (first occurrence survives) -> per-doc
    overlapping/adjacent interval merge."""
    return f"""
WITH {_span_occ_sql('documents', '', w)},
dup AS (SELECT whash FROM occ GROUP BY whash
        HAVING COUNT(*) >= {min_count}),
marked0 AS (SELECT o.doc_id, o.pos,
              ROW_NUMBER() OVER (PARTITION BY o.whash
                                 ORDER BY o.doc_id, o.pos) AS rk
            FROM occ o JOIN dup USING (whash)),
marked AS (SELECT doc_id, pos FROM marked0 WHERE rk > 1),
{_span_merge_sql(w)}
"""


DUPLICATE_SPANS = duplicate_spans_sql()


def decontaminate_spans_sql(w: int = 16) -> str:
    """DuckDB mirror of dedup.decontaminate_spans over the standard
    bench/corpus split (every 50th doc is the held-out set; every 7th
    corpus doc gets a 24-token quote of the first bench doc appended,
    mirroring the entry query's injection)."""
    return f"""
WITH bench AS (SELECT * FROM documents WHERE doc_id % 50 = 0),
quote AS (SELECT array_to_string(({TOKS})[1:24], ' ') AS q
          FROM bench ORDER BY doc_id LIMIT 1),
corpus AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || ' ' || q
                  ELSE text END AS text
           FROM documents, quote WHERE doc_id % 50 <> 0),
{_span_occ_sql('bench', 'b', w)},
bwins AS (SELECT DISTINCT whash FROM bocc),
{_span_occ_sql('corpus', '', w)},
marked AS (SELECT o.doc_id, o.pos FROM occ o JOIN bwins USING (whash)),
{_span_merge_sql(w)}
"""


DECONTAMINATE_SPANS = decontaminate_spans_sql()


def mix_to_weights_sql(weights: dict[str, float],
                       stratum_col: str = "lang",
                       seed: str = "mix") -> str:
    """DuckDB mirror of curation.mix_to_weights. Normalization repeats
    the operator's arithmetic verbatim (same sum, same division order)
    and embeds repr() doubles, so both engines compute with identical
    IEEE values end to end."""
    total_w = sum(weights.values())
    norm = {k: v / total_w for k, v in sorted(weights.items())}
    vals = ", ".join(f"('{k}', {v!r})" for k, v in norm.items())
    return f"""
WITH wts({stratum_col}, w) AS (VALUES {vals}),
counts AS (SELECT {stratum_col}, COUNT(*) AS n_stratum
           FROM documents GROUP BY 1),
capped AS (SELECT w.{stratum_col},
                  COALESCE(c.n_stratum, 0) AS n_stratum, w.w,
                  CAST(COALESCE(c.n_stratum, 0) AS DOUBLE) / w.w AS ratio
           FROM wts w LEFT JOIN counts c USING ({stratum_col})),
scale AS (SELECT MIN(ratio) AS s FROM capped),
caps AS (SELECT {stratum_col}, n_stratum,
                CAST(FLOOR(w * s) AS BIGINT) AS k_target
         FROM capped, scale),
rk AS (SELECT d.doc_id, d.{stratum_col}, c.n_stratum, c.k_target,
              ROW_NUMBER() OVER (
                PARTITION BY d.{stratum_col}
                ORDER BY md5('{seed}:' || CAST(d.doc_id AS VARCHAR)),
                         d.doc_id) AS r
       FROM documents d JOIN caps c USING ({stratum_col}))
SELECT doc_id, {stratum_col}, n_stratum, k_target
FROM rk WHERE r <= k_target
"""


CORPUS_LENGTH_QUANTILES = f"""
WITH per AS (SELECT source, doc_id, len({TOKS}) AS n_tokens
             FROM documents),
r AS (SELECT source, n_tokens,
        ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY n_tokens, doc_id) AS rk,
        COUNT(*) OVER (PARTITION BY source) AS n
      FROM per)
SELECT source, COUNT(*) AS n_docs,
  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
  MAX(CASE WHEN rk = (50 * n + 99) // 100
           THEN n_tokens END) AS p50_tokens,
  MAX(CASE WHEN rk = (90 * n + 99) // 100
           THEN n_tokens END) AS p90_tokens,
  MAX(CASE WHEN rk = (99 * n + 99) // 100
           THEN n_tokens END) AS p99_tokens
FROM r GROUP BY source
"""


def strip_spans_sql(w: int = 16, min_count: int = 2) -> str:
    """DuckDB mirror of duplicate_spans + strip_spans composed: spans
    via the shared CTE chain, then per-doc token rebuild keeping only
    positions outside every span (string_agg ordered by token index)."""
    return f"""
WITH {_span_occ_sql('documents', '', w)},
dup AS (SELECT whash FROM occ GROUP BY whash
        HAVING COUNT(*) >= {min_count}),
marked0 AS (SELECT o.doc_id, o.pos,
              ROW_NUMBER() OVER (PARTITION BY o.whash
                                 ORDER BY o.doc_id, o.pos) AS rk
            FROM occ o JOIN dup USING (whash)),
marked AS (SELECT doc_id, pos FROM marked0 WHERE rk > 1),
{_span_merge_sql(w, cte_name='spans')},
ti AS (SELECT doc_id, toks,
         unnest(CASE WHEN len(toks) >= 1
                THEN generate_series(0, len(toks) - 1) ELSE [] END) AS i
       FROM t),
tok AS (SELECT doc_id, CAST(i AS INT) AS i, toks[i + 1] AS tok FROM ti),
keep AS (SELECT k.doc_id, k.i, k.tok FROM tok k
         WHERE NOT EXISTS (SELECT 1 FROM spans s
                           WHERE s.doc_id = k.doc_id
                             AND k.i BETWEEN s.span_start AND s.span_end)),
agg AS (SELECT doc_id,
          COALESCE(string_agg(tok, ' ' ORDER BY i), '') AS clean_text,
          COUNT(*) AS n_kept
        FROM keep GROUP BY doc_id)
SELECT t.doc_id,
  COALESCE(agg.clean_text, '') AS clean_text,
  CAST(len(t.toks) - COALESCE(agg.n_kept, 0) AS INT) AS n_dup_tokens
FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
"""


STRIP_SPANS = strip_spans_sql()


def split_corpus_sql(fractions: dict[str, float] | None = None,
                     seed: str = "split") -> str:
    """DuckDB mirror of curation.split_corpus: the hex thresholds come
    from the SAME split_bounds helper the Spark operator uses, so both
    engines compare the same ticket against the same literals."""
    from .curation import split_bounds
    bounds = split_bounds(fractions)
    cases = [f"WHEN t <= '{upper}' THEN '{name}'"
             for name, upper in bounds[:-1]]
    case = ("CASE " + " ".join(cases)
            + f" ELSE '{bounds[-1][0]}' END")
    return f"""
WITH tk AS (SELECT doc_id,
              substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8)
                AS t
            FROM documents)
SELECT doc_id, {case} AS split FROM tk
"""


DEDUP_QUALITY_CANONICALS = f"""
WITH RECURSIVE {MINHASH_PAIRS_CTES},
e0 AS (
  SELECT doc_a AS txn_id, CAST(doc_b AS STRING) AS key FROM pairs
  UNION ALL
  SELECT doc_b AS txn_id, CAST(doc_b AS STRING) AS key FROM pairs),
tk AS (SELECT DISTINCT txn_id, key FROM e0),
e AS (SELECT DISTINCT a.txn_id AS src, b.txn_id AS dst
      FROM tk a JOIN tk b ON a.key = b.key),
r AS (
  SELECT txn_id, txn_id AS label FROM (SELECT DISTINCT txn_id FROM tk)
  UNION
  SELECT e.src AS txn_id, r.label FROM r JOIN e ON e.dst = r.txn_id
),
clusters AS (SELECT txn_id AS doc_id, MIN(label) AS cluster_id
             FROM r GROUP BY txn_id),
sized AS (SELECT doc_id, len({TOKS}) AS n_tokens FROM documents),
ranked AS (
  SELECT c.doc_id, c.cluster_id, s.n_tokens,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY s.n_tokens DESC, c.doc_id) AS rk
  FROM clusters c JOIN sized s USING (doc_id))
SELECT doc_id, cluster_id, n_tokens, rk = 1 AS is_canonical FROM ranked
"""


def funnel_sql(steps: list[str], window_ns: int | None = None) -> str:
    """DuckDB CTE chain mirroring operators/funnel.funnel over the
    events table: level i = earliest step-i event after t_{i-1}
    (within ``window_ns`` of t0 when given), greedy per user."""
    ctes = [
        "e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_type "
        "FROM events)",
        f"l0 AS (SELECT user_id, MIN(ts_ns) AS t0 FROM e "
        f"WHERE event_type = '{steps[0]}' GROUP BY 1)",
    ]
    for i in range(1, len(steps)):
        prev = f"l{i - 1}"
        carry = ", ".join(f"ANY_VALUE({prev}.t{j}) AS t{j}"
                          for j in range(i))
        wf = (f" AND e.ts_ns - {prev}.t0 <= {window_ns}"
              if window_ns is not None else "")
        ctes.append(
            f"l{i} AS (SELECT e.user_id, {carry}, MIN(e.ts_ns) AS t{i}"
            f" FROM e JOIN {prev} USING (user_id)"
            f" WHERE e.event_type = '{steps[i]}'"
            f" AND e.ts_ns > {prev}.t{i - 1}{wf}"
            f" GROUP BY e.user_id)")
    k = len(steps)
    ts_cols = ", ".join(["l0.t0"] + [f"l{i}.t{i}" for i in range(1, k)])
    stage = " + ".join(
        [f"CASE WHEN l{i}.t{i} IS NOT NULL THEN 1 ELSE 0 END"
         for i in range(1, k)] or ["0"])
    joins = " ".join(f"LEFT JOIN l{i} USING (user_id)"
                     for i in range(1, k))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT l0.user_id, {ts_cols}, 1 + {stage} AS max_stage "
            f"FROM l0 {joins}")


# exact-integer k-means (similarity.kmeans_integer oracle) ------------------

def _int_sqdist(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_zip({a}, {b}), "
            f"z -> (z[1] - z[2]) * (z[1] - z[2]))), (acc, v) -> acc + v)")


def _int_dot(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_zip({a}, {b}), "
            f"z -> z[1] * z[2])), (acc, v) -> acc + v)")


QUANT_EMB_CTE = """emb AS (
  SELECT vec_id AS id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS vec
  FROM embeddings)"""


def kmeans_int_ctes(k: int = 10, iters: int = 2, dims: int = 64,
                    derived_k_target: int | None = None) -> str:
    """CTE chain mirroring similarity.kmeans_integer over a CTE
    ``emb(id, vec)`` of BIGINT lists. Ends in ``afin(id, vec, cid,
    dist)`` — the final assignment under the post-update centroids.
    Unrolled per iteration: assignment (argmin dist, ties to lowest
    cid), floor-mean centroid update, empty-cluster carry-over.

    ``derived_k_target`` mirrors semantic_dedup_exact's derived
    k = ceil(n / target_cluster_size): Python ``-(-n // t)`` ==
    ``(n + t - 1) // t`` for n >= 0, emitted here as a ``kv`` scalar
    CTE so the oracle re-derives the same k the Spark side counts."""
    if derived_k_target is not None:
        t = int(derived_k_target)
        parts = [f"""kv AS (
  SELECT GREATEST(1, (COUNT(*) + {t - 1}) // {t}) AS k FROM emb),
c0 AS (
  SELECT cid, cvec FROM (
    SELECT row_number() OVER (ORDER BY id) - 1 AS cid, vec AS cvec
    FROM emb) CROSS JOIN kv
  WHERE cid < kv.k)"""]
    else:
        parts = [f"""c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, vec AS cvec
  FROM (SELECT id, vec FROM emb ORDER BY id LIMIT {k}))"""]
    for i in range(iters):
        d = _int_sqdist("e.vec", "c.cvec")
        parts.append(f"""d{i} AS (
  SELECT e.id, e.vec, c.cid, {d} AS dist
  FROM emb e CROSS JOIN c{i} c),
a{i} AS (
  SELECT id, vec, cid, dist FROM (
    SELECT *, row_number() OVER (
        PARTITION BY id ORDER BY dist, cid) AS rn FROM d{i})
  WHERE rn = 1),
x{i} AS (
  SELECT cid, d,
         CAST(floor(CAST(SUM(vec[d + 1]) AS DOUBLE) / COUNT(*))
              AS BIGINT) AS cv
  FROM a{i} CROSS JOIN
       (SELECT unnest(generate_series(0, {dims - 1})) AS d) dims
  GROUP BY cid, d),
n{i} AS (SELECT cid, list(cv ORDER BY d) AS cvec FROM x{i} GROUP BY cid),
c{i + 1} AS (
  SELECT c{i}.cid, COALESCE(n{i}.cvec, c{i}.cvec) AS cvec
  FROM c{i} LEFT JOIN n{i} USING (cid))""")
    d = _int_sqdist("e.vec", "c.cvec")
    parts.append(f"""dfin AS (
  SELECT e.id, e.vec, c.cid, {d} AS dist
  FROM emb e CROSS JOIN c{iters} c),
afin AS (
  SELECT id, vec, cid, dist FROM (
    SELECT *, row_number() OVER (
        PARTITION BY id ORDER BY dist, cid) AS rn FROM dfin)
  WHERE rn = 1)""")
    return ",\n".join(parts)


ANN_KMEANS_CLUSTERS = f"""
WITH {QUANT_EMB_CTE},
{kmeans_int_ctes()}
SELECT id AS vec_id, cid AS cluster_id, dist,
       COUNT(*) OVER (PARTITION BY cid) AS cluster_n
FROM afin
"""

# exact-duplicate collapse mirror (similarity.semantic_dedup_exact):
# emb0 = every quantized vector; emb = one representative (min id)
# per distinct vector — the kmeans chain and the pairwise dup join
# run over reps; non-reps inherit the rep's cluster and are dups iff
# their (shared) vector is nonzero.
DEDUP_SEMANTIC = f"""
WITH {QUANT_EMB_CTE.replace("emb AS", "emb0 AS")},
emb AS (SELECT MIN(id) AS id, vec FROM emb0 GROUP BY vec),
{kmeans_int_ctes(derived_k_target=50)},
m AS (SELECT id, cid, vec, {_int_dot("vec", "vec")} AS n2 FROM afin),
dups AS (
  SELECT DISTINCT b.id AS dup_id
  FROM m a JOIN m b ON a.cid = b.cid AND a.id < b.id
  WHERE {_int_dot("a.vec", "b.vec")} > 0
    AND 400 * ({_int_dot("a.vec", "b.vec")})
            * ({_int_dot("a.vec", "b.vec")})
        >= 49 * a.n2 * b.n2),
rinfo AS (
  SELECT m.id AS rep_id, m.cid, m.n2 > 0 AS rep_nonzero,
         dups.dup_id IS NULL AS rep_kept
  FROM m LEFT JOIN dups ON m.id = dups.dup_id),
rmap AS (
  SELECT e0.id, g.id AS rep_id
  FROM emb0 e0 JOIN emb g ON e0.vec = g.vec)
SELECT rmap.id AS vec_id, rinfo.cid AS cluster_id,
       CASE WHEN rmap.id = rmap.rep_id THEN rep_kept
            ELSE NOT rep_nonzero END AS is_kept
FROM rmap JOIN rinfo ON rmap.rep_id = rinfo.rep_id
"""


# multi-signal consensus dedup --------------------------------------------

_SIM_HAMMING = ("len(list_filter(generate_series(1, 64), "
                "p -> substring(sh_a, p, 1) <> substring(sh_b, p, 1)))")

DEDUP_CONSENSUS = f"""
WITH RECURSIVE {MINHASH_PAIRS_CTES},
sth AS (SELECT doc_id, {_TOK_HASHES} AS tok_hashes FROM toks),
ssh AS (SELECT doc_id, {_SIMHASH} AS simhash FROM sth),
schunks AS (
  SELECT doc_id, simhash, c.chunk,
         substring(simhash, c.chunk * 16 + 1, 16) AS key
  FROM ssh, (SELECT unnest(generate_series(0, 3)) AS chunk) c),
spairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM schunks a JOIN schunks b
    ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id),
sedges AS (SELECT doc_a, doc_b FROM spairs WHERE {_SIM_HAMMING} <= 6),
jsc AS (
  SELECT p.doc_a, p.doc_b, a.shingles AS sh_a, b.shingles AS sh_b
  FROM pairs p
  JOIN sh a ON p.doc_a = a.doc_id
  JOIN sh b ON p.doc_b = b.doc_id),
jedges AS (
  SELECT doc_a, doc_b FROM jsc
  WHERE CAST(len(list_filter(list_distinct(sh_a),
                 x -> list_contains(sh_b, x))) AS DOUBLE)
      / CAST(len(list_distinct(sh_a)) + len(list_distinct(sh_b))
             - len(list_filter(list_distinct(sh_a),
                   x -> list_contains(sh_b, x))) AS DOUBLE) >= 0.5),
alledges AS (
  SELECT doc_a, doc_b, 'minhash' AS sig FROM pairs
  UNION SELECT doc_a, doc_b, 'simhash' AS sig FROM sedges
  UNION SELECT doc_a, doc_b, 'jaccard' AS sig FROM jedges),
-- MATERIALIZED: the recursive CC below re-reads e every
-- iteration; without the hint DuckDB re-evaluates the whole
-- signal chain per iteration (~10x blowup)
ep AS MATERIALIZED (SELECT doc_a, doc_b, COUNT(DISTINCT sig) AS n_signals
       FROM alledges GROUP BY doc_a, doc_b),
e0 AS (
  SELECT doc_a AS txn_id, CAST(doc_b AS STRING) AS key FROM ep
  UNION ALL
  SELECT doc_b AS txn_id, CAST(doc_b AS STRING) AS key FROM ep),
tk AS MATERIALIZED (SELECT DISTINCT txn_id, key FROM e0),
e AS MATERIALIZED (SELECT DISTINCT a.txn_id AS src, b.txn_id AS dst
      FROM tk a JOIN tk b ON a.key = b.key),
r AS (
  SELECT txn_id, txn_id AS label FROM (SELECT DISTINCT txn_id FROM tk)
  UNION
  SELECT e.src AS txn_id, r.label FROM r JOIN e ON e.dst = r.txn_id
),
members AS (SELECT txn_id AS doc_id, MIN(label) AS cluster_id
            FROM r GROUP BY txn_id),
elab AS (SELECT m.cluster_id, ep.n_signals
         FROM ep JOIN members m ON ep.doc_a = m.doc_id),
cmax AS (SELECT cluster_id, MAX(n_signals) AS max_edge_signals
         FROM elab GROUP BY cluster_id),
sizes AS (SELECT cluster_id, COUNT(*) AS n_members
          FROM members GROUP BY cluster_id)
SELECT m.doc_id, m.cluster_id, s.n_members, c.max_edge_signals
FROM members m
JOIN sizes s USING (cluster_id)
JOIN cmax c USING (cluster_id)
"""


# byte-level dHash mirror of multimodal.phash_stub over the %7
# exact-copy injected ASCII corpus (byte == char for 1-byte chars, the
# same equivalence mm_audio_features relies on)
MM_PHASH_PAIRS = """
WITH adocs AS (
  SELECT doc_id, text FROM documents
  WHERE len(list_filter(string_split(text, ''), ch -> ascii(ch) > 127)) = 0
    AND length(text) >= 1),
corpus AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % 7 = 0 AND p.text IS NOT NULL
         THEN p.text ELSE d.text END AS text
  FROM adocs d LEFT JOIN adocs p ON p.doc_id = d.doc_id - 1),
codes AS (SELECT doc_id,
            list_transform(string_split(text, ''), ch -> ascii(ch)) AS cs,
            length(text) AS n
          FROM corpus),
ph AS (SELECT doc_id,
  array_to_string(list_transform(generate_series(0, 63), i ->
    CASE WHEN cs[(i * (n - 1)) // 64 + 1] >
              cs[((i + 1) * (n - 1)) // 64 + 1]
         THEN '1' ELSE '0' END), '') AS phash
  FROM codes),
chunks AS (
  SELECT doc_id, phash, c.chunk,
         substring(phash, c.chunk * 16 + 1, 16) AS key
  FROM ph, (SELECT unnest(generate_series(0, 3)) AS chunk) c),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash AS ph_a, b.phash AS ph_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
  len(list_filter(generate_series(1, 64),
      p -> substring(ph_a, p, 1) <> substring(ph_b, p, 1))) AS hamming
FROM pairs
WHERE len(list_filter(generate_series(1, 64),
      p -> substring(ph_a, p, 1) <> substring(ph_b, p, 1))) <= 4
"""
