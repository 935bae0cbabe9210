"""Byte-pair-encoding tokenizer: learn merges from the corpus,
apply them distributed — upgrading the BPE-ish regex token count
(text.token_count) to an actual subword tokenizer.

Split of labor mirrors production tokenizer training:
- LEARNING runs on the word-frequency table (Sennrich et al., 2016):
  the corpus collapses to (word, count) via one distributed groupBy,
  then a ``min_count`` filter and a deterministic top-``max_words``
  cut run INSIDE Spark before the collect — a web-scale corpus has an
  unbounded long tail of distinct "words" (typos, URLs, hashes), so
  the driver-side learning table is explicitly capped (default 100k
  rows ≈ a few MB), exactly how production tokenizer trainers bound
  their vocab. Merges learned on the frequency head are unchanged by
  the cut for any tail mass the head dominates.
- ENCODING is an Arrow-batched pandas UDF over mapInPandas (per-word
  merge application is inherently iterative — not expressible as
  Catalyst array expressions), with the merge ranks broadcast once.

Determinism: ties in pair counts break lexicographically, so the
learned merge sequence is replay-stable for a given corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import with_tokens

END = "</w>"   # end-of-word marker (standard BPE word-boundary symbol)


def word_frequencies(docs: DataFrame, min_count: int = 1,
                     max_words: int | None = None) -> DataFrame:
    """(word, count) over the whitespace tokens — the only corpus-wide
    aggregate BPE learning needs. ``min_count`` prunes the long tail
    map-side-combinably; ``max_words`` keeps the deterministic
    frequency head (count desc, word asc — a TakeOrderedAndProject,
    never a full sort) so the collect is bounded no matter the
    corpus."""
    wf = (with_tokens(docs)
          .select(F.explode("toks").alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    if min_count > 1:
        wf = wf.filter(F.col("cnt") >= min_count)
    if max_words is not None:
        wf = wf.orderBy(F.desc("cnt"), F.asc("word")).limit(max_words)
    return wf


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for sym, cnt in vocab.items():
        for i in range(len(sym) - 1):
            pairs[(sym[i], sym[i + 1])] += cnt
    return pairs


def _merge_vocab(vocab: dict[tuple[str, ...], int],
                 pair: tuple[str, str]) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for sym, cnt in vocab.items():
        seq, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                seq.append(merged)
                i += 2
            else:
                seq.append(sym[i])
                i += 1
        out[tuple(seq)] = out.get(tuple(seq), 0) + cnt
    return out


def learn_bpe(docs: DataFrame, n_merges: int = 50, min_count: int = 1,
              max_words: int | None = 100_000) -> list[tuple[str, str]]:
    """Learn an ordered merge list from the corpus word-frequency
    table (greedy most-frequent-pair; ties lexicographic).

    Driver memory bound: the collected table holds at most
    ``max_words`` rows (default 100k — pass None only for corpora
    with a provably bounded vocabulary). The merge loop is
    incremental: each merge rewrites only the words CONTAINING the
    merged pair (pair->words inverted index) and candidate selection
    is a lazy max-heap — O(affected) per merge, not O(vocab), so a
    real 32k-merge vocabulary is tractable."""
    import heapq
    from collections import defaultdict

    freqs = {r["word"]: r["cnt"] for r in
             word_frequencies(docs, min_count, max_words).collect()}
    vocab: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(list(w) + [END]), c) for w, c in freqs.items()}
    pairs: Counter = Counter()
    index: dict[tuple[str, str], set[str]] = defaultdict(set)
    for w, (sym, cnt) in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pairs[p] += cnt
            index[p].add(w)
    # lazy heap: stale entries are skipped when their count no longer
    # matches; ties break lexicographically like the reference greedy
    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if -negc > 0 and pairs.get(p, 0) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        # rewrite only the words that contain the pair; index entries
        # can be stale (word rewritten since) — the subtract/re-add is
        # still a correct net update
        touched: set[tuple[str, str]] = set()
        for w in list(index.pop(best, ())):
            sym, cnt = vocab[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] -= cnt
                touched.add(p)
            new_sym = next(iter(_merge_vocab({sym: cnt}, best)))
            vocab[w] = (new_sym, cnt)
            for i in range(len(new_sym) - 1):
                p = (new_sym[i], new_sym[i + 1])
                pairs[p] += cnt
                index[p].add(w)
                touched.add(p)
        # one fresh heap entry per touched pair at its FINAL count —
        # decreased pairs need one too, or they could never win again
        for p in touched:
            c = pairs.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by learned priority (lowest rank
    first) — the standard BPE encode loop."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(docs: DataFrame,
               merges: list[tuple[str, str]]) -> DataFrame:
    """Distributed BPE encode: (doc_id, n_words, n_bpe_tokens,
    bpe_text) with subword tokens space-joined (word boundaries kept
    by the </w> markers). Arrow-batched mapInPandas; merge ranks ride
    the closure (KBs) — broadcast by Spark's task serializer."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = ("doc_id long, n_words int, n_bpe_tokens int, "
              "bpe_text string")

    def run(batches):
        import pandas as pd
        # per-partition memo: encode_word is pure, and corpus word
        # occurrences are Zipf-distributed, so encoding each DISTINCT
        # word once per partition cuts the Python hot loop by the
        # occurrence/distinct ratio (measured 10x+ on the 100x scaled
        # corpus). Capped so a pathological unbounded vocabulary (URLs,
        # hashes) cannot grow executor memory — past the cap, unseen
        # words just encode uncached (still correct).
        memo: dict[str, list[str]] = {}
        memo_cap = 500_000
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        if len(memo) < memo_cap:
                            memo[w] = enc
                    toks.extend(enc)
                rows.append((doc_id, len(words), len(toks),
                             " ".join(toks)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_words", "n_bpe_tokens", "bpe_text"])

    from .text import spread
    return spread(docs.select("doc_id", "text")).mapInPandas(run, schema)
