"""Byte-pair-encoding tokenizer: learn merges from the corpus,
apply them distributed — upgrading the BPE-ish regex token count
(text.token_count) to an actual subword tokenizer.

Split of labor mirrors production tokenizer training:
- LEARNING runs on the word-frequency table (Sennrich et al., 2016):
  the corpus collapses to (word, count) via one distributed groupBy —
  vocabulary-sized, bounded — and the greedy merge loop runs driver-
  side over that table. A 100 TB corpus still has a bounded
  vocabulary; the driver never sees corpus rows.
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


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(word, count) over the whitespace tokens — the only corpus-wide
    aggregate BPE learning needs."""
    return (with_tokens(docs)
            .select(F.explode("toks").alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


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


def learn_bpe(docs: DataFrame, n_merges: int = 50) -> list[tuple[str, str]]:
    """Learn an ordered merge list from the corpus word-frequency
    table (greedy most-frequent-pair; ties lexicographic)."""
    freqs = {r["word"]: r["cnt"] for r in word_frequencies(docs).collect()}
    vocab = {tuple(list(w) + [END]): c for w, c in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
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
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                toks: list[str] = []
                for w in words:
                    toks.extend(encode_word(w, ranks))
                rows.append((doc_id, len(words), len(toks),
                             " ".join(toks)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_words", "n_bpe_tokens", "bpe_text"])

    from .text import spread
    return spread(docs.select("doc_id", "text")).mapInPandas(run, schema)
