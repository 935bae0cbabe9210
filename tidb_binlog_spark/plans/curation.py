"""Declarative curation pipeline — the training-data analog of
``plans/pipeline.ReplicationConfig``: one config object, one composed
corpus transformation. The same operator functions power the entry
queries and examples/curation_demo.py; this module packages their
standard order behind a config so a recipe is data, not code:

  gates (tokens / language / stopword-ratio)
  -> exact dedup (keep cluster canonicals)
  -> line-level boilerplate removal
  -> near-dup canonicalization (MinHash+LSH or SimHash bands)
  -> span-level benchmark decontamination (optional, needs bench)
  -> source mixing to target weights (optional)
  -> deterministic shuffle order (optional)
  -> token-budget pack bins (optional)

Scale note (SCALING.md "composed-pipeline plan growth"): stages that
join frames derived from a shared ancestor multiply the logical plan
tree; with ``checkpoint=True`` (default) the builder truncates
lineage with localCheckpoint at those fan-out boundaries, keeping
plan size linear in stages. Multi-job production pipelines should
land parquet between stages instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import curation, dedup, text


@dataclass
class CurationConfig:
    # gates
    min_tokens: int = 5
    langs: tuple[str, ...] | None = None     # keep only these pred_langs
    max_stopword_ratio: float | None = None
    # dedup stages
    exact_dedup: bool = True
    line_dedup: bool = True
    near_dedup: str | None = "minhash"       # None | minhash | simhash
    # optional stages
    decontaminate: bool = False              # needs bench= at build time
    mix_weights: dict[str, float] | None = None
    # temperature (alpha) sampling — the power-law alternative to
    # explicit mix_weights (curation.temperature_mix); mutually
    # exclusive with mix_weights
    mix_temperature_budget: int | None = None
    mix_temperature_alpha: float = 0.7
    mix_stratum: str = "source"
    shuffle_seed: str | None = None
    pack_budget: int | None = None
    pack_stratum: str = "source"
    # lineage truncation at fan-out boundaries (see module docstring)
    checkpoint: bool = True

    def __post_init__(self):
        if self.near_dedup not in (None, "minhash", "simhash"):
            raise ValueError(
                f"near_dedup must be None|minhash|simhash, "
                f"got {self.near_dedup!r}")
        if self.mix_weights is not None and not self.mix_weights:
            raise ValueError("mix_weights must be non-empty when set")
        if self.mix_weights is not None \
                and self.mix_temperature_budget is not None:
            raise ValueError(
                "mix_weights and mix_temperature_budget are mutually "
                "exclusive — pick explicit targets OR alpha sampling")
        if self.mix_temperature_budget is not None \
                and self.mix_temperature_budget <= 0:
            raise ValueError("mix_temperature_budget must be positive")


def _cut(df: DataFrame, cfg: CurationConfig) -> DataFrame:
    return df.localCheckpoint() if cfg.checkpoint else df


def build_curation(docs: DataFrame, cfg: CurationConfig,
                   bench: DataFrame | None = None) -> DataFrame:
    """Compose the configured pipeline over ``docs`` (doc_id, text,
    source, ...). Returns the curated corpus: (doc_id, text, source
    [, shuffle_pos][, bin_id, n_tokens])."""
    if cfg.decontaminate and bench is None:
        raise ValueError("decontaminate=True needs a bench DataFrame")

    # -- gates: pure filters, single-branch, no checkpoint needed
    q = text.quality_score(docs).select(
        "doc_id", "n_tokens", "stopword_ratio")
    conds = [F.col("n_tokens") >= cfg.min_tokens]
    if cfg.max_stopword_ratio is not None:
        conds.append(F.col("stopword_ratio") <= cfg.max_stopword_ratio)
    gated = docs.join(q, "doc_id")
    if cfg.langs is not None:
        lang = text.lang_id(docs).select("doc_id", "pred_lang")
        gated = gated.join(lang, "doc_id")
        conds.append(F.col("pred_lang").isin(*cfg.langs))
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    cur = gated.filter(pred).select(*docs.columns)

    # -- exact dedup: keep cluster canonicals
    if cfg.exact_dedup:
        ex = dedup.exact_dedup(cur)
        cur = _cut(cur.join(
            ex.filter(F.col("doc_id") == F.col("canonical_id"))
              .select("doc_id"), "doc_id"), cfg)

    # -- line-level boilerplate
    if cfg.line_dedup:
        carried = [c for c in cur.columns if c not in ("text",)]
        cur = _cut(
            curation.line_dedup(cur)
            .select("doc_id", F.col("clean_text").alias("text"))
            .join(cur.select(*carried), "doc_id"), cfg)

    # -- near-dup canonicalization: drop the higher id of each pair
    if cfg.near_dedup:
        pairs = (dedup.minhash_lsh_pairs(cur)
                 if cfg.near_dedup == "minhash"
                 else dedup.simhash_pairs(cur))
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        cur = _cut(cur.join(losers, "doc_id", "left_anti"), cfg)

    # -- span-level benchmark decontamination
    if cfg.decontaminate:
        spans = dedup.decontaminate_spans(cur, bench)
        carried = [c for c in cur.columns if c not in ("text",)]
        cur = _cut(
            dedup.strip_spans(cur, spans)
            .select("doc_id", F.col("clean_text").alias("text"))
            .join(cur.select(*carried), "doc_id"), cfg)

    # -- mixing: explicit targets OR temperature (alpha) sampling
    if cfg.mix_weights:
        picked = curation.mix_to_weights(
            cur.select("doc_id", cfg.mix_stratum), cfg.mix_weights,
            stratum_col=cfg.mix_stratum)
        cur = _cut(cur.join(picked.select("doc_id"), "doc_id"), cfg)
    elif cfg.mix_temperature_budget is not None:
        picked = curation.temperature_mix(
            cur.select("doc_id", cfg.mix_stratum),
            budget=cfg.mix_temperature_budget,
            alpha=cfg.mix_temperature_alpha,
            stratum_col=cfg.mix_stratum)
        cur = _cut(cur.join(picked.select("doc_id"), "doc_id"), cfg)

    # -- deterministic order / packing annotations
    if cfg.shuffle_seed is not None:
        cur = cur.join(
            curation.deterministic_shuffle(cur, seed=cfg.shuffle_seed),
            "doc_id")
    if cfg.pack_budget is not None:
        cur = cur.join(
            curation.pack_sequences(
                cur.select("doc_id", "text", cfg.pack_stratum),
                budget=cfg.pack_budget,
                stratum_col=cfg.pack_stratum)
            .select("doc_id", "n_tokens", "bin_id"), "doc_id")
    return cur


def load_curation_config(path: str) -> CurationConfig:
    """TOML -> CurationConfig (the drainer.toml analog for recipes)."""
    import tomllib
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    return parse_curation_config(raw)


def parse_curation_config(raw: dict) -> CurationConfig:
    kw = dict(raw)
    if "langs" in kw and kw["langs"] is not None:
        kw["langs"] = tuple(kw["langs"])
    known = set(CurationConfig.__dataclass_fields__)
    unknown = set(kw) - known
    if unknown:
        raise ValueError(f"unknown curation config keys: {sorted(unknown)}")
    return CurationConfig(**kw)
