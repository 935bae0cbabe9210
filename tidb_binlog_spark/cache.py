"""Managed persist registry.

Operators that self-join (LSH pairs, simhash chunks, IVF assignment)
persist their build side so both join branches don't recompute the
signature pipeline. Those DataFrames are returned lazily, so the
operator itself can never unpersist. Harnesses that run many operators
in one session (bench, the correctness gate) call ``release_all()``
between queries to keep executor storage bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def managed_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _LIVE.append(df)
    return df


def release_all() -> int:
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped
            pass
    return n
