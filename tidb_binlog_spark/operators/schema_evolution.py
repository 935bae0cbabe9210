"""Schema-version gate + default back-fill for old-version rows.

Reference:
- each DML carries SchemaVersion; the catalog replays DDL jobs up to
  that version before decoding (drainer/schema.go:293-331,
  drainer/syncer.go:388-397);
- rows encoded at an older version miss newly added columns; the
  decoder back-fills column defaults / zero values
  (drainer/translator/translator.go:169-227,293-326);
- the catalog retains the last two schema versions per table
  (drainer/schema.go:211-234).

Spark-first: the registry is a plain broadcastable dict of
(table, version) -> {column: default}; back-fill is a coalesce
projection per column — pure Catalyst, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SchemaRegistry:
    """Versioned catalog: (tbl, version) -> ordered {column: default}.

    The Spark analog of drainer.Schema — driver-held, broadcast into
    expressions (it is tiny: schema metadata, not data).
    """

    def __init__(self) -> None:
        self._versions: dict[str, dict[int, dict[str, str | None]]] = {}

    def add_version(self, tbl: str, version: int,
                    columns: dict[str, str | None]) -> None:
        self._versions.setdefault(tbl, {})[version] = dict(columns)

    def columns_at(self, tbl: str, version: int) -> dict[str, str | None]:
        versions = self._versions.get(tbl, {})
        applicable = [v for v in sorted(versions) if v <= version]
        if not applicable:
            raise KeyError(f"no schema for {tbl} at version {version}")
        return versions[applicable[-1]]

    def latest_version(self, tbl: str) -> int:
        return max(self._versions.get(tbl, {0: {}}))


def backfill_defaults(changes: DataFrame, registry: SchemaRegistry,
                      tbl: str, json_col: str = "row_json") -> DataFrame:
    """Decode a JSON row image at each event's schema_version, back-fill
    missing columns with that version's defaults, and emit the row at
    the LATEST schema (missing-in-old-version columns get defaults —
    translator.go:169-227 semantics).

    get_json_object returns NULL for absent keys, so back-fill is a
    single coalesce per column (codegen'd).
    """
    latest = registry.latest_version(tbl)
    target_cols = registry.columns_at(tbl, latest)
    out = changes
    for col_name, default in target_cols.items():
        extracted = F.get_json_object(F.col(json_col), f"$.{col_name}")
        # a column only exists for the event if its schema_version
        # already includes it; otherwise back-fill the default.
        version_has = F.lit(False)
        for v in sorted(registry._versions[tbl]):
            if col_name in registry.columns_at(tbl, v):
                version_has = version_has | (F.col("schema_version") >= F.lit(v))
        value = F.when(version_has, F.coalesce(extracted, F.lit(default))) \
                 .otherwise(F.lit(default))
        out = out.withColumn(col_name, value)
    return out
