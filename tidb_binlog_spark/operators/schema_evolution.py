"""Schema-version gate + default back-fill + DDL-stream catalog replay.

Reference:
- each DML carries SchemaVersion; the catalog replays DDL jobs up to
  that version before decoding (drainer/schema.go:293-331,
  drainer/syncer.go:388-397);
- the catalog itself is BUILT by replaying the ordered DDL-job stream:
  CreateTable/AddColumn/DropColumn/RenameTable/TruncateTable/DropTable
  each produce a new schema version; truncated table ids are tracked so
  late mutations for the pre-truncate incarnation are dropped
  (drainer/schema.go:360-561; drainer/syncer.go:744-762);
- rows encoded at an older version miss newly added columns; the
  decoder back-fills column defaults / zero values
  (drainer/translator/translator.go:169-227,293-326);
- the catalog retains the last two schema versions per table
  (drainer/schema.go:211-234).

Spark-first: the registry is a plain broadcastable dict of
(table, version) -> {column: default}; replay is driver-side (DDL
events are rare and inherently serial — the reference also replays
them on one thread); back-fill/decoding over the DML stream is a
coalesce projection per column plus a broadcast join against the tiny
version-interval dimension — pure Catalyst, no per-row Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_DEFAULT_RE = r"(?:\s+DEFAULT\s+(?P<default>'[^']*'|[^\s,()]+))?"


def _strip_quotes(lit: str | None) -> str | None:
    if lit is None:
        return None
    if len(lit) >= 2 and lit[0] == "'" and lit[-1] == "'":
        return lit[1:-1]
    return lit


# table-level constraint heads inside CREATE TABLE (...) — not columns
# ("partition" covers ALTER ... ADD PARTITION reaching the ADD-clause
# splitter: it must fall through to the partition classification, not
# read as a column)
_CONSTRAINT_HEADS = frozenset(
    ("primary", "unique", "key", "index", "constraint", "foreign",
     "check", "fulltext", "spatial", "partition"))


def _default_literal(rest: str) -> str | None:
    """The DEFAULT literal in an attribute tail, scanning OUTSIDE
    string literals only — `COMMENT 'no DEFAULT 5 here'` must not
    invent a default (the naive re.search over the whole tail did)."""
    i, n = 0, len(rest)
    while i < n:
        if rest[i] == "'":
            j = rest.find("'", i + 1)
            i = n if j < 0 else j + 1
            continue
        if (rest[i] in "Dd"
                and (i == 0 or not (rest[i - 1].isalnum()
                                    or rest[i - 1] == "_"))):
            m = re.match(r"(?is)DEFAULT\s+('[^']*'|[^\s,()]+)", rest[i:])
            if m:
                return m.group(1)
        i += 1
    return None


def _parse_col_def(part: str) -> tuple[str, str | None] | None:
    """One column definition -> (name, default) or None.

    Tolerant of the attribute tail (NOT NULL, COMMENT, AFTER/FIRST
    position, character sets, generated-column clauses): the catalog
    only tracks name + DEFAULT, matching what the back-fill consumes
    (translator.go getDefaultOrZeroValue reads the default only).
    Backticked names may contain any non-backtick characters."""
    m = re.match(r"(?is)^\s*(?:`(?P<bq>[^`]+)`|(?P<plain>\w+))\s+"
                 r"(?P<type>\w+(?:\([^)]*\))?)(?P<rest>.*)$", part)
    if not m:
        return None
    lit = _default_literal(m.group("rest") or "")
    return (m.group("bq") or m.group("plain"), _strip_quotes(lit))


def _parse_col_defs(defs_sql: str) -> tuple[dict, list[str]]:
    """Comma-separated definitions -> ({col: default}, skipped_parts).

    Anything that is neither a recognizable column nor a table-level
    constraint lands in ``skipped_parts`` — the audit signal replay
    surfaces so an unparsed definition can never vanish silently."""
    cols: dict[str, str | None] = {}
    skipped: list[str] = []
    for part in re.split(r",(?![^()]*\))", defs_sql):
        part = part.strip()
        if not part:
            continue
        # only an UNQUOTED head can be a constraint keyword — a
        # backticked `key`/`index`/`partition` is an identifier and
        # must parse as a column, not vanish
        head = re.match(r"(?is)^(\w+)", part)
        if head and head.group(1).lower() in _CONSTRAINT_HEADS:
            continue
        parsed = _parse_col_def(part)
        if parsed is None:
            skipped.append(part)
        else:
            cols[parsed[0]] = parsed[1]
    return cols, skipped


def parse_ddl(sql: str) -> dict:
    """Classify + destructure one DDL statement (the regex analog of
    the reference's TiDB-parser ast switch, drainer/schema.go:360-561).

    Returns {kind, table, ...kind-specific fields}; kind='other' for
    statements the catalog does not track.
    """
    s = sql.strip().rstrip(";")
    # optionally db-qualified table name: `db`.`tbl` / db.tbl / tbl
    # optionally db-qualified name; backticked names may contain any
    # non-backtick characters (spaces included)
    _T = r"(?:(?:`(?P<d1>[^`]+)`|(?P<d2>\w+))\.)?(?:`(?P<t1>[^`]+)`|(?P<t2>\w+))"

    def _t(m):
        return m.group("t1") or m.group("t2")

    def _d(m):
        return m.group("d1") or m.group("d2")
    m = re.match(r"(?is)^CREATE\s+(?:DATABASE|SCHEMA)\s+"
                 r"(?:IF\s+NOT\s+EXISTS\s+)?`?(?P<db>\w+)`?\s*$", s)
    if m:
        return {"kind": "create_schema", "table": None, "db": m.group("db")}
    m = re.match(r"(?is)^DROP\s+(?:DATABASE|SCHEMA)\s+"
                 r"(?:IF\s+EXISTS\s+)?`?(?P<db>\w+)`?\s*$", s)
    if m:
        return {"kind": "drop_schema", "table": None, "db": m.group("db")}
    m = re.match(r"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
                 + _T + r"\s*\((?P<cols>.*)\)\s*$", s)
    if m:
        cols, skipped = _parse_col_defs(m.group("cols"))
        return {"kind": "create_table", "table": _t(m),
                "db": _d(m), "columns": cols,
                "skipped_columns": skipped}
    # multi-column ADD, parenthesized form:
    #   ALTER TABLE t ADD COLUMN (a INT, b VARCHAR(10) DEFAULT 'x')
    m = re.match(r"(?is)^ALTER\s+TABLE\s+" + _T
                 + r"\s+ADD\s+(?:COLUMN\s+)?\((?P<cols>.*)\)\s*$", s)
    if m:
        cols, skipped = _parse_col_defs(m.group("cols"))
        return {"kind": "add_columns", "table": _t(m),
                "db": _d(m), "columns": cols,
                "skipped_columns": skipped}
    # comma-separated ADD clauses:
    #   ALTER TABLE t ADD COLUMN a INT, ADD COLUMN b INT AFTER a
    m = re.match(r"(?is)^ALTER\s+TABLE\s+" + _T
                 + r"\s+(?P<adds>ADD\s+(?:COLUMN\s+)?.+)$", s)
    if m and re.match(r"(?is)^ADD\s", m.group("adds")):
        parts = re.split(r",(?![^()]*\))", m.group("adds"))
        if all(re.match(r"(?is)^\s*ADD\s+(?:COLUMN\s+)?", p) for p in parts):
            defs = ", ".join(
                re.sub(r"(?is)^\s*ADD\s+(?:COLUMN\s+)?", "", p)
                for p in parts)
            cols, skipped = _parse_col_defs(defs)
            if cols or skipped:
                if len(cols) == 1 and not skipped and len(parts) == 1:
                    ((c, d),) = cols.items()
                    return {"kind": "add_column", "table": _t(m),
                            "db": _d(m), "column": c, "default": d}
                return {"kind": "add_columns", "table": _t(m),
                        "db": _d(m), "columns": cols,
                        "skipped_columns": skipped}
    m = re.match(r"(?is)^ALTER\s+TABLE\s+" + _T + r"\s+DROP\s+COLUMN\s+"
                 r"`?(?P<c>\w+)`?\s*$", s)
    if m:
        return {"kind": "drop_column", "table": _t(m),
                "db": _d(m), "column": m.group("c")}
    m = re.match(r"(?is)^ALTER\s+TABLE\s+" + _T + r"\s+RENAME\s+COLUMN\s+"
                 r"`?(?P<a>\w+)`?\s+TO\s+`?(?P<b2>\w+)`?\s*$", s)
    if m:
        return {"kind": "rename_column", "table": _t(m),
                "db": _d(m), "column": m.group("a"),
                "new_column": m.group("b2")}
    m = re.match(r"(?is)^ALTER\s+TABLE\s+" + _T + r"\s+CHANGE\s+(?:COLUMN\s+)?"
                 r"`?(?P<a>[^`\s]+)`?\s+(?P<def2>.+)$", s)
    if m and _parse_col_def(m.group("def2")):
        c, d = _parse_col_def(m.group("def2"))
        return {"kind": "rename_column", "table": _t(m),
                "db": _d(m), "column": m.group("a"),
                "new_column": c, "default": d}
    m = re.match(r"(?is)^ALTER\s+TABLE\s+" + _T + r"\s+MODIFY\s+(?:COLUMN\s+)?"
                 r"(?P<def2>.+)$", s)
    if m and _parse_col_def(m.group("def2")):
        c, d = _parse_col_def(m.group("def2"))
        return {"kind": "modify_column", "table": _t(m),
                "db": _d(m), "column": c, "default": d}
    m = re.match(r"(?is)^RENAME\s+TABLE\s+" + _T
                 + r"\s+TO\s+(?:`?(?P<nd>\w+)`?\.)?`?(?P<b>\w+)`?\s*$", s)
    if m:
        return {"kind": "rename_table", "table": _t(m),
                "db": _d(m), "new_name": m.group("b"),
                "new_db": m.group("nd")}
    m = re.match(r"(?is)^TRUNCATE\s+(?:TABLE\s+)?" + _T + r"\s*$", s)
    if m:
        return {"kind": "truncate", "table": _t(m), "db": _d(m)}
    m = re.match(r"(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?" + _T + r"\s*$", s)
    if m:
        return {"kind": "drop_table", "table": _t(m), "db": _d(m)}
    return {"kind": "other", "table": None}


class SchemaRegistry:
    """Versioned catalog: (tbl, version) -> ordered {column: default}.

    The Spark analog of drainer.Schema — driver-held, broadcast into
    expressions (it is tiny: schema metadata, not data). Versions are
    either hand-fed (``add_version``) or BUILT from an ordered DDL
    stream (``apply_ddl_events`` — drainer/schema.go:360-561).
    """

    def __init__(self) -> None:
        self._versions: dict[str, dict[int, dict[str, str | None]]] = {}
        # replay state (populated by apply_ddl_events)
        self.version_ts: dict[str, dict[int, int]] = {}   # tbl -> v -> ddl ts
        self.col_added_at: dict[str, dict[str, int]] = {} # tbl -> col -> v
        self.renamed_to: dict[str, str] = {}              # old -> new (final)
        self.truncate_ts: dict[str, int] = {}             # tbl -> last truncate
        self.dropped: set[str] = set()
        self.drop_ts: dict[str, int] = {}                 # tbl -> drop ts
        self.databases: set[str] = set()                  # known schemas
        self.table_db: dict[str, str] = {}                # tbl -> owning db
        # tbl -> current col -> [(version, name_before_that_version)]:
        # rows encoded before `version` carry the old json key
        self.col_renames: dict[str, dict[str, list[tuple[int, str]]]] = {}
        self.ddl_log: list[dict] = []

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

    # -- DDL-stream replay (drainer/schema.go:293-331,360-561) --------------
    def apply_ddl_events(self, events: list[tuple[int, str]],
                         retain: int | None = None) -> list[dict]:
        """Replay an ordered DDL stream [(commit_ts, ddl_sql), ...] into
        catalog versions. Every applied DDL yields a new version of its
        table (version number = per-table ordinal, matching the
        reference's monotonically increasing SchemaVersion). Rename
        moves the version history to the new name; truncate records the
        cut ts (late pre-truncate mutations are droppable —
        syncer.go:744-762); ``retain`` keeps only the last N versions
        per table (schema.go:211-234 keeps two).

        Returns the replay log (one dict per event with the action
        taken) for auditing/tests.
        """
        for commit_ts, sql in sorted(events, key=lambda e: e[0]):
            info = parse_ddl(sql)
            kind, tbl = info["kind"], info.get("table")
            entry = {"commit_ts": commit_ts, "ddl_sql": sql, "kind": kind,
                     "table": tbl, "applied": True}
            # audit signal (ADVICE r2): definitions the parser could
            # not destructure are surfaced, never silently dropped
            if info.get("skipped_columns"):
                entry["skipped_columns"] = info["skipped_columns"]
            if kind == "create_schema":
                self.databases.add(info["db"])
            elif kind == "drop_schema":
                # ActionDropSchema cascades: every table of the schema is
                # dropped in one job (drainer/schema.go:398-406)
                db = info["db"]
                self.databases.discard(db)
                for t, owner in self.table_db.items():
                    if owner == db and t in self._versions \
                            and t not in self.dropped:
                        self.dropped.add(t)
                        self.drop_ts[t] = commit_ts
            elif kind == "create_table":
                cols = dict(info["columns"])
                self._versions[tbl] = {1: cols}
                self.version_ts[tbl] = {1: commit_ts}
                self.col_added_at[tbl] = {c: 1 for c in cols}
                self.dropped.discard(tbl)
                self.drop_ts.pop(tbl, None)
                if info.get("db"):
                    self.table_db[tbl] = info["db"]
                # a re-created table under a previously renamed-away
                # name is a NEW incarnation: old-name lookups must stop
                # resolving to the rename target (schema.go recreates
                # the id->name binding on CreateTable).
                self.renamed_to.pop(tbl, None)
            elif kind == "add_column" and tbl in self._versions:
                v = self.latest_version(tbl) + 1
                cols = dict(self.columns_at(tbl, v - 1))
                cols[info["column"]] = info["default"]
                self._versions[tbl][v] = cols
                self.version_ts[tbl][v] = commit_ts
                self.col_added_at[tbl][info["column"]] = v
            elif kind == "add_columns" and tbl in self._versions:
                # multi-column ADD: ONE schema version for the whole
                # statement (one DDL job -> one SchemaVersion bump)
                v = self.latest_version(tbl) + 1
                cols = dict(self.columns_at(tbl, v - 1))
                for c, d in info["columns"].items():
                    cols[c] = d
                    self.col_added_at[tbl][c] = v
                self._versions[tbl][v] = cols
                self.version_ts[tbl][v] = commit_ts
            elif kind == "rename_column" and tbl in self._versions:
                old_c, new_c = info["column"], info["new_column"]
                v = self.latest_version(tbl) + 1
                cols = {}
                for c, d in self.columns_at(tbl, v - 1).items():
                    if c == old_c:
                        # CHANGE without a DEFAULT clause keeps the old
                        # default (same rule as the modify_column arm)
                        nd = info.get("default")
                        cols[new_c] = d if nd is None else nd
                    else:
                        cols[c] = d
                self._versions[tbl][v] = cols
                self.version_ts[tbl][v] = commit_ts
                added = self.col_added_at[tbl]
                if old_c in added:
                    added[new_c] = added.pop(old_c)
                hist = self.col_renames.setdefault(tbl, {})
                # chain: prior renames of old_c now belong to new_c
                hist[new_c] = hist.pop(old_c, []) + [(v, old_c)]
            elif kind == "modify_column" and tbl in self._versions:
                # type/default change: new version, same column set
                # (ActionModifyColumn -> ReplaceTable, schema.go default
                # arm); only the default is observable in our model.
                v = self.latest_version(tbl) + 1
                cols = dict(self.columns_at(tbl, v - 1))
                if info["column"] in cols and info.get("default") is not None:
                    cols[info["column"]] = info["default"]
                self._versions[tbl][v] = cols
                self.version_ts[tbl][v] = commit_ts
            elif kind == "drop_column" and tbl in self._versions:
                v = self.latest_version(tbl) + 1
                cols = dict(self.columns_at(tbl, v - 1))
                cols.pop(info["column"], None)
                self._versions[tbl][v] = cols
                self.version_ts[tbl][v] = commit_ts
            elif kind == "rename_table" and tbl in self._versions:
                new = info["new_name"]
                v = self.latest_version(tbl) + 1
                self._versions[new] = self._versions.pop(tbl)
                self._versions[new][v] = dict(self.columns_at(new, v - 1))
                self.version_ts[new] = self.version_ts.pop(tbl)
                self.version_ts[new][v] = commit_ts
                self.col_added_at[new] = self.col_added_at.pop(tbl)
                if tbl in self.truncate_ts:
                    self.truncate_ts[new] = self.truncate_ts.pop(tbl)
                if tbl in self.table_db:
                    old_db = self.table_db.pop(tbl)
                    self.table_db[new] = info.get("new_db") or old_db
                if tbl in self.col_renames:
                    self.col_renames[new] = self.col_renames.pop(tbl)
                # keep old-name lookups resolving to the new history
                for old, tgt in list(self.renamed_to.items()):
                    if tgt == tbl:
                        self.renamed_to[old] = new
                self.renamed_to[tbl] = new
            elif kind == "truncate" and tbl in self._versions:
                v = self.latest_version(tbl) + 1
                self._versions[tbl][v] = dict(self.columns_at(tbl, v - 1))
                self.version_ts[tbl][v] = commit_ts
                self.truncate_ts[tbl] = commit_ts
            elif kind == "drop_table" and tbl in self._versions:
                self.dropped.add(tbl)
                self.drop_ts[tbl] = commit_ts
            else:
                entry["applied"] = False
            self.ddl_log.append(entry)
            if retain and tbl:
                final = self.resolve_name(tbl)
                if final in self._versions and len(self._versions[final]) > retain:
                    for old_v in sorted(self._versions[final])[:-retain]:
                        del self._versions[final][old_v]
        return self.ddl_log

    def resolve_name(self, tbl: str) -> str:
        return self.renamed_to.get(tbl, tbl)

    def version_intervals(self, spark: SparkSession, tbl: str) -> DataFrame:
        """The tiny (version, start_ts, end_ts) dimension for a table —
        broadcast-joined against the DML stream to stamp each mutation
        with the schema version active at its commit_ts."""
        tbl = self.resolve_name(tbl)
        ts = sorted(self.version_ts[tbl].items())
        rows = []
        for i, (v, start) in enumerate(ts):
            end = ts[i + 1][1] if i + 1 < len(ts) else None
            rows.append((v, start, end))
        return spark.createDataFrame(
            rows, "active_version int, v_start_ts long, v_end_ts long")


def decode_with_replay(changes: DataFrame, registry: SchemaRegistry,
                       tbl: str, spark: SparkSession,
                       json_col: str = "row_json") -> DataFrame:
    """Decode a DML stream against a catalog BUILT from a DDL stream
    (apply_ddl_events): stamp each mutation with the schema version
    active at its commit_ts (broadcast range join on the tiny version
    dimension), drop mutations from a truncated incarnation
    (commit_ts <= truncate_ts — syncer.go:744-762), emit rows at the
    LATEST schema with defaults back-filled for columns the row's
    version did not yet have (translator.go:169-227), under the table's
    FINAL (post-rename) name.
    """
    final = registry.resolve_name(tbl)
    intervals = registry.version_intervals(spark, tbl)
    stamped = changes.join(
        F.broadcast(intervals),
        (F.col("commit_ts") >= F.col("v_start_ts"))
        & (F.col("v_end_ts").isNull() | (F.col("commit_ts") < F.col("v_end_ts"))))
    cut = registry.truncate_ts.get(final)
    if cut is not None:
        stamped = stamped.filter(F.col("commit_ts") > F.lit(cut))
    # mutations at/after a DROP TABLE are skipped — the reference
    # removes the table from the catalog so they no longer decode
    drop_cut = registry.drop_ts.get(final)
    if drop_cut is not None:
        stamped = stamped.filter(F.col("commit_ts") < F.lit(drop_cut))
    latest = registry.latest_version(final)
    target_cols = registry.columns_at(final, latest)
    out = stamped.withColumn("target_tbl", F.lit(final))
    for col_name, default in target_cols.items():
        added_at = registry.col_added_at[final].get(col_name, 1)
        # rename-column history: a row encoded before rename version v
        # carries the column under its then-current json key
        extracted = F.get_json_object(F.col(json_col), f"$.{col_name}")
        hist = registry.col_renames.get(final, {}).get(col_name, [])
        for v, old_name in sorted(hist, reverse=True):
            extracted = (
                F.when(F.col("active_version") >= F.lit(v), extracted)
                 .otherwise(
                     F.get_json_object(F.col(json_col), f"$.{old_name}")))
        out = out.withColumn(
            col_name,
            F.when(F.col("active_version") >= F.lit(added_at),
                   F.coalesce(extracted, F.lit(default)))
             .otherwise(F.lit(default)))
    return out.drop("v_start_ts", "v_end_ts")


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
