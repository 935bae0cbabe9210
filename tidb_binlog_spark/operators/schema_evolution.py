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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sqltok


# table-level constraint heads inside CREATE TABLE (...) — not columns
# ("partition" covers ALTER ... ADD PARTITION reaching the ADD-clause
# path: it must fall through to the partition classification, not
# read as a column)
_CONSTRAINT_HEADS = frozenset(
    ("primary", "unique", "key", "index", "constraint", "foreign",
     "check", "fulltext", "spatial", "partition"))


def _name_at(toks, i):
    """Identifier token at ``i`` -> (value, next_i), else None."""
    if i < len(toks) and toks[i].kind in ("ident", "word"):
        return toks[i].value, i + 1
    return None


def _qualified_name(toks, i):
    """``[db.]table`` -> (db, table, next_i), else None. Backticked
    names may contain any non-backtick characters (spaces included)."""
    r = _name_at(toks, i)
    if r is None:
        return None
    first, j = r
    if j < len(toks) and sqltok.is_punct(toks[j], "."):
        r2 = _name_at(toks, j + 1)
        if r2 is None:
            return None
        return first, r2[0], r2[1]
    return None, first, j


def _default_from_tail(toks, i):
    """The DEFAULT literal in an attribute tail. String literals are
    single tokens, so ``COMMENT 'no DEFAULT 5 here'`` can never invent
    a default (the historical regex failure mode)."""
    while i < len(toks):
        if sqltok.kw(toks[i]) == "default" and i + 1 < len(toks):
            t = toks[i + 1]
            if t.kind == "string":
                return t.value
            if t.kind in ("number", "word"):
                return t.text
            if (sqltok.is_punct(t, "-") and i + 2 < len(toks)
                    and toks[i + 2].kind == "number"):
                return "-" + toks[i + 2].text     # DEFAULT -1
            return None          # DEFAULT (expr) — not tracked
        i += 1
    return None


def _col_def_tokens(toks):
    """One column definition (token span) -> (name, default) or None.

    Tolerant of the attribute tail (NOT NULL, COMMENT, AFTER/FIRST,
    character sets, generated-column clauses): the catalog only tracks
    name + DEFAULT, matching what the back-fill consumes
    (translator.go getDefaultOrZeroValue reads the default only)."""
    if not toks or toks[0].kind not in ("ident", "word"):
        return None
    name = toks[0].value
    i = 1
    if i >= len(toks) or toks[i].kind != "word":
        return None              # a type is required
    i += 1
    g = sqltok.paren_group(toks, i)     # VARCHAR(10) / ENUM('a','b')
    if g is not None:
        i = g[1]
    return name, _default_from_tail(toks, i)


def _parse_col_defs_tokens(sql, toks):
    """Comma-separated definitions -> ({col: default}, skipped_raw).

    Anything that is neither a recognizable column nor a table-level
    constraint lands in ``skipped`` as its RAW source text — the audit
    signal replay surfaces so an unparsed definition can never vanish
    silently."""
    cols, skipped = {}, []
    for part in sqltok.split_top_level(toks):
        if not part:
            continue
        # only an UNQUOTED head can be a constraint keyword — a
        # backticked `key`/`index`/`partition` is an identifier and
        # must parse as a column, not vanish
        if part[0].kind == "word" and part[0].value.lower() in _CONSTRAINT_HEADS:
            continue
        cd = _col_def_tokens(part)
        if cd is None:
            skipped.append(sqltok.raw_span(sql, part).strip())
        else:
            cols[cd[0]] = cd[1]
    return cols, skipped


def _skip_if_clause(toks, i, *words):
    """Skip an optional keyword run (IF NOT EXISTS / IF EXISTS)."""
    if all(i + k < len(toks) and sqltok.kw(toks[i + k]) == w
           for k, w in enumerate(words)):
        return i + len(words)
    return i


def _alter_actions(sql, db, tbl, actions):
    """Classify the comma-separated action list of an ALTER TABLE."""
    k = sqltok.kw
    if len(actions) == 1:
        a = actions[0]
        if (len(a) == 3 and k(a[0]) == "drop" and k(a[1]) == "column"
                and a[2].kind in ("ident", "word")):
            return {"kind": "drop_column", "table": tbl, "db": db,
                    "column": a[2].value}
        if (len(a) == 5 and k(a[0]) == "rename" and k(a[1]) == "column"
                and a[2].kind in ("ident", "word") and k(a[3]) == "to"
                and a[4].kind in ("ident", "word")):
            return {"kind": "rename_column", "table": tbl, "db": db,
                    "column": a[2].value, "new_column": a[4].value}
        if k(a[0]) == "change" and len(a) > 1:
            i = 2 if k(a[1]) == "column" else 1
            if i < len(a) and a[i].kind in ("ident", "word"):
                cd = _col_def_tokens(a[i + 1:])
                if cd is not None:
                    return {"kind": "rename_column", "table": tbl,
                            "db": db, "column": a[i].value,
                            "new_column": cd[0], "default": cd[1]}
        if k(a[0]) == "modify" and len(a) > 1:
            i = 2 if k(a[1]) == "column" else 1
            cd = _col_def_tokens(a[i:])
            if cd is not None:
                return {"kind": "modify_column", "table": tbl, "db": db,
                        "column": cd[0], "default": cd[1]}
    # ADD [COLUMN] path — every action must be an ADD; constraint-ish
    # ADDs (PARTITION/INDEX/KEY/...) contribute nothing, garbage is
    # audited, and if nothing column-like remains the statement is not
    # a catalog event.
    cols, skipped = {}, []
    paren_form = False
    for a in actions:
        if len(a) < 2 or k(a[0]) != "add":
            return {"kind": "other", "table": None}
        i = 2 if k(a[1]) == "column" else 1
        g = sqltok.paren_group(a, i)
        if g is not None and g[1] == len(a):
            c, s = _parse_col_defs_tokens(sql, g[0])
            cols.update(c)
            skipped.extend(s)
            paren_form = True
            continue
        if i >= len(a):
            return {"kind": "other", "table": None}
        if a[i].kind == "word" and a[i].value.lower() in _CONSTRAINT_HEADS:
            continue
        cd = _col_def_tokens(a[i:])
        if cd is None:
            skipped.append(sqltok.raw_span(sql, a[i:]).strip())
        else:
            cols[cd[0]] = cd[1]
    if not cols and not skipped:
        return {"kind": "other", "table": None}
    if (len(cols) == 1 and not skipped and len(actions) == 1
            and not paren_form):
        ((c, d),) = cols.items()
        return {"kind": "add_column", "table": tbl, "db": db,
                "column": c, "default": d}
    return {"kind": "add_columns", "table": tbl, "db": db,
            "columns": cols, "skipped_columns": skipped}


def parse_ddl(sql: str) -> dict:
    """Classify + destructure one DDL statement — a real lexer-backed
    parser standing in for the reference's TiDB-parser ast switch
    (drainer/schema.go:360-561, pkg/loader/load.go:380-399). String
    literals are single tokens, so commas/parens inside COMMENT or
    ENUM defaults can never derail structure.

    Returns {kind, table, ...kind-specific fields}; kind='other' for
    statements the catalog does not track.
    """
    toks = sqltok.tokenize(sql)
    while toks and sqltok.is_punct(toks[-1], ";"):
        toks = toks[:-1]
    if len(toks) < 2:
        return {"kind": "other", "table": None}
    k = sqltok.kw
    k0, k1 = k(toks[0]), k(toks[1])

    if k0 == "create" and k1 in ("database", "schema"):
        i = _skip_if_clause(toks, 2, "if", "not", "exists")
        nm = _name_at(toks, i)
        if nm is not None and nm[1] == len(toks):
            return {"kind": "create_schema", "table": None, "db": nm[0]}
    if k0 == "drop" and k1 in ("database", "schema"):
        i = _skip_if_clause(toks, 2, "if", "exists")
        nm = _name_at(toks, i)
        if nm is not None and nm[1] == len(toks):
            return {"kind": "drop_schema", "table": None, "db": nm[0]}
    if k0 == "create" and k1 == "table":
        i = _skip_if_clause(toks, 2, "if", "not", "exists")
        q = _qualified_name(toks, i)
        if q is not None:
            g = sqltok.paren_group(toks, q[2])
            if g is not None:   # trailing table options are tolerated
                cols, skipped = _parse_col_defs_tokens(sql, g[0])
                return {"kind": "create_table", "table": q[1],
                        "db": q[0], "columns": cols,
                        "skipped_columns": skipped}
    if k0 == "alter" and k1 == "table":
        q = _qualified_name(toks, 2)
        if q is not None and q[2] < len(toks):
            actions = sqltok.split_top_level(toks[q[2]:])
            return _alter_actions(sql, q[0], q[1], actions)
    if k0 == "rename" and k1 == "table":
        q = _qualified_name(toks, 2)
        if q is not None and q[2] < len(toks) and k(toks[q[2]]) == "to":
            q2 = _qualified_name(toks, q[2] + 1)
            if q2 is not None and q2[2] == len(toks):
                return {"kind": "rename_table", "table": q[1],
                        "db": q[0], "new_name": q2[1], "new_db": q2[0]}
    if k0 == "truncate":
        i = 2 if k1 == "table" else 1
        q = _qualified_name(toks, i)
        if q is not None and q[2] == len(toks):
            return {"kind": "truncate", "table": q[1], "db": q[0]}
    if k0 == "drop" and k1 == "table":
        i = _skip_if_clause(toks, 2, "if", "exists")
        q = _qualified_name(toks, i)
        if q is not None and q[2] == len(toks):
            return {"kind": "drop_table", "table": q[1], "db": q[0]}
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
        from ..localrel import local_df
        return local_df(
            spark,
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
