"""Downstream SQL statement generation — the sink-side statement
builder of the loader.

Reference: pkg/loader/model.go:187-445 builds INSERT / REPLACE /
UPDATE ... LIMIT 1 / DELETE ... LIMIT 1 with a unique-key-preferring,
NULL-safe WHERE clause; identifiers are backtick-quoted
(pkg/loader/util.go quoteSchema/quoteName/holderString).

Spark-first: statement text is generated as a *column* (pure concat
expressions) so a foreachBatch JDBC writer can iterate a partition and
execute; nothing is collected to the driver. Safe-mode variants map
I->REPLACE and U->DELETE+REPLACE (executor.go:407-443) — compose with
operators/safe_mode.py upstream of this projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _q(name: str) -> str:
    """Backtick-quote an identifier (loader/util.go quoteName)."""
    return "`" + name.replace("`", "``") + "`"


def _escape_ident(col: Column) -> Column:
    """Escape backticks inside a data-derived identifier value, the
    column-expression analog of quoteName (loader/util.go escapeName).
    Without this a hostile db/tbl value breaks out of the quoting."""
    return F.replace(col, F.lit("`"), F.lit("``"))


def _qualified() -> Column:
    return F.concat(F.lit("`"), _escape_ident(F.col("db")),
                    F.lit("`.`"), _escape_ident(F.col("tbl")), F.lit("`"))


def _escape_str_lit(col: Column) -> Column:
    """Render a string value as a quoted SQL literal: backslashes and
    single quotes doubled (MySQL string-literal rules; the reference
    avoids the issue entirely with `?` placeholders — model.go builds
    parameterized statements. For textual statements, escaping is the
    equivalent safety contract)."""
    escaped = F.replace(F.replace(col, F.lit("\\"), F.lit("\\\\")),
                        F.lit("'"), F.lit("''"))
    return F.concat(F.lit("'"), escaped, F.lit("'"))


def generate_sql(changes: DataFrame,
                 pk_cols: tuple[str, ...] = ("pk",),
                 value_cols: tuple[str, ...] = ("pk", "val"),
                 dialect: str = "mysql",
                 string_cols: tuple[str, ...] | None = None) -> DataFrame:
    """One downstream statement per change event.

    mysql dialect (pkg/loader/model.go:187-353):
      I -> INSERT INTO t(cols) VALUES(...)
      U -> UPDATE t SET non-pk-cols WHERE pk-cols LIMIT 1
      D -> DELETE FROM t WHERE pk-cols LIMIT 1
      R -> REPLACE INTO t(cols) VALUES(...)   (safe-mode upsert)

    oracle dialect (model.go:196-237,331-353 oracle paths): LIMIT 1
    becomes ``AND rownum <= 1``; REPLACE becomes a
    ``MERGE INTO ... USING dual`` upsert; identifiers unquoted
    upper-cased (drainer/sync/oracle.go table naming).

    sqlite dialect (the test-executable target for sinks/jdbc.py):
    mysql shapes minus the UPDATE/DELETE LIMIT bound (not compiled into
    stock SQLite; the PK WHERE makes it redundant anyway).

    ``string_cols`` names the columns whose values must render as quoted
    escaped string literals; None infers them from the DataFrame schema
    (string-typed columns among value_cols/pk_cols).
    """
    if string_cols is None:
        string_cols = tuple(
            f.name for f in changes.schema.fields
            if f.name in set(value_cols) | set(pk_cols)
            and f.dataType.simpleString() == "string")
    str_set = set(string_cols)
    if dialect == "oracle":
        tbl = F.concat(F.upper(F.col("db")), F.lit("."), F.upper(F.col("tbl")))
        quote = str.upper
    elif dialect == "sqlite":   # no schemas in SQLite: table name only
        tbl = F.concat(F.lit("`"), _escape_ident(F.col("tbl")), F.lit("`"))
        quote = _q
    else:
        tbl = _qualified()
        quote = _q
    def lit_val(c: str) -> Column:
        # NULL renders as the literal NULL (concat/concat_ws silently
        # drop SQL NULLs, which would shift the VALUES arity); string
        # values are quoted + escaped per dialect (single-quote doubling
        # everywhere; backslash doubling for mysql).
        v = F.col(c).cast("string")
        if c in str_set:
            if dialect == "mysql":
                rendered = _escape_str_lit(v)
            else:  # oracle/sqlite: '' doubling only, no backslash escapes
                rendered = F.concat(F.lit("'"),
                                    F.replace(v, F.lit("'"), F.lit("''")),
                                    F.lit("'"))
            return F.coalesce(rendered, F.lit("NULL"))
        return F.coalesce(v, F.lit("NULL"))

    col_list = F.lit(", ".join(quote(c) for c in value_cols))
    values = F.concat_ws(", ", *[lit_val(c) for c in value_cols])
    set_cols = [c for c in value_cols if c not in pk_cols]
    set_clause = F.concat_ws(", ", *[
        F.concat(F.lit(f"{quote(c)} = "), lit_val(c)) for c in set_cols])

    def null_safe(c: str) -> Column:
        # NULL-safe WHERE fragment (model.go:247-261: `col IS NULL` when
        # the value is NULL, `col = val` otherwise).
        v = F.col(c)
        return F.when(v.isNull(), F.lit(f"{quote(c)} IS NULL")) \
                .otherwise(F.concat(F.lit(f"{quote(c)} = "), lit_val(c)))

    where = F.concat_ws(" AND ", *[null_safe(c) for c in pk_cols])

    insert = F.concat(F.lit("INSERT INTO "), tbl, F.lit("("), col_list,
                      F.lit(") VALUES ("), values, F.lit(")"))
    if dialect == "oracle":
        limit_sfx = F.lit(" AND rownum <= 1")
        replace = F.concat(F.lit("MERGE INTO "), tbl,
                           F.lit(" USING dual ON ("), where,
                           F.lit(") WHEN MATCHED THEN UPDATE SET "), set_clause,
                           F.lit(" WHEN NOT MATCHED THEN INSERT ("), col_list,
                           F.lit(") VALUES ("), values, F.lit(")"))
    else:
        limit_sfx = F.lit("" if dialect == "sqlite" else " LIMIT 1")
        replace = F.concat(F.lit("REPLACE INTO "), tbl, F.lit("("), col_list,
                           F.lit(") VALUES ("), values, F.lit(")"))
    update = F.concat(F.lit("UPDATE "), tbl, F.lit(" SET "), set_clause,
                      F.lit(" WHERE "), where, limit_sfx)
    delete = F.concat(F.lit("DELETE FROM "), tbl, F.lit(" WHERE "), where,
                      limit_sfx)
    stmt = (F.when(F.col("op") == "I", insert)
             .when(F.col("op") == "R", replace)
             .when(F.col("op") == "U", update)
             .when(F.col("op") == "D", delete))
    return changes.withColumn("sql_text", stmt)


class TableInfo:
    """Downstream table metadata for the statement builder — the
    analog of pkg/loader's tableInfo (util.go:68-101): ordered column
    list, unique keys ORDERED with PRIMARY first (util.go:97-101 swaps
    it to the front), and generated columns (excluded from writes,
    drainer/translator/mysql.go:212-222, load.go:748)."""

    def __init__(self, columns: tuple[str, ...],
                 unique_keys: tuple[tuple[str, tuple[str, ...]], ...] = (),
                 generated: tuple[str, ...] = ()):
        self.columns = tuple(columns)
        self.unique_keys = tuple(unique_keys)
        self.generated = tuple(generated)

    @property
    def writable(self) -> tuple[str, ...]:
        return tuple(c for c in self.columns if c not in self.generated)


def generate_sql_wide(changes: DataFrame, info: TableInfo,
                      dialect: str = "mysql") -> DataFrame:
    """Statement builder over the map row model (values/old_values
    MAP<STRING,STRING>) with the reference's key-selection rule.

    WHERE key choice (pkg/loader/model.go:303-330 whereSlice): walk
    unique keys in order (PRIMARY first) and use the first whose
    where-values are ALL non-null; otherwise fall back to every column
    with NULL-safe `col IS NULL` fragments. For updates the where
    values come from old_values, else from values (model.go:292-301
    whereValues). Tables with no unique key are additionally flagged
    exec_mode='single' — the reference routes them to the
    single-statement path, never the bulk batch (load.go:591-628
    groupDMLs).

    The whole builder is nested CASE/concat Catalyst expressions —
    per-row key selection happens executor-side with no Python.
    """
    def render(col_expr: Column) -> Column:
        # map values are strings; render quoted + escaped per dialect
        if dialect == "mysql":
            return F.coalesce(_escape_str_lit(col_expr), F.lit("NULL"))
        return F.coalesce(
            F.concat(F.lit("'"),
                     F.replace(col_expr, F.lit("'"), F.lit("''")),
                     F.lit("'")),
            F.lit("NULL"))

    if dialect == "oracle":
        tbl = F.concat(F.upper(F.col("db")), F.lit("."), F.upper(F.col("tbl")))
        quote = str.upper
        limit_sfx = F.lit(" AND rownum <= 1")
    elif dialect == "sqlite":   # executable test target: no schemas, no
        tbl = F.concat(F.lit("`"), _escape_ident(F.col("tbl")), F.lit("`"))
        quote = _q              # UPDATE/DELETE LIMIT in stock builds
        limit_sfx = F.lit("")
    else:
        tbl = _qualified()
        quote = _q
        limit_sfx = F.lit(" LIMIT 1")

    def v(c: str) -> Column:
        return F.try_element_at("values", F.lit(c))

    def wv(c: str) -> Column:
        # whereValues: OldValues for updates, Values otherwise
        return F.when(F.col("op") == "U",
                      F.try_element_at("old_values", F.lit(c))) \
                .otherwise(F.try_element_at("values", F.lit(c)))

    writable = info.writable
    col_list = F.lit(", ".join(quote(c) for c in writable))
    values_list = F.concat_ws(", ", *[render(v(c)) for c in writable])
    set_clause = F.concat_ws(", ", *[
        F.concat(F.lit(f"{quote(c)} = "), render(v(c))) for c in writable])

    def key_where(cols: tuple[str, ...]) -> Column:
        return F.concat_ws(" AND ", *[
            F.concat(F.lit(f"{quote(c)} = "), render(wv(c))) for c in cols])

    def all_cols_where() -> Column:
        frags = []
        for c in writable:
            frags.append(
                F.when(wv(c).isNull(), F.lit(f"{quote(c)} IS NULL"))
                 .otherwise(F.concat(F.lit(f"{quote(c)} = "), render(wv(c)))))
        return F.concat_ws(" AND ", *frags)

    where: Column = all_cols_where()
    for name, cols in reversed(info.unique_keys):
        usable = None
        for c in cols:
            cond = wv(c).isNotNull()
            usable = cond if usable is None else (usable & cond)
        where = F.when(usable, key_where(cols)).otherwise(where)

    insert = F.concat(F.lit("INSERT INTO "), tbl, F.lit("("), col_list,
                      F.lit(") VALUES ("), values_list, F.lit(")"))
    replace = F.concat(F.lit("REPLACE INTO "), tbl, F.lit("("), col_list,
                       F.lit(") VALUES ("), values_list, F.lit(")"))
    update = F.concat(F.lit("UPDATE "), tbl, F.lit(" SET "), set_clause,
                      F.lit(" WHERE "), where, limit_sfx)
    delete = F.concat(F.lit("DELETE FROM "), tbl, F.lit(" WHERE "), where,
                      limit_sfx)
    stmt = (F.when(F.col("op") == "I", insert)
             .when(F.col("op") == "R", replace)
             .when(F.col("op") == "U", update)
             .when(F.col("op") == "D", delete))
    mode = F.lit("batch" if info.unique_keys else "single")
    return (changes.withColumn("sql_text", stmt)
                   .withColumn("exec_mode", mode))


def bulk_delete_replace(compacted: DataFrame,
                        value_cols: tuple[str, ...] = ("pk", "val"),
                        batch_size: int = 128,
                        pk_bucket_width: int | None = None) -> DataFrame:
    """Multi-row statement batching per (db, tbl, op): deletes first,
    then replaces, exactly the executor's bulkDelete/bulkReplace order
    (pkg/loader/executor.go:273-334). Emits one row per batched
    statement with its position, so the apply order is total.

    Batch numbering is a per-(db, tbl, op) row_number. The default
    single window parallelizes across tables — the reference batches
    per table too, so this matches its unit of parallelism. For a
    corpus dominated by ONE hot table, pass ``pk_bucket_width`` to
    switch to a two-phase rank over pk-range buckets (within-bucket
    rank + broadcast running offsets): the composition equals the
    global per-table rank exactly, so batch boundaries stay
    replay-deterministic, and no single task ever holds the hot
    table's whole compacted set. The two-phase path persists its input
    (both phases read it) and costs one extra tiny broadcast job —
    worth it only when a table's compacted set outgrows a task.
    """
    values_tuple = F.concat(
        F.lit("("),
        F.concat_ws(", ", *[F.col(c).cast("string") for c in value_cols]),
        F.lit(")"))
    if pk_bucket_width is None:
        w = Window.partitionBy("db", "tbl", "op").orderBy("pk")
        ranked = compacted.withColumn(
            "batch_no",
            F.floor((F.row_number().over(w) - 1) / batch_size).cast("int"))
    else:
        from ..cache import managed_persist
        compacted = managed_persist(compacted)
        b = F.floor(F.col("pk") / pk_bucket_width)
        bucketed = compacted.withColumn("_b", b)
        w_in = Window.partitionBy("db", "tbl", "op", "_b").orderBy("pk")
        counts = (compacted.select("db", "tbl", "op", "pk")
                  .withColumn("_b", b)
                  .groupBy("db", "tbl", "op", "_b")
                  .agg(F.count(F.lit(1)).alias("_n")))
        w_carry = (Window.partitionBy("db", "tbl", "op").orderBy("_b")
                   .rowsBetween(Window.unboundedPreceding, -1))
        offsets = (counts
                   .withColumn("_off", F.coalesce(F.sum("_n").over(w_carry),
                                                  F.lit(0)))
                   .select("db", "tbl", "op", "_b", "_off"))
        ranked = (bucketed
                  .withColumn("_rn", F.row_number().over(w_in))
                  .join(F.broadcast(offsets), ["db", "tbl", "op", "_b"])
                  .withColumn("batch_no",
                              F.floor((F.col("_off") + F.col("_rn") - 1)
                                      / batch_size).cast("int"))
                  .drop("_b", "_rn", "_off"))
    return (ranked.groupBy("db", "tbl", "op", "batch_no")
            .agg(F.concat_ws(", ", F.array_sort(F.collect_list(values_tuple)))
                 .alias("values_list"),
                 F.count(F.lit(1)).alias("n_rows")))
