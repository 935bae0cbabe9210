"""DDL stream handling: classification, skip rules, dialect prep.

Reference:
- unsupported/system DDL skipped: placement rules, resource groups,
  cache-table, batch-create, sequence setval, system tables
  (drainer/schema.go:333-353,614-628; drainer/collector.go:266-281;
  drainer/syncer.go:436-462);
- `use db;` prefixing before apply (drainer/translator/pb.go:44-56);
- tidb-specific feature stripping / truncate mapping at the loader
  (pkg/loader/load.go:429-496);
- checkpoint saved immediately after a DDL (drainer/syncer.go:234-238).

Spark-first: classification is a CASE expression over the DDL text;
actual application is driver-side (ordered, per batch) — Spark has no
ordered DDL+DML stream primitive, so foreachBatch sequences DDL
barriers between micro-batches (SURVEY §7 phase 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?i) prefixed patterns the reference refuses to replicate — the text
# analog of skipUnsupportedDDLJob (drainer/schema.go:333-353): placement
# policies, resource groups, cache/nocache, lock/unlock, table and
# partition attributes, TiFlash replica status, sequence setval.
UNSUPPORTED_DDL_PATTERNS = [
    "^CREATE PLACEMENT POLICY",
    "^ALTER PLACEMENT POLICY",
    "^DROP PLACEMENT POLICY",
    "^CREATE RESOURCE GROUP",
    "^ALTER RESOURCE GROUP",
    "^DROP RESOURCE GROUP",
    # exactly ALTER TABLE <name> [NO]CACHE — ".* CACHE$" would also
    # match e.g. "RENAME COLUMN a TO cache" (an identifier, not the
    # cache clause); the optionally db-qualified name is bare tokens
    # or backtick runs (backticked parts may contain spaces)
    "^ALTER TABLE (`[^`]+`|[^ .]+)(\\.(`[^`]+`|[^ ]+))? CACHE$",
    "^ALTER TABLE (`[^`]+`|[^ .]+)(\\.(`[^`]+`|[^ ]+))? NOCACHE$",
    "^SELECT SETVAL",
    "^LOCK TABLES",
    "^UNLOCK TABLES",
    "^ALTER TABLE .* ATTRIBUTES",
    "^ALTER TABLE .* PARTITION .* ATTRIBUTES",
    "^ALTER TABLE .* PLACEMENT POLICY",
    "^ALTER DATABASE .* PLACEMENT POLICY",
]


# first match wins (so ALTER ... TRUNCATE PARTITION beats TRUNCATE).
# Kinds mirror the model.Action switch of drainer/schema.go:360-561:
# table/column lifecycle, partitions (add/drop/truncate re-bind the
# physical partition ids), schemas (DropSchema cascades), sequences
# (replicated as tables: ActionCreateSequence/DropSequence share the
# CreateTable/DropTable arms), views, indexes.
KIND_PATTERNS = [
    ("^CREATE TABLE", "create_table"),
    ("^DROP TABLE", "drop_table"),
    ("^ALTER TABLE .* ADD COLUMN", "add_column"),
    ("^ALTER TABLE .* DROP COLUMN", "drop_column"),
    ("^ALTER TABLE .* (CHANGE|MODIFY) ", "modify_column"),
    ("^ALTER TABLE .* ADD PARTITION", "add_partition"),
    ("^ALTER TABLE .* DROP PARTITION", "drop_partition"),
    ("^ALTER TABLE .* TRUNCATE PARTITION", "truncate_partition"),
    ("^TRUNCATE", "truncate"),
    ("^RENAME TABLE", "rename_table"),
    ("^CREATE (UNIQUE )?INDEX", "create_index"),
    ("^CREATE (DATABASE|SCHEMA)", "create_schema"),
    ("^DROP (DATABASE|SCHEMA)", "drop_schema"),
    ("^CREATE SEQUENCE", "create_sequence"),
    ("^DROP SEQUENCE", "drop_sequence"),
    ("^CREATE (OR REPLACE )?VIEW", "create_view"),
]


def is_unsupported(ddl_col: Column) -> Column:
    out = F.lit(False)
    for pat in UNSUPPORTED_DDL_PATTERNS:
        out = out | F.upper(ddl_col).rlike(pat)
    return out


def classify_ddl(ddls: DataFrame, ddl_col: str = "ddl_sql") -> DataFrame:
    """Tag each DDL with its kind and whether the pipeline applies it."""
    c = F.col(ddl_col)
    kind = F.lit("other")
    for pat, k in reversed(KIND_PATTERNS):
        kind = F.when(F.upper(c).rlike(pat), F.lit(k)).otherwise(kind)
    return (ddls.withColumn("ddl_kind", kind)
                .withColumn("should_skip", is_unsupported(c)))


def prep_for_apply(ddls: DataFrame, ddl_col: str = "ddl_sql") -> DataFrame:
    """Downstream statement prep: `USE db;` prefix + checkpoint-now
    marker (every DDL forces an immediate savepoint)."""
    return (classify_ddl(ddls, ddl_col)
            .withColumn("apply_sql",
                        F.when(F.col("should_skip"), F.lit(None))
                         .otherwise(F.concat(F.lit("USE `"), F.col("db"),
                                             F.lit("`; "), F.col(ddl_col))))
            .withColumn("checkpoint_now", F.lit(True)))


# risk tiers over ddl_kind — the binlogctl-facing "what is this DDL
# stream about to do to my downstream" rollup. CASE text is shared
# with the oracle so both engines classify identically.
RISK_TIER_CASE = """CASE
  WHEN ddl_kind IN ('drop_table', 'drop_schema', 'truncate',
                    'truncate_partition', 'drop_partition',
                    'drop_column', 'drop_sequence') THEN 'destructive'
  WHEN ddl_kind IN ('create_table', 'add_column', 'add_partition',
                    'create_schema', 'create_sequence', 'create_view',
                    'create_index') THEN 'additive'
  WHEN ddl_kind IN ('modify_column', 'rename_table')
    THEN 'reshaping'
  ELSE 'operational' END"""


def risk_audit(ddls: DataFrame, ddl_col: str = "ddl_sql") -> DataFrame:
    """DDL risk rollup: each statement kind bucketed into
    destructive / additive / reshaping / operational tiers, with
    counts, how many the pipeline skips as unsupported, the distinct
    databases touched, and the arrival span — the pre-flight audit an
    operator reads before letting a DDL backlog replicate (the
    reference leaves this to eyeballing drainer logs; binlogctl shows
    only positions).

    One classification projection (the same regex list the apply path
    uses) + one count-reduced aggregate. No windows.
    """
    tagged = classify_ddl(ddls, ddl_col)
    return (tagged.withColumn("risk_tier", F.expr(RISK_TIER_CASE))
            .groupBy("risk_tier", "ddl_kind")
            .agg(F.count(F.lit(1)).alias("n_stmts"),
                 F.count(F.when(F.col("should_skip"), 1))
                  .alias("n_skipped"),
                 F.countDistinct("db").alias("n_dbs"),
                 F.min("arrival_seq").alias("first_seq"),
                 F.max("arrival_seq").alias("last_seq")))
