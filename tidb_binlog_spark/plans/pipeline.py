"""Declarative replication pipeline — the drainer-config equivalent.

A user of the reference configures drainer.toml (filter rules, route
rules, ignore-ts, safe mode, loopback channel — drainer/config.go:61-132)
and gets the §3.1 lifecycle. ``ReplicationConfig`` + ``build_pipeline``
is the same contract on Spark: one declarative object, one composed
DataFrame plan. Catalyst sees the WHOLE pipeline as a single query, so
filters push down through the stack and projections prune at the scan —
the optimizer advantage a hand-wired stage chain (the reference's
channel-connected goroutines) cannot get.

Stage order mirrors drainer/syncer.go:335-539:
  order gate -> ignore-ts -> loopback -> allow/block -> event rules
  -> route -> pk-change split -> (safe mode) -> compact -> apply
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import batching, compaction, filters, ordering, router, safe_mode


# drainer -ignore-schemas default (drainer/config.go:246): system
# schemas never replicate unless the operator overrides the list
DEFAULT_IGNORE_SCHEMAS = ("INFORMATION_SCHEMA", "PERFORMANCE_SCHEMA",
                          "mysql")


@dataclass
class ReplicationConfig:
    # pkg/filter/filter.go rules: (db_pattern, tbl_pattern); ~regex or exact
    do_tables: list[tuple[str, str]] | None = None
    ignore_tables: list[tuple[str, str]] | None = None
    # schema-level rules: replicate-do-db / ignore-schemas
    # (drainer/config.go:99,108 — db-only patterns through the same
    # pkg/filter allow-then-block evaluation)
    do_dbs: list[str] | None = None
    ignore_schemas: tuple[str, ...] = DEFAULT_IGNORE_SCHEMAS
    # (db_pattern, tbl_pattern, [ops]) event-kind rules
    event_rules: list[tuple[str, str, list[str]]] = field(default_factory=list)
    ignore_commit_ts: list[int] = field(default_factory=list)
    # (db_wild, tbl_wild, target_db, target_tbl)
    route_rules: list[tuple[str, str, str, str]] = field(default_factory=list)
    loopback_mark: tuple[str, str] | None = None      # (mark_db, mark_tbl)
    safe_mode: bool = False
    compact: bool = True
    # sync-ddl=false drops DDL events entirely (drainer/syncer.go:514)
    sync_ddl: bool = True
    # operational knobs for the sink stage (drainer/config.go:242-248
    # defaults): events per apply batch, parallel appliers, dialect
    txn_batch: int = 20
    worker_count: int = 16
    db_type: str = "mysql"          # mysql | tidb | oracle | file | kafka
    # channel id stamped on loopback mark rows (config.go:245)
    channel_id: int = 0
    # binlog-filter v2 rule matching mode (config.go:128); the
    # allow/block lists stay case-insensitive regardless
    case_sensitive: bool = False
    # start strictly after this tso when no checkpoint exists
    # (drainer -initial-commit-ts, config.go:240)
    initial_commit_ts: int = -1

    def __post_init__(self):
        if any(not s for s in self.ignore_schemas):
            # config.go:402: "empty schema name in `ignore-schemas`"
            raise ValueError("empty schema name in ignore-schemas config")


def apply_filters_and_routes(df: DataFrame,
                             cfg: ReplicationConfig) -> DataFrame:
    """The config-driven filter/route stages shared by the batch plan
    (build_pipeline) and the streaming SQL runner
    (streaming.pipeline.run_sql_apply_stream(cfg=...)): ignore-ts,
    loopback, allow/block, sync-ddl drop, event-kind rules, table
    routing — everything between the order gate and the
    compact/apply stage."""
    if cfg.ignore_commit_ts:
        df = filters.filter_ignore_commit_ts(df, cfg.ignore_commit_ts)
    if cfg.loopback_mark:
        df = batching.loopback_filter(df, *cfg.loopback_mark)
    do_rules = list(cfg.do_tables or []) + \
        [(d, "") for d in (cfg.do_dbs or [])]
    ignore_rules = list(cfg.ignore_tables or []) + \
        [(s, "") for s in cfg.ignore_schemas]
    if do_rules or ignore_rules:
        df = filters.filter_allow_block(df, do_rules or None, ignore_rules)
    if not cfg.sync_ddl and "op" in df.columns:
        df = df.filter(F.col("op") != "DDL")
    if cfg.event_rules:
        df = filters.filter_event_kinds(df, cfg.event_rules,
                                        cfg.case_sensitive)
    if cfg.route_rules:
        df = router.route_tables(df, cfg.route_rules)
    return df


def build_pipeline(changes: DataFrame, cfg: ReplicationConfig) -> DataFrame:
    """Compose the full replication dataflow as ONE DataFrame plan."""
    df = ordering.ordered_stream(changes)
    df = apply_filters_and_routes(df, cfg)
    if "old_pk" in df.columns:
        df = safe_mode.split_pk_change(df)
    if cfg.compact:
        df = compaction.compact_last_image(df)
    if cfg.safe_mode:
        df = safe_mode.safe_mode_rewrite(df)
    return df
