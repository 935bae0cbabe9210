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

from ..operators import batching, compaction, filters, ordering, router, safe_mode


@dataclass
class ReplicationConfig:
    # pkg/filter/filter.go rules: (db_pattern, tbl_pattern); ~regex or exact
    do_tables: list[tuple[str, str]] | None = None
    ignore_tables: list[tuple[str, str]] | None = None
    # (db_pattern, tbl_pattern, [ops]) event-kind rules
    event_rules: list[tuple[str, str, list[str]]] = field(default_factory=list)
    ignore_commit_ts: list[int] = field(default_factory=list)
    # (db_wild, tbl_wild, target_db, target_tbl)
    route_rules: list[tuple[str, str, str, str]] = field(default_factory=list)
    loopback_mark: tuple[str, str] | None = None      # (mark_db, mark_tbl)
    safe_mode: bool = False
    compact: bool = True


def build_pipeline(changes: DataFrame, cfg: ReplicationConfig) -> DataFrame:
    """Compose the full replication dataflow as ONE DataFrame plan."""
    df = ordering.ordered_stream(changes)
    if cfg.ignore_commit_ts:
        df = filters.filter_ignore_commit_ts(df, cfg.ignore_commit_ts)
    if cfg.loopback_mark:
        df = batching.loopback_filter(df, *cfg.loopback_mark)
    if cfg.do_tables or cfg.ignore_tables:
        df = filters.filter_allow_block(df, cfg.do_tables, cfg.ignore_tables)
    if cfg.event_rules:
        df = filters.filter_event_kinds(df, cfg.event_rules)
    if cfg.route_rules:
        df = router.route_tables(df, cfg.route_rules)
    if "old_pk" in df.columns:
        df = safe_mode.split_pk_change(df)
    if cfg.compact:
        df = compaction.compact_last_image(df)
    if cfg.safe_mode:
        df = safe_mode.safe_mode_rewrite(df)
    return df
