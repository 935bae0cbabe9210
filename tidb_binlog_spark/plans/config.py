"""drainer.toml-style configuration loader.

Lets a reference user carry their config shape over: the [sync] table
filter lists, replicate-do/ignore rules, route rules and ignore-ts of
drainer/config.go:61-132 map onto ``ReplicationConfig`` fields.

Example (see tests):

    [filter]
    do-tables = [["db0", "ptest"], ["~^db[12]$", ""]]
    ignore-tables = [["db2", "ntest"]]
    ignore-txn-commit-ts = [500]

    [[route]]
    schema-pattern = "db?"
    table-pattern = "ptest"
    target-schema = "dwh"
    target-table = "t_p"

    [sync]
    safe-mode = true
    compact = true
"""

from __future__ import annotations

import tomllib

from .pipeline import ReplicationConfig


def load_config(path: str) -> ReplicationConfig:
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    return parse_config(raw)


def parse_config(raw: dict) -> ReplicationConfig:
    filt = raw.get("filter", {})
    sync = raw.get("sync", {})
    routes = [
        (r["schema-pattern"], r["table-pattern"],
         r["target-schema"], r["target-table"])
        for r in raw.get("route", [])
    ]
    event_rules = [
        (r["schema-pattern"], r["table-pattern"], list(r["ignore-event"]))
        for r in raw.get("event-filter", [])
    ]
    loopback = None
    if "loopback" in raw:
        loopback = (raw["loopback"].get("mark-db", "retl"),
                    raw["loopback"].get("mark-table", "_drainer_repl_mark"))
    kw = {}
    if "ignore-schemas" in filt:
        # drainer config: one comma-separated string
        # (drainer/config.go:246); default = the system schemas
        kw["ignore_schemas"] = tuple(
            s.strip() for s in filt["ignore-schemas"].split(","))
    return ReplicationConfig(
        do_tables=[tuple(t) for t in filt["do-tables"]]
            if filt.get("do-tables") else None,
        ignore_tables=[tuple(t) for t in filt["ignore-tables"]]
            if filt.get("ignore-tables") else None,
        do_dbs=list(filt["replicate-do-db"])
            if filt.get("replicate-do-db") else None,
        event_rules=event_rules,
        ignore_commit_ts=list(filt.get("ignore-txn-commit-ts", [])),
        route_rules=routes,
        loopback_mark=loopback,
        safe_mode=bool(sync.get("safe-mode", False)),
        compact=bool(sync.get("compact", True)),
        sync_ddl=bool(sync.get("sync-ddl", True)),
        txn_batch=int(sync.get("txn-batch", 20)),
        worker_count=int(sync.get("worker-count", 16)),
        db_type=str(sync.get("db-type", "mysql")),
        channel_id=int(sync.get("channel-id", 0)),
        case_sensitive=bool(filt.get("case-sensitive", False)),
        initial_commit_ts=int(sync.get("initial-commit-ts", -1)),
        **kw,
    )
