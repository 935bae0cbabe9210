"""End-to-end executed-SQL sink: change stream -> safe-mode rewrite ->
statement generation -> per-worker SQLite execution -> downstream state
equals the engine's own snapshot (the sync-diff check against a real
SQL database, reference tests/_utils/check_data).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import make_changes
from tidb_binlog_spark.operators import compaction, ordering, safe_mode
from tidb_binlog_spark.sinks import jdbc, sqlgen


def test_sqlite_apply_matches_snapshot(spark, tmp_path):
    rng = random.Random(11)
    rows, cts = [], 0
    for i in range(250):
        cts += 1
        rows.append((i, "s0", cts, rng.choice(["I", "U", "U", "D"]),
                     rng.randrange(12), 0, round(rng.uniform(0, 99), 2)))
    ch = make_changes(spark, rows)

    # loader path: idempotent safe-mode ops -> statements -> workers
    rewritten = safe_mode.safe_mode_rewrite(ch)
    stmts = sqlgen.generate_sql(rewritten, dialect="sqlite") \
        .withColumn("worker_id", F.pmod(F.col("pk"), F.lit(3)))
    db_dir = str(tmp_path / "dbs")
    jdbc.apply_statements(
        stmts, db_dir, num_workers=3,
        setup_sql=("CREATE TABLE IF NOT EXISTS `t` "
                   "(pk INTEGER PRIMARY KEY, val REAL)",))

    applied = jdbc.read_applied(spark, db_dir, "`t`", ["pk", "val"])
    got = {r["pk"]: round(r["val"], 2) for r in applied.collect()}

    snap = compaction.apply_snapshot(ordering.ordered_stream(ch))
    want = {r["pk"]: round(r["val"], 2) for r in snap.collect()}
    assert got == want


def test_sqlite_reapply_is_idempotent(spark, tmp_path):
    ch = make_changes(spark, [(1, "s0", 10, "I", 1, 0, 2.0),
                              (2, "s0", 20, "U", 1, 0, 5.0)])
    rewritten = safe_mode.safe_mode_rewrite(ch)
    stmts = sqlgen.generate_sql(rewritten, dialect="sqlite") \
        .withColumn("worker_id", F.lit(0))
    db_dir = str(tmp_path / "dbs")
    setup = ("CREATE TABLE IF NOT EXISTS `t` (pk INTEGER PRIMARY KEY, val REAL)",)
    jdbc.apply_statements(stmts, db_dir, num_workers=1, setup_sql=setup)
    jdbc.apply_statements(stmts, db_dir, num_workers=1, setup_sql=setup)  # replay
    applied = jdbc.read_applied(spark, db_dir, "`t`", ["pk", "val"]).collect()
    assert [(r["pk"], r["val"]) for r in applied] == [(1, 5.0)]
