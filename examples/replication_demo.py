"""End-to-end demo: what a tidb-binlog user runs after switching.

One self-verifying script (exit 0 = every stage agreed):

  1. land change segments in a file zone (the pump landing-zone
     boundary — in production this is the Kafka/file drop the pumps
     feed);
  2. replicate them with the streaming apply (order gate -> per-PK
     compaction -> idempotent MERGE snapshot with an atomic
     checkpoint);
  3. keep warehouse views exactly maintained WHILE replicating:
     per-table COUNT/SUM plus MIN/MAX/p50/p90/p99/heavy-hitters off
     the delta-maintained value multiset, and the full SCD2 version
     history — none of which ever rescans the snapshot;
  4. cross-check everything against independent batch derivations.

Run:  python examples/replication_demo.py  [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tidb_binlog_spark.operators import compaction, ordering, scd2
from tidb_binlog_spark.operators.incremental_agg import (
    coherent_changelog, maintain_group_aggregates, maintain_group_extrema)
from tidb_binlog_spark.session import get_spark
from tidb_binlog_spark.sinks.table_sink import SnapshotTable
from tidb_binlog_spark.sources.changestream import change_stream
from tidb_binlog_spark.streaming import pipeline
from tidb_binlog_spark.streaming.ivm import (MaterializedAggregate,
                                             MaterializedSCD2,
                                             run_ivm_stream,
                                             run_scd2_stream)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(work: str) -> int:
    spark = get_spark("replication-demo")
    zone = os.path.join(work, "zone")
    os.makedirs(zone, exist_ok=True)

    # -- 1. land the change log as pump segments (4 arrival slices) ------
    ch = change_stream(spark, SF_DIR).select(
        "arrival_seq", "source_id", "commit_ts", "start_ts", "op",
        "db", "tbl", "pk", "seq", "schema_version", "val", "row_json")
    n = ch.count()
    cut = n // 4 + 1
    for i in range(4):
        (ch.filter((F.col("arrival_seq") >= i * cut)
                   & (F.col("arrival_seq") < (i + 1) * cut))
         .coalesce(1).write.mode("append").parquet(zone))
    print(f"landed {n} change events in 4 segments")

    # -- 2. replicate: the DML path as one streaming query ---------------
    table_root = os.path.join(work, "replica")
    q = pipeline.run_apply_stream(spark, zone, table_root,
                                  os.path.join(work, "ckpt_apply"))
    q.awaitTermination(300)
    replica = SnapshotTable(spark, table_root)
    n_live = replica.read().count()
    ck = replica.checkpoint()
    print(f"replica: {n_live} live rows, checkpoint ts {ck['commit_ts']}")

    # batch oracle: last-image-wins apply over the ordered history
    want_live = compaction.apply_snapshot(
        ordering.ordered_stream(ch)).count()
    assert n_live == want_live, (n_live, want_live)

    # -- 3. maintained views, updated per micro-batch ---------------------
    aggq = run_ivm_stream(spark, zone, os.path.join(work, "ivm"),
                          os.path.join(work, "ckpt_ivm"),
                          max_files_per_trigger=1)
    aggq.awaitTermination(300)
    view = MaterializedAggregate(spark, os.path.join(work, "ivm"))
    view.flush()                      # sources complete: drain pending

    histq = run_scd2_stream(spark, zone, os.path.join(work, "scd2"),
                            os.path.join(work, "ckpt_scd2"),
                            max_files_per_trigger=1)
    histq.awaitTermination(300)
    hist_view = MaterializedSCD2(spark, os.path.join(work, "scd2"))
    hist_view.flush()

    sums = {(r["db"], r["tbl"]): (r["n_rows"], round(r["sum_val"], 6))
            for r in view.read().collect()}
    p90 = {(r["db"], r["tbl"]): r["p90_val"]
           for r in view.read_quantiles().collect()}
    n_versions = hist_view.read().count()
    audit = view._checkpoint()["audit"]
    print(f"maintained: {len(sums)} group sums, p90s, "
          f"{n_versions} SCD2 versions; quarantined: {audit}")

    # -- 4. agree with the independent batch derivations ------------------
    cl = coherent_changelog(ordering.ordered_stream(ch))
    want_sums = {(r["db"], r["tbl"]): (r["n_rows"], round(r["sum_val"], 6))
                 for r in maintain_group_aggregates(cl, ["db", "tbl"])
                 .collect()}
    assert sums == want_sums
    want_ext = {(r["db"], r["tbl"]): r["max_val"]
                for r in maintain_group_extrema(cl, ["db", "tbl"])
                .collect()}
    got_ext = {(r["db"], r["tbl"]): r["max_val"]
               for r in view.read_extrema().collect()}
    assert got_ext == want_ext
    want_hist = scd2.scd2_history(ordering.ordered_stream(ch)).count()
    assert n_versions == want_hist, (n_versions, want_hist)
    # time travel off the maintained history: state at the median ts
    mid = ch.agg(F.expr("percentile_approx(commit_ts, 0.5)")).first()[0]
    as_of = hist_view.read().filter(
        scd2.as_of_predicate(int(mid))).count()
    print(f"time travel AS OF {int(mid)}: {as_of} rows")

    # -- 5. the executed-SQL path with DDL mid-stream (round 6) ----------
    # a second, schema-evolving table replicated through the statement
    # sink: DML -> DDL barrier (immediate checkpoint, catalog refresh)
    # -> post-DDL DML with the widened statement, workers routed by
    # causality group against ONE shared downstream database
    import json as jsonlib
    import sqlite3

    from tidb_binlog_spark.operators.schema_evolution import (
        SchemaRegistry, decode_with_replay)
    from tidb_binlog_spark.sinks import catalog as cat_mod
    from tidb_binlog_spark.sinks import jdbc

    sql_zone = os.path.join(work, "sql_zone")
    os.makedirs(sql_zone, exist_ok=True)
    add_c = "ALTER TABLE t ADD COLUMN c TEXT"
    mixed = [
        (1, 10, "I", 1, 1.0, jsonlib.dumps({"val": "1.0"})),
        (2, 20, "I", 2, 2.0, jsonlib.dumps({"val": "2.0"})),
        (3, 30, "DDL", 0, 0.0, add_c),
        (4, 40, "U", 1, 9.0, jsonlib.dumps({"val": "9.0", "c": "y"})),
        (5, 50, "I", 3, 3.0, jsonlib.dumps({"val": "3.0", "c": "z"})),
    ]
    rows = [(a, "s0", ts, ts - 1, op, "db0", "t", pk, 0, 1, v, rj)
            for a, ts, op, pk, v, rj in mixed]
    spark.createDataFrame(
        rows, ("arrival_seq long, source_id string, commit_ts long, "
               "start_ts long, op string, db string, tbl string, "
               "pk long, seq int, schema_version long, val double, "
               "row_json string")) \
        .coalesce(1).write.mode("append").parquet(sql_zone)
    db_dir = os.path.join(work, "sql_sink")

    def fetch(schema, table):
        conn = sqlite3.connect(os.path.join(db_dir, jdbc.SHARED_DB_NAME))
        try:
            return cat_mod.fetch_table_info_sqlite(conn, schema, table)
        finally:
            conn.close()

    sq = pipeline.run_sql_apply_stream(
        spark, sql_zone, db_dir, os.path.join(work, "ckpt_sql"),
        num_workers=2,
        setup_sql=("CREATE TABLE IF NOT EXISTS t "
                   "(pk INTEGER PRIMARY KEY, val REAL)",),
        catalog=cat_mod.SinkCatalog(fetch))
    sq.awaitTermination(300)
    conn = sqlite3.connect(os.path.join(db_dir, jdbc.SHARED_DB_NAME))
    got_sql = sorted(conn.execute("SELECT pk, val, c FROM t").fetchall())
    conn.close()
    reg = SchemaRegistry()
    reg.apply_ddl_events([(1, "CREATE TABLE t (val VARCHAR)"),
                          (30, add_c)])
    dml = spark.createDataFrame(
        [r for r in rows if r[4] != "DDL"],
        ("arrival_seq long, source_id string, commit_ts long, "
         "start_ts long, op string, db string, tbl string, pk long, "
         "seq int, schema_version long, val double, row_json string"))
    dec = decode_with_replay(dml, reg, "t", spark)
    from pyspark.sql import Window as W
    fin = (dec.withColumn(
               "rn", F.row_number().over(
                   W.partitionBy("pk").orderBy(F.desc("commit_ts"))))
           .filter((F.col("rn") == 1) & (F.col("op") != "D")))
    want_sql = sorted((r["pk"], float(r["val"]), r["c"])
                      for r in fin.collect())
    assert got_sql == want_sql, (got_sql, want_sql)
    print(f"sql sink with mid-stream DDL: {len(got_sql)} rows, "
          f"checkpoint {jdbc.load_checkpoint(db_dir)[0]} "
          f"(== batch decode_with_replay)")
    print("ALL STAGES AGREE")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        work_dir = sys.argv[1]
        os.makedirs(work_dir, exist_ok=True)
        sys.exit(main(work_dir))
    tmp = tempfile.mkdtemp(prefix="repl_demo_")
    try:
        sys.exit(main(tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
