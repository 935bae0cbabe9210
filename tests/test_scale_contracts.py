"""Plan contracts: the properties SCALING.md claims, asserted on the
actual physical plans — pushdown reaches the scan, small dims
broadcast, the CDC hot path contains no Python, salting preserves
results, and TOML config round-trips.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import make_changes
from tidb_binlog_spark.operators import compaction, ordering, skew
from tidb_binlog_spark.plans import config as cfgmod
from tidb_binlog_spark.session import load_tables


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_parquet_scan(spark):
    t = load_tables(spark, SF, "orders")["orders"]
    df = t.filter(F.col("o_orderkey") < 100).select("o_orderkey", "o_custkey")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in plan
    # column pruning: the scan must not read the other 4 columns
    assert "o_totalprice" not in plan.split("ReadSchema")[1]


def test_small_dims_broadcast(spark):
    import __spark_entry__ as m
    plan = _plan(m.queries()["snapshot_revenue_by_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_cdc_pipeline_is_pure_jvm(spark):
    """No Python evaluation in the replication hot path — everything
    stays in codegen'd JVM operators."""
    import __spark_entry__ as m
    for q in ["cdc_snapshot_apply", "cdc_full_pipeline", "sink_sql_generation"]:
        plan = _plan(m.queries()[q](spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q


def test_salted_agg_equals_plain(spark):
    rng = random.Random(3)
    # i // 2 + 1 produces tied commit_ts pairs — the tie must break
    # identically in salted partials and the plain aggregation
    rows = [(i, "s0", i // 2 + 1, rng.choice("IUD"), rng.randrange(4))
            for i in range(200)]
    ch = make_changes(spark, rows)
    salted = skew.salted_last_image_count(ch)
    plain = ch.groupBy("db", "tbl", "pk").agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.max("commit_ts").alias("last_ts"),
        F.max(F.struct("commit_ts", "arrival_seq", "op")).getField("op")
         .alias("last_op"))
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_toml_config_roundtrip(spark, tmp_path):
    toml = """
[filter]
do-tables = [["db0", "ptest"], ["~^db[12]$", ""]]
ignore-tables = [["db2", "ntest"]]
ignore-txn-commit-ts = [500]

[[route]]
schema-pattern = "db?"
table-pattern = "ptest"
target-schema = "dwh"
target-table = "t_p"

[[event-filter]]
schema-pattern = "db1"
table-pattern = "ntest"
ignore-event = ["D"]

[sync]
safe-mode = false
compact = true
"""
    p = tmp_path / "drainer.toml"
    p.write_text(toml)
    cfg = cfgmod.load_config(str(p))
    assert cfg.do_tables == [("db0", "ptest"), ("~^db[12]$", "")]
    assert cfg.ignore_tables == [("db2", "ntest")]
    assert cfg.ignore_commit_ts == [500]
    assert cfg.route_rules == [("db?", "ptest", "dwh", "t_p")]
    assert cfg.event_rules == [("db1", "ntest", ["D"])]
    assert cfg.compact and not cfg.safe_mode

    # and it actually drives the pipeline
    from tidb_binlog_spark.plans.pipeline import build_pipeline
    ch = make_changes(spark, [(1, "s0", 10, "I", 1)])
    ch = ch.withColumn("db", F.lit("db0")).withColumn("tbl", F.lit("ptest"))
    out = build_pipeline(ch, cfg)
    r = out.collect()[0]
    assert (r["target_db"], r["target_tbl"]) == ("dwh", "t_p")


def test_drop_truncated_tables(spark):
    ch = make_changes(spark, [(1, "s0", 10, "I", 1), (2, "s0", 20, "I", 2)]) \
        .withColumn("table_id", F.col("pk") + 100)
    from tidb_binlog_spark.operators import filters
    kept = filters.drop_truncated_tables(ch, [101])
    assert [r["pk"] for r in kept.collect()] == [2]


def test_streaming_metrics_listener(spark, tmp_path):
    import os
    from tidb_binlog_spark.streaming import metrics, pipeline
    src = str(tmp_path / "src")
    os.makedirs(src)
    make_changes(spark, [(1, "s0", 10, "I", 1), (2, "s0", 20, "I", 2)]) \
        .coalesce(1).write.mode("append").parquet(src)
    collector = metrics.attach(spark)
    q = pipeline.run_apply_stream(spark, src, str(tmp_path / "t"),
                                  str(tmp_path / "ck"))
    q.awaitTermination(120)
    import time
    for _ in range(60):                      # listener events are async
        if collector.total_rows >= 2:
            break
        time.sleep(0.5)
    spark.streams.removeListener(collector)
    # progress can be reported more than once per batch (e.g. a final
    # summary event) — require the input rows to have been observed.
    assert collector.total_rows >= 2
    assert any(b["num_input_rows"] == 2 for b in collector.batches)
