"""Secondary-binlog (obinlog) protobuf wire format: typed column
values, per-table mutation grouping, ColumnInfo/Key metadata, and the
Spark encode->decode roundtrip against the JSON stand-in path.

Reference: drainer/translator/kafka.go:38-294 (TiBinlogToSecondaryBinlog,
genTable, DatumToColumn); message shapes from the public slave_binlog
proto."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import make_changes
from tidb_binlog_spark.sinks import obinlog_pb as ob


def test_column_typed_values_roundtrip():
    cases = [
        (42, "bigint", 42), (-7, "int", -7),
        (1.5, "double", 1.5), ("abc", "varchar", "abc"),
        ("2024-01-01 00:00:00", "datetime", "2024-01-01 00:00:00"),
        ("12.340", "decimal", "12.340"),
        (b"\x01\x02", "blob", b"\x01\x02"),
        (3, "enum", 3), (5, "set", 5),
        (None, "varchar", None), (None, "bigint", None),
    ]
    for value, t, want in cases:
        got = ob.decode_obinlog_column(ob.encode_obinlog_column(value, t))
        assert got == want, (value, t, got)
    # unsigned ints ride the uint64 field (kafka.go Uint64Value)
    big = 2**64 - 1
    assert ob.decode_obinlog_column(
        ob.encode_obinlog_column(big, "bigint", unsigned=True)) == big


def test_binlog_message_structure():
    ci = [ob.encode_column_info("pk", "bigint", True),
          ob.encode_column_info("v", "double", False)]
    row = ob.encode_row([ob.encode_obinlog_column(1, "bigint"),
                         ob.encode_obinlog_column(2.5, "double")])
    old = ob.encode_row([ob.encode_obinlog_column(1, "bigint"),
                         ob.encode_obinlog_column(1.5, "double")])
    muts = [ob.encode_mutation(ob.INSERT, row),
            ob.encode_mutation(ob.UPDATE, row, old)]
    t = ob.encode_table("db0", "t1", ci, muts,
                        [ob.encode_key("PRIMARY", ["pk"])])
    out = ob.decode_secondary_binlog(ob.encode_secondary_binlog(99, [t]))
    assert out["commit_ts"] == 99 and out["type"] == ob.DML
    tbl = out["tables"][0]
    assert tbl["schema_name"] == "db0" and tbl["table_name"] == "t1"
    assert tbl["column_info"][0] == {
        "name": "pk", "mysql_type": "bigint", "is_primary_key": True}
    assert tbl["unique_keys"] == [
        {"name": "PRIMARY", "column_names": ["pk"]}]
    assert tbl["mutations"][0]["row"] == [1, 2.5]
    assert tbl["mutations"][0]["change_row"] is None
    assert tbl["mutations"][1]["change_row"] == [1, 1.5]


def test_ddl_binlog():
    out = ob.decode_secondary_binlog(
        ob.encode_secondary_binlog(7, ddl=("db0", "t", "DROP TABLE t")))
    assert out["type"] == ob.DDL
    assert out["ddl"] == {"schema_name": "db0", "table_name": "t",
                          "ddl_query": "DROP TABLE t"}


def test_spark_roundtrip_matches_json_path(spark):
    """encode -> decode over Spark recovers exactly the rows the JSON
    obinlog path carries (same stream, same old/new image rules)."""
    ch = make_changes(spark, [
        (i, "s0", i * 10, "IUD"[i % 3], i % 5, 0, float(i) + 0.5)
        for i in range(40)]).withColumn(
        "k", F.concat(F.lit("key_"), F.col("pk").cast("string")))
    payloads = ob.secondary_binlog_payloads(ch)
    got = ob.parse_secondary_binlog_stream(payloads)
    want = ch.select(
        "commit_ts", "db", "tbl", "op", "pk", "val", "k",
        F.when(F.col("op") == "U", F.col("val") - 1).alias("old_val"),
        F.when(F.col("op") == "U",
               F.concat(F.lit("old_"), F.col("k"))).alias("old_k"))
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0


def test_arbiter_flow_over_protobuf(spark, tmp_path):
    """Arbiter end-to-end over the REAL wire format: per-txn secondary
    binlogs -> simulated Kafka re-read WITH duplicated messages ->
    decode -> commit_ts dedup -> SQL apply; downstream equals the
    clean batch snapshot (arbiter/server.go:287-317 + loader apply)."""
    from pyspark.sql import Window
    from tidb_binlog_spark.operators import compaction, ordering, safe_mode
    from tidb_binlog_spark.sinks import jdbc, sqlgen

    rows = [(i, "s0", i * 10, "IU"[i % 2], i % 5, 0, float(i) + 0.5)
            for i in range(30)]
    ch = make_changes(spark, rows).withColumn(
        "k", F.concat(F.lit("key_"), F.col("pk").cast("string")))
    payloads = ob.secondary_binlog_payloads(ch)

    # a crash-rewound consumer re-reads the last 10 txns verbatim
    replayed = payloads.unionByName(
        payloads.orderBy(F.desc("commit_ts")).limit(10))
    decoded = ob.parse_secondary_binlog_stream(
        replayed.select("payload"))
    # arbiter keeps ONE copy per commit_ts (exact message duplicates)
    deduped = (decoded.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("commit_ts", "pk").orderBy("pk")))
        .filter(F.col("rn") == 1).drop("rn"))
    assert decoded.count() == 40 and deduped.count() == 30

    # the arbiter applies in safe mode (I -> REPLACE): re-reads and
    # same-pk inserts across txns stay idempotent
    rewritten = safe_mode.safe_mode_rewrite(
        deduped.select("db", "tbl", "op", "commit_ts",
                       F.lit(0).alias("seq"), "pk", "val")
               .withColumn("arrival_seq", F.col("commit_ts")))
    stmts = (sqlgen.generate_sql(
        rewritten, pk_cols=("pk",), value_cols=("pk", "val"),
        dialect="sqlite")
        .withColumn("worker_id", F.lit(0)))
    db_dir = str(tmp_path / "dbs")
    jdbc.apply_statements(
        stmts, db_dir, num_workers=1,
        setup_sql=("CREATE TABLE IF NOT EXISTS `t` "
                   "(pk INTEGER PRIMARY KEY, val REAL)",))
    applied = {r["pk"]: r["val"] for r in jdbc.read_applied(
        spark, db_dir, "`t`", ["pk", "val"]).collect()}
    want = {r["pk"]: r["val"] for r in compaction.apply_snapshot(
        ordering.ordered_stream(ch)).collect()}
    assert applied == want
