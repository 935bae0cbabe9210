"""Protobuf pb-dump wire format: message codecs, CRC32C, file framing,
and the Spark dump/replay roundtrip hash-equal to the parquet path.

Reference: proto/pb_binlog.proto:11-60 (schema),
pkg/binlogfile/encoder.go:62-77 (framing + Castagnoli CRC),
drainer/translator/pb.go:117-296 (event/column packing).
"""

from __future__ import annotations

import glob
import struct

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_changes
from tidb_binlog_spark.sinks import pbcodec as pb


def test_crc32c_known_vectors():
    # public Castagnoli test vectors (RFC 3720 appendix B.4)
    assert pb.crc32c(b"") == 0
    assert pb.crc32c(b"123456789") == 0xE3069283
    assert pb.crc32c(bytes(32)) == 0x8A9136AA


def test_frame_roundtrip_and_corruption():
    payloads = [b"abc", b"", b"x" * 1000]
    data = b"".join(pb.frame_record(p) for p in payloads)
    assert list(pb.iter_records(data)) == payloads
    # flip one payload byte -> CRC mismatch
    bad = bytearray(data)
    bad[12] ^= 0xFF
    with pytest.raises(ValueError, match="crc mismatch"):
        list(pb.iter_records(bytes(bad)))
    # clobber the magic
    bad = bytearray(data)
    struct.pack_into("<I", bad, 0, 123)
    with pytest.raises(ValueError, match="magic mismatch"):
        list(pb.iter_records(bytes(bad)))


def test_binlog_message_roundtrip():
    cols = [pb.encode_column("pk", 8, "bigint", 42, "long"),
            pb.encode_column("val", 5, "double", 1.5, "double",
                             changed_value=2.5),
            pb.encode_column("k", 15, "varchar", None, "string")]
    ev = pb.encode_event("db0", "t1", pb.UPDATE, cols)
    buf = pb.encode_binlog(12345, [ev, ev])
    out = pb.decode_binlog(buf)
    assert out["tp"] == pb.DML and out["commit_ts"] == 12345
    assert len(out["events"]) == 2
    got = out["events"][0]
    assert (got["schema_name"], got["table_name"], got["tp"]) == \
        ("db0", "t1", pb.UPDATE)
    by_name = {c["name"]: c for c in got["columns"]}
    assert by_name["pk"]["value"] == 42
    assert by_name["pk"]["mysql_type"] == "bigint"
    assert by_name["val"]["value"] == 1.5
    assert by_name["val"]["changed_value"] == 2.5
    assert by_name["k"]["value"] is None


def test_ddl_binlog_roundtrip():
    buf = pb.encode_binlog(777, ddl_query=b"CREATE TABLE t (c INT)")
    out = pb.decode_binlog(buf)
    assert out["tp"] == pb.DDL
    assert out["commit_ts"] == 777
    assert out["ddl_query"] == "CREATE TABLE t (c INT)"
    assert out["events"] == []


def test_negative_commit_ts_int64():
    out = pb.decode_binlog(pb.encode_binlog(-5, []))
    assert out["commit_ts"] == -5


def test_wire_bytes_are_standard_protobuf():
    """Pin the wire bytes: field 2 varint commit_ts on an empty-DML
    Binlog — any canonical protobuf decoder would read these."""
    buf = pb.encode_binlog(1, [])
    # field1 varint 0 (DML), field2 varint 1, field3 len-delim empty
    assert buf == b"\x08\x00\x10\x01\x1a\x00"


def _changes(spark, n=60):
    rows = []
    for i in range(n):
        op = "IUD"[i % 3]
        rows.append((i, f"src{i % 2}", 100000 * (i % 3) + i * 10,
                     op, i % 7, i % 4, float(i) + 0.25))
    return make_changes(spark, rows)


def test_pb_dump_replay_roundtrip(spark, tmp_path):
    """dump -> files -> replay returns exactly the input mutations
    (per-event fields + per-column datums survive the wire)."""
    ch = _changes(spark).withColumn(
        "k", F.concat(F.lit("key_"), F.col("pk").cast("string")))
    path = str(tmp_path / "pbdump")
    pb.write_pb_dump(ch, path)

    files = glob.glob(f"{path}/*.pb")
    assert len(files) >= 2   # one writer per ts bucket, 3 buckets here

    got = pb.read_pb_dump(spark, path)
    want = ch.select("commit_ts", "db", "tbl", "op", "pk", "val", "k")
    sym = got.exceptAll(want).union(want.exceptAll(got))
    assert sym.count() == 0


def test_pb_dump_matches_parquet_path(spark, tmp_path):
    """The pb wire path and the parquet file_dump carry identical
    replay content (same rows, any order) — VERDICT r3 item 6's
    hash-equality bar."""
    from tidb_binlog_spark.sinks import payload
    ch = _changes(spark).withColumn(
        "k", F.concat(F.lit("key_"), F.col("pk").cast("string")))
    pq = str(tmp_path / "pq")
    pbp = str(tmp_path / "pb")
    payload.file_dump(ch, pq)
    pb.write_pb_dump(ch, pbp)
    cols = ["commit_ts", "db", "tbl", "op", "pk", "val", "k"]
    a = payload.read_file_dump(spark, pq).select(*cols)
    b = pb.read_pb_dump(spark, pbp).select(*cols)
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_pb_dump_ts_range_replay(spark, tmp_path):
    ch = _changes(spark).withColumn("k", F.lit("x"))
    path = str(tmp_path / "pbdump")
    pb.write_pb_dump(ch, path)
    got = pb.read_pb_dump(spark, path, start_ts=100000, stop_ts=199999)
    assert got.filter((F.col("commit_ts") < 100000)
                      | (F.col("commit_ts") > 199999)).count() == 0
    # bucket-1 txns are i%3==1 -> commit_ts = 100000 + i*10, 20 rows
    assert got.count() == 20


def test_pb_dump_with_ddl_records(spark, tmp_path):
    """Mixed dump: DDL Binlogs interleave with DML (pb.go:43-55 USE
    prefix rule, bare ';' for CREATE DATABASE); the DML replay is
    unaffected and the DDL reader returns the barriers in ts order."""
    ch = _changes(spark, 30).withColumn("k", F.lit("x"))
    ddls = spark.createDataFrame(
        [(15, "db0", "CREATE DATABASE shop"),
         (150005, "shop", "CREATE TABLE t (id INT)"),
         (200005, "shop", "ALTER TABLE t ADD COLUMN c INT")],
        "commit_ts long, db string, ddl_sql string")
    path = str(tmp_path / "pbdump")
    pb.write_pb_dump(ch, path, ddls=ddls)

    dml = pb.read_pb_dump(spark, path)
    assert dml.count() == 30
    got = {r["commit_ts"]: r["ddl_query"]
           for r in pb.read_pb_dump_ddl(spark, path).collect()}
    assert got[15] == "CREATE DATABASE shop;"
    assert got[150005] == "use `shop`; CREATE TABLE t (id INT);"
    assert got[200005] == "use `shop`; ALTER TABLE t ADD COLUMN c INT;"


def test_assemble_payloads_matches_generic_encoders():
    """The memoized fast assembly (_assemble_payloads) is byte-for-byte
    the composition of encode_column/encode_event/encode_binlog over
    the same ordered rows — the parity the fast path's docstring
    promises (it serves the wire-bench hot loop; a drift here would
    corrupt every dump silently since both sides are ours)."""
    import numpy as np
    import pandas as pd

    n = 2000
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "commit_ts": np.sort(rng.randint(1, n // 3, n).astype(np.int64)),
        "seq": np.arange(n, dtype=np.int64),
        "arrival_seq": np.arange(n, dtype=np.int64),
        "op": np.where(rng.rand(n) < 0.5, "I",
                       np.where(rng.rand(n) < 0.5, "U", "D")),
        "db": np.where(rng.rand(n) < 0.5, "db0", "db1"),
        "tbl": "t1",
        "pk": rng.randint(-10**9, 10**9, n).astype(np.int64),
        "val": rng.rand(n) * 1e6 - 5e5,
        "k": pd.Series([f"key_{i % 97}" for i in range(n)]),
    })

    def assemble_generic(pdf):
        pdf = pdf.sort_values(["commit_ts", "seq", "arrival_seq"])
        out_ts, out_payload = [], []
        cur_ct, events = None, []

        def flush():
            if cur_ct is not None:
                out_ts.append(int(cur_ct))
                out_payload.append(pb.encode_binlog(int(cur_ct), events))

        for r in pdf.itertuples():
            if r.commit_ts != cur_ct:
                flush()
                cur_ct = r.commit_ts
                events = []
            tp = {"I": pb.INSERT, "U": pb.UPDATE, "D": pb.DELETE}[r.op]
            cols = []
            for name, kind, code, mysql_type in pb._COLSPEC:
                value = getattr(r, name)
                value = float(value) if kind == "double" else (
                    int(value) if kind == "long" else value)
                if tp == pb.UPDATE:
                    cols.append(pb.encode_column(
                        name, code, mysql_type,
                        value - 1 if kind == "double" else value,
                        kind, changed_value=value))
                else:
                    cols.append(pb.encode_column(name, code, mysql_type,
                                                 value, kind))
            events.append(pb.encode_event(r.db, r.tbl, tp, cols))
        flush()
        return pd.DataFrame({"commit_ts": out_ts, "payload": out_payload})

    want = assemble_generic(pdf)
    got = pb._assemble_payloads(pdf)
    assert list(want.commit_ts) == list(got.commit_ts)
    assert all(bytes(a) == bytes(b)
               for a, b in zip(want.payload, got.payload))


def test_assemble_payloads_numpy_matches_row_loop():
    """The numpy batch assembler == the row-at-a-time reference on
    adversarial inputs the generic-encoder test doesn't cover: extreme
    pk magnitudes (full varint widths), negative/zero/denormal vals,
    empty and >64-byte keys (the padded-gather fallback boundary),
    single-row and empty batches."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n = 3000
    pks = rng.choice([0, 1, -1, 127, 128, -128, 2**31, -2**31,
                      2**62, -2**62, 2**63 - 1, -2**63], n)
    vals = rng.choice([0.0, -0.0, 1.0, -1.25, 1e300, -1e-300,
                       5e-324, 1.7976931348623157e308], n)
    keys = [("" if i % 11 == 0 else
             "x" * 200 if i % 13 == 0 else f"k{i % 53}")
            for i in range(n)]
    pdf = pd.DataFrame({
        "commit_ts": np.sort(rng.randint(1, n // 4, n).astype(np.int64)),
        "seq": np.arange(n, dtype=np.int64),
        "arrival_seq": np.arange(n, dtype=np.int64),
        "op": rng.choice(list("IUD"), n),
        "db": rng.choice(["d0", "a_much_longer_database_name"], n),
        "tbl": rng.choice(["t0", "t1", "t2"], n),
        "pk": pks.astype(np.int64),
        "val": vals.astype(np.float64),
        "k": keys,
    })
    for frame in (pdf, pdf.head(1), pdf.head(0)):
        want = pb._assemble_payloads_rows(frame.copy())
        got = pb._assemble_payloads(frame.copy())
        assert list(want.commit_ts) == list(got.commit_ts)
        assert all(bytes(a) == bytes(b)
                   for a, b in zip(want.payload, got.payload))


def test_crc32c_batch_matches_scalar():
    """Vectorized lockstep CRC32C == the scalar table loop for every
    payload, including empty and 1-byte ones (the writer frames with
    the batch form; the reader verifies with the scalar form, so a
    drift would fail every replay)."""
    import numpy as np

    rng = np.random.RandomState(5)
    payloads = [bytes(rng.randint(0, 256, int(l)).astype(np.uint8))
                for l in rng.randint(0, 500, 300)]
    payloads += [b"", b"\x00", b"a", b"123456789"]
    assert pb.crc32c_batch(payloads) == [pb.crc32c(p) for p in payloads]
    assert pb.crc32c_batch([]) == []


def test_scan_records_parity_and_error_text():
    """scan_records (batched CRC verify, r12) == iter_records on
    payload list AND on the first-corrupt-record error."""
    import pytest

    payloads = [pb.encode_binlog(10 + i, [pb.encode_event(
        "d", "t", pb.INSERT,
        [pb.encode_column("pk", 8, "bigint", i, "long"),
         pb.encode_column("val", 5, "double", i * 1.5, "double"),
         pb.encode_column("k", 15, "varchar", f"k{i}", "string")])])
        for i in range(50)]
    blob = b"".join(pb.frame_record(p) for p in payloads)
    assert pb.scan_records(blob) == list(pb.iter_records(blob))
    assert pb.scan_records(b"") == []
    # corrupt a middle record's payload: identical ValueError text
    bad = bytearray(blob)
    off = sum(16 + len(p) for p in payloads[:20])
    bad[off + 14] ^= 0xFF
    with pytest.raises(ValueError) as e1:
        list(pb.iter_records(bytes(bad)))
    with pytest.raises(ValueError) as e2:
        pb.scan_records(bytes(bad))
    assert str(e1.value) == str(e2.value) == f"crc mismatch at offset {off}"
    # magic corruption raises identically too
    bad2 = bytearray(blob)
    bad2[off] ^= 0xFF
    with pytest.raises(ValueError, match=f"magic mismatch at offset {off}"):
        pb.scan_records(bytes(bad2))


def test_dml_rows_fast_parity_with_generic_parse():
    """the shape-specialized reparo-read parser == the generic
    decode_binlog walk on I/U/D events (changed_value picks), and
    skips DDL payloads without emitting rows."""
    payloads = []
    for i in range(40):
        if i % 7 == 0:
            payloads.append(pb.encode_binlog(
                100 + i, ddl_query=b"CREATE TABLE x(a INT)"))
            continue
        tp = (pb.INSERT, pb.UPDATE, pb.DELETE)[i % 3]
        kwargs = {}
        cols = [pb.encode_column("pk", 8, "bigint", i, "long"),
                pb.encode_column("val", 5, "double", i * 1.5,
                                      "double",
                                      **({"changed_value": i * 2.5}
                                         if tp == pb.UPDATE else {})),
                pb.encode_column("k", 15, "varchar", f"k{i}",
                                      "string",
                                      **({"changed_value": f"n{i}"}
                                         if tp == pb.UPDATE else {}))]
        payloads.append(pb.encode_binlog(
            100 + i, [pb.encode_event("d", "t", tp, cols)]))
    fast: list = []
    for p in payloads:
        pb._dml_rows_fast(p, fast)
    slow = []
    for p in payloads:
        b = pb.decode_binlog(p)
        if b["tp"] == pb.DDL:
            continue
        for ev in b["events"]:
            vals = {c["name"]: c for c in ev["columns"]}
            slow.append((
                b["commit_ts"], ev["schema_name"], ev["table_name"],
                pb._OP_OF_TP[ev["tp"]], vals["pk"]["value"],
                float(vals["val"].get("changed_value",
                                      vals["val"]["value"])),
                vals["k"].get("changed_value", vals["k"]["value"])))
    assert fast == slow


def test_dml_rows_fast_failure_leaves_rows_untouched():
    """ADVICE r12: a payload that fails mid-parse (unknown DMLData
    field AFTER a valid event) must leave the shared rows list
    untouched, so the caller's generic-parse fallback can't duplicate
    the already-staged events."""
    import pytest

    def cols(i):
        return [pb.encode_column("pk", 8, "bigint", i, "long"),
                pb.encode_column("val", 5, "double", i * 1.5, "double"),
                pb.encode_column("k", 15, "varchar", f"k{i}", "string")]

    ev1 = pb.encode_event("d", "t", pb.INSERT, cols(1))
    ev2 = pb.encode_event("d", "t", pb.INSERT, cols(2))
    # DMLData with an unknown varint field BETWEEN the two events:
    # the fast parser raises after staging event 1
    dml = (pb._field_bytes(1, ev1) + pb._field_varint(2, 7)
           + pb._field_bytes(1, ev2))
    payload = (pb._field_varint(1, pb.DML) + pb._field_varint(2, 500)
               + pb._field_bytes(3, bytes(dml)))
    rows = [("sentinel",)]
    with pytest.raises(ValueError):
        pb._dml_rows_fast(payload, rows)
    assert rows == [("sentinel",)]
    # the read_pb_dump caller pattern then yields exactly 2 events
    rows = []
    try:
        pb._dml_rows_fast(payload, rows)
    except (KeyError, ValueError, IndexError):
        b = pb.decode_binlog(payload)
        for ev in b["events"]:
            vals = {c["name"]: c for c in ev["columns"]}
            rows.append((b["commit_ts"], ev["schema_name"],
                         ev["table_name"], pb._OP_OF_TP[ev["tp"]],
                         vals["pk"]["value"],
                         float(vals["val"]["value"]),
                         vals["k"]["value"]))
    assert len(rows) == 2 and [r[4] for r in rows] == [1, 2]


def test_scan_records_reports_first_corruption_in_offset_order():
    """ADVICE r12: CRC corruption at an EARLIER offset must win over a
    magic mismatch later in the file — identical to iter_records'
    first-corrupt-record semantics."""
    import pytest

    payloads = [pb.encode_binlog(10 + i, [pb.encode_event(
        "d", "t", pb.INSERT,
        [pb.encode_column("pk", 8, "bigint", i, "long"),
         pb.encode_column("val", 5, "double", i * 1.5, "double"),
         pb.encode_column("k", 15, "varchar", f"k{i}", "string")])])
        for i in range(50)]
    blob = bytearray(b"".join(pb.frame_record(p) for p in payloads))
    off_crc = sum(16 + len(p) for p in payloads[:10])
    off_magic = sum(16 + len(p) for p in payloads[:30])
    blob[off_crc + 14] ^= 0xFF      # payload byte -> CRC mismatch
    blob[off_magic] ^= 0xFF         # later magic mismatch
    with pytest.raises(ValueError) as e1:
        list(pb.iter_records(bytes(blob)))
    with pytest.raises(ValueError) as e2:
        pb.scan_records(bytes(blob))
    assert str(e1.value) == str(e2.value) \
        == f"crc mismatch at offset {off_crc}"
    # and with ONLY the later magic corruption, both report the magic
    blob[off_crc + 14] ^= 0xFF      # restore the payload byte
    with pytest.raises(ValueError, match=f"magic mismatch at offset "
                                         f"{off_magic}"):
        pb.scan_records(bytes(blob))
