"""Real protobuf wire format for the pb binlog dump (reparo input).

The reference's file sink marshals ``pb_binlog.Binlog`` messages
(reference proto/pb_binlog.proto:11-60) and frames them as

    | magic 471532804 (LE u32) | len(payload) (LE u64) | payload | crc |

with CRC32-Castagnoli over the payload (pkg/binlogfile/encoder.go:62-77,
binlogger.go:43). Column values inside an Event are TiDB
``codec.EncodeValue`` datums (drainer/translator/pb.go:242-296) — the
same wire format functions/kvcodec.py implements, so the two layers
compose exactly like the reference's.

Everything here is a pure-Python implementation of the public protobuf
wire encoding (proto2: varint keys, wire types 0/2) — no generated
code, no protobuf dependency.

Message schema (pb_binlog.proto):
  column:  1 name(str)  2 tp(bytes)  3 mysql_type(str)
           4 value(bytes: one codec datum)  5 changed_value(bytes)
  Event:   1 schema_name(str)  2 table_name(str)  3 tp(enum)
           4 row(repeated bytes, each a marshalled column)
  DMLData: 1 events(repeated Event)
  Binlog:  1 tp(enum: 0 DML / 1 DDL)  2 commit_ts(int64)
           3 dml_data(DMLData)  4 ddl_query(bytes)
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

from ..functions.kvcodec import decode_datum, encode_datum

MAGIC = 471532804

INSERT, UPDATE, DELETE = 0, 1, 2
DML, DDL = 0, 1


# ---------------------------------------------------------------------------
# crc32-castagnoli (polynomial 0x1EDC6F41, reflected 0x82F63B78) —
# the table-driven public algorithm; zlib.crc32 is IEEE so unusable.
# ---------------------------------------------------------------------------

def _make_crc32c_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def crc32c_batch(payloads: list[bytes]) -> list[int]:
    """CRC32C of MANY byte strings in numpy lockstep: the per-byte
    table recurrence is inherently sequential WITHIN one message, but
    across messages it vectorizes — iterate byte position j and update
    an N-wide uint32 state vector. Messages are processed in
    length-descending order so the active set at position j is a
    prefix slice (no boolean mask churn); total vector-element work is
    sum(len) — the same byte count as the scalar loop, but at numpy
    gather speed instead of Python interpreter speed (~10x; the
    pb-dump writer's CRC slice at r9 was ~1 core-second per 100k
    events of pure-Python table lookups). Returns CRCs in the INPUT
    order; byte-equality with the scalar crc32c is pinned by
    tests/test_pbcodec.py."""
    import numpy as np
    n = len(payloads)
    if n == 0:
        return []
    order = sorted(range(n), key=lambda i: len(payloads[i]), reverse=True)
    lens = np.array([len(payloads[i]) for i in order], dtype=np.int64)
    maxlen = int(lens[0]) if n else 0
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for row, i in enumerate(order):
        p = payloads[i]
        buf[row, :len(p)] = np.frombuffer(p, dtype=np.uint8)
    table = np.asarray(_CRC_TABLE, dtype=np.uint32)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    # lens is descending: messages still live at byte j form a prefix
    for j in range(maxlen):
        live = int(np.searchsorted(-lens, -(j + 1), side="right"))
        c = crc[:live]
        crc[:live] = table[(c ^ buf[:live, j]) & 0xFF] ^ (c >> 8)
    crc ^= np.uint32(0xFFFFFFFF)
    out = [0] * n
    for row, i in enumerate(order):
        out[i] = int(crc[row])
    return out


# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _field_varint(field: int, v: int) -> bytes:
    # proto int64: negatives as 10-byte two's complement (not zigzag)
    return _uvarint(field << 3) + _uvarint(v & ((1 << 64) - 1))


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _uvarint((field << 3) | 2) + _uvarint(len(payload)) + payload


def parse_message(buf: bytes) -> dict[int, list]:
    """Generic proto2 TLV parse: field -> list of raw values (int for
    wiretype 0, bytes for wiretype 2), repeated fields accumulate."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_uvarint(buf, pos)
        elif wire == 2:
            n, pos = _read_uvarint(buf, pos)
            v = buf[pos:pos + n]
            pos += n
        elif wire == 5:
            (v,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        elif wire == 1:
            (v,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ---------------------------------------------------------------------------
# pb_binlog messages
# ---------------------------------------------------------------------------

def encode_column(name: str, tp: int, mysql_type: str, value,
                  kind: str, changed_value=..., changed_kind: str = None
                  ) -> bytes:
    """One pb.Column; value/changed_value are codec.EncodeValue datums
    (pb.go:246,271-276)."""
    out = bytearray()
    out += _field_bytes(1, name.encode())
    out += _field_bytes(2, bytes([tp]))
    out += _field_bytes(3, mysql_type.encode())
    out += _field_bytes(4, encode_datum(value, kind))
    if changed_value is not ...:
        out += _field_bytes(5, encode_datum(changed_value,
                                            changed_kind or kind))
    return bytes(out)


def decode_column(buf: bytes) -> dict:
    f = parse_message(buf)
    out = {
        "name": f[1][0].decode(),
        "tp": f[2][0][0],
        "mysql_type": f[3][0].decode(),
        "value": decode_datum(f[4][0], 0)[0],
    }
    if 5 in f:
        out["changed_value"] = decode_datum(f[5][0], 0)[0]
    return out


def encode_event(schema_name: str, table_name: str, tp: int,
                 columns: list[bytes]) -> bytes:
    out = bytearray()
    out += _field_bytes(1, schema_name.encode())
    out += _field_bytes(2, table_name.encode())
    out += _field_varint(3, tp)
    for col in columns:
        out += _field_bytes(4, col)
    return bytes(out)


def decode_event(buf: bytes) -> dict:
    f = parse_message(buf)
    return {
        "schema_name": f[1][0].decode(),
        "table_name": f[2][0].decode(),
        "tp": f.get(3, [0])[0],
        "columns": [decode_column(c) for c in f.get(4, [])],
    }


def encode_binlog(commit_ts: int, events: list[bytes] = (),
                  ddl_query: bytes | None = None) -> bytes:
    out = bytearray()
    out += _field_varint(1, DDL if ddl_query is not None else DML)
    out += _field_varint(2, commit_ts)
    if ddl_query is not None:
        out += _field_bytes(4, ddl_query)
    else:
        dml = bytearray()
        for ev in events:
            dml += _field_bytes(1, ev)
        out += _field_bytes(3, bytes(dml))
    return bytes(out)


def decode_binlog(buf: bytes) -> dict:
    f = parse_message(buf)
    out = {"tp": f.get(1, [0])[0],
           "commit_ts": _signed64(f[2][0])}
    if out["tp"] == DDL:
        out["ddl_query"] = f[4][0].decode()
        out["events"] = []
    else:
        dml = parse_message(f[3][0]) if 3 in f else {}
        out["events"] = [decode_event(e) for e in dml.get(1, [])]
    return out


# ---------------------------------------------------------------------------
# file framing (pkg/binlogfile)
# ---------------------------------------------------------------------------

def frame_record(payload: bytes) -> bytes:
    return (struct.pack("<I", MAGIC)
            + struct.pack("<Q", len(payload))
            + payload
            + struct.pack("<I", crc32c(payload)))


def iter_records(data: bytes) -> Iterator[bytes]:
    """Yield payloads; raises on magic or CRC mismatch (the reference
    seeks past corruption — binlogger.go:504-540 — but a fresh dump
    must be clean, so corruption here is an error). Retained as the
    parity oracle for :func:`scan_records`."""
    pos = 0
    while pos < len(data):
        (magic,) = struct.unpack_from("<I", data, pos)
        if magic != MAGIC:
            raise ValueError(f"magic mismatch at offset {pos}")
        (length,) = struct.unpack_from("<Q", data, pos + 4)
        payload = data[pos + 12:pos + 12 + length]
        (crc,) = struct.unpack_from("<I", data, pos + 12 + length)
        if crc != crc32c(payload):
            raise ValueError(f"crc mismatch at offset {pos}")
        yield payload
        pos += 16 + length


def scan_records(data: bytes) -> list[bytes]:
    """iter_records with BATCHED CRC verification (VERDICT r11 item
    7, the read direction of the r11 numpy write pattern): the
    position walk reads only each record's 12-byte header, then ALL
    payload CRCs verify in one crc32c_batch lockstep pass — same
    payloads, same first-corrupt-record error text as the oracle
    generator above (tests pin both)."""
    import numpy as np
    pos, n = 0, len(data)
    u32, u64 = struct.Struct("<I"), struct.Struct("<Q")
    starts, lens, stored, offs = [], [], [], []
    magic_err = None          # (offset) of the first bad magic, if any
    while pos < n:
        (magic,) = u32.unpack_from(data, pos)
        if magic != MAGIC:
            # Don't raise yet: an EARLIER record may have a bad CRC,
            # and iter_records (first-corrupt-record semantics) would
            # report that one. Verify the records walked so far and
            # raise whichever corruption has the lower offset.
            magic_err = pos
            break
        (length,) = u64.unpack_from(data, pos + 4)
        starts.append(pos + 12)
        lens.append(length)
        stored.append(u32.unpack_from(data, pos + 12 + length)[0])
        offs.append(pos)
        pos += 16 + length
    payloads = [data[s:s + ln] for s, ln in zip(starts, lens)]
    got = np.asarray(crc32c_batch(payloads), dtype=np.uint64)
    want = np.asarray(stored, dtype=np.uint64)
    bad = np.nonzero(got != want)[0]
    if len(bad):
        raise ValueError(f"crc mismatch at offset {offs[int(bad[0])]}")
    if magic_err is not None:
        raise ValueError(f"magic mismatch at offset {magic_err}")
    return payloads


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

# (name, datum kind, mysql tp code, mysql type name) for the normalized
# change stream's row image
_COLSPEC = (("pk", "long", 8, "bigint"),
            ("val", "double", 5, "double"),
            ("k", "string", 15, "varchar"))


# constant assembly fragments, encoded once at import: the column
# headers (pb.Column fields 1-3: name/tp/mysql_type) are identical
# for every row of the normalized stream
_COL_HDR = {name: (_field_bytes(1, name.encode())
                   + _field_bytes(2, bytes([code]))
                   + _field_bytes(3, mysql_type.encode()))
            for name, _kind, code, mysql_type in _COLSPEC}
_UV1 = [bytes([i]) for i in range(128)]      # 1-byte varints
_OP_TP = {"I": INSERT, "U": UPDATE, "D": DELETE}


def _assemble_payloads_rows(pdf):
    """Row-at-a-time reference assembler (r10). Kept as the parity
    oracle for the numpy batch assembler below — tests pin
    _assemble_payloads byte-equal to this, and this byte-equal to
    composing encode_column/encode_event/encode_binlog.

    (commit_ts, seq, arrival_seq, op, db, tbl, pk, val, k) pandas
    batch -> one marshalled pb.Binlog row per commit_ts. Built from
    MEMOIZED constant fragments (r10, VERDICT r9 item 6): headers
    encode once (module scope for columns, per-batch memo for
    (db, tbl, tp) event headers); per row only the value datums and
    the length-delimited glue vary, with single-byte varints served
    from a 128-entry table."""
    import pandas as pd

    pdf = pdf.sort_values(["commit_ts", "seq", "arrival_seq"])
    out_ts: list[int] = []
    out_payload: list[bytes] = []
    cur_ct = None
    events: list[bytes] = []
    evt_hdr: dict[tuple, bytes] = {}    # (db, tbl, tp) -> fields 1-3

    def flush():
        if cur_ct is not None:
            out_ts.append(int(cur_ct))
            out_payload.append(encode_binlog(int(cur_ct), events))

    for r in pdf.itertuples():
        if r.commit_ts != cur_ct:
            flush()
            cur_ct = r.commit_ts
            events = []
        tp = _OP_TP[r.op]
        hk = (r.db, r.tbl, tp)
        hdr = evt_hdr.get(hk)
        if hdr is None:
            hdr = evt_hdr[hk] = (_field_bytes(1, r.db.encode())
                                 + _field_bytes(2, r.tbl.encode())
                                 + _field_varint(3, tp))
        parts = [hdr]
        for name, kind, code, mysql_type in _COLSPEC:
            value = getattr(r, name)
            if kind == "double":
                value = float(value)
            elif kind == "long":
                value = int(value)
            if tp == UPDATE:
                d = encode_datum(
                    value - 1 if kind == "double" else value, kind)
                d2 = encode_datum(value, kind)
                nd, nd2 = len(d), len(d2)
                col = (_COL_HDR[name]
                       + b"\x22" + (_UV1[nd] if nd < 128
                                    else _uvarint(nd)) + d
                       + b"\x2a" + (_UV1[nd2] if nd2 < 128
                                    else _uvarint(nd2)) + d2)
            else:
                d = encode_datum(value, kind)
                nd = len(d)
                col = (_COL_HDR[name]
                       + b"\x22" + (_UV1[nd] if nd < 128
                                    else _uvarint(nd)) + d)
            nc = len(col)
            # pb.Event field 4 (repeated row bytes)
            parts.append(b"\x22" + (_UV1[nc] if nc < 128
                                    else _uvarint(nc)) + col)
        events.append(b"".join(parts))
    flush()
    return pd.DataFrame({"commit_ts": out_ts, "payload": out_payload})


# --- numpy batch assembly (r11, VERDICT r10 item 6) ----------------------

def _intra(lens):
    """[0..l0), [0..l1), ... as one flat int64 array."""
    import numpy as np
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    excl = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(excl, lens)


def _uvarint_matrix(u):
    """uvarint bytes of a uint64 array: (N,10) uint8 matrix + per-row
    byte count. Row j's bytes are mat[j, :n[j]] — identical to
    _uvarint(int(u[j]))."""
    import numpy as np
    u = u.astype(np.uint64, copy=False)
    n = np.ones(len(u), dtype=np.int64)
    for j in range(1, 10):
        n += (u >= (np.uint64(1) << np.uint64(7 * j)))
    mat = np.empty((len(u), 10), dtype=np.uint8)
    for j in range(10):
        byte = (u >> np.uint64(7 * j)) & np.uint64(0x7F)
        mat[:, j] = np.where(j + 1 < n, byte | np.uint64(0x80),
                             byte).astype(np.uint8)
    return mat, n


class _SegBuf:
    """Flat byte-buffer assembler: declare per-row segments in layout
    order, then ``render(buf, row_off)`` writes each with one
    vectorized operation. Widths stay small (<= ~30 bytes/segment) so
    every write is an (N, w) broadcast — no per-byte index arrays over
    the whole buffer. ``present`` masks a segment to a row subset
    (zero length elsewhere)."""

    def __init__(self, np, n_rows: int):
        self.np = np
        self.n = n_rows
        self.segs = []          # (lens, present, writer)

    def matrix(self, mat, nbytes=None, present=None):
        """Per-row bytes from an (N, w) uint8 matrix; with ``nbytes``
        only the first nbytes[j] bytes of row j are written (varints,
        padded gathers)."""
        np = self.np

        def write(buf, off, rows):
            m = mat if rows is None else mat[rows]
            if nbytes is None:
                buf[off[:, None] + np.arange(m.shape[1])] = m
            else:
                vn = nbytes if rows is None else nbytes[rows]
                idx = off[:, None] + np.arange(m.shape[1])
                mask = np.arange(m.shape[1])[None, :] < vn[:, None]
                buf[idx[mask]] = m[mask]
        lens = (np.full(self.n, mat.shape[1], dtype=np.int64)
                if nbytes is None else nbytes.astype(np.int64))
        self._add(lens, present, write)

    def coded(self, uniq_bytes, codes, present=None):
        """Per-row bytes from a small per-unique pool, gathered by
        code: pads the uniques to (U, maxw) and broadcasts — index
        math is (N, maxw), never per-byte over the buffer. A huge
        outlier unique (maxw > 64) would make the padded matrix
        N x maxw; fall back to a ragged per-byte gather there (cost
        proportional to actual bytes, not the padded width)."""
        np = self.np
        lens_u = np.array([len(b) for b in uniq_bytes], dtype=np.int64)
        maxw = int(lens_u.max()) if len(lens_u) else 0
        if maxw > 64:
            flat = np.frombuffer(b"".join(uniq_bytes), dtype=np.uint8)
            starts_u = np.cumsum(lens_u) - lens_u
            starts, lens = starts_u[codes], lens_u[codes]

            def write(buf, off, rows):
                s = starts if rows is None else starts[rows]
                ln = lens if rows is None else lens[rows]
                buf[np.repeat(off, ln) + _intra(ln)] = \
                    flat[np.repeat(s, ln) + _intra(ln)]
            self._add(lens.astype(np.int64), present, write)
            return
        pool = np.zeros((len(uniq_bytes), maxw), dtype=np.uint8)
        for i, b in enumerate(uniq_bytes):
            pool[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        self.matrix(pool[codes], lens_u[codes], present=present)

    def _add(self, lens, present, write):
        if present is not None:
            lens = self.np.where(present, lens, 0)
        self.segs.append((lens, present, write))

    def lengths(self):
        total = self.segs[0][0].copy()
        for lens, _, _ in self.segs[1:]:
            total += lens
        return total

    def render(self, buf, row_off):
        """Write all segments into ``buf`` starting at row_off[j] for
        row j (rows must not overlap)."""
        np = self.np
        seg_off = row_off
        for lens, present, write in self.segs:
            if present is None:
                write(buf, seg_off, None)
            else:
                rows = np.flatnonzero(present)
                if len(rows):
                    write(buf, seg_off[rows], rows)
            seg_off = seg_off + lens
        return buf


def _assemble_payloads(pdf):
    """numpy batch twin of :func:`_assemble_payloads_rows` — the same
    (commit_ts, seq, arrival_seq, op, db, tbl, pk, val, k) batch to
    one marshalled pb.Binlog per commit_ts, byte-identical (pinned by
    tests/test_pbcodec.py parity tests), but every variable-length
    piece (zigzag varints, ordered-double bits, length glue) is
    computed across the whole batch in numpy and written into one
    flat buffer with (N, width) broadcasts; Python touches only
    per-unique memo values and the final per-txn slicing (VERDICT r10
    item 6: the row loop was the pb-dump wire bottleneck)."""
    import numpy as np
    import pandas as pd

    from ..functions.kvcodec import encode_datum

    pdf = pdf.sort_values(["commit_ts", "seq", "arrival_seq"],
                          kind="mergesort")
    n = len(pdf)
    if n == 0:
        return pd.DataFrame({"commit_ts": pd.Series([], dtype="int64"),
                             "payload": pd.Series([], dtype=object)})

    ct = pdf["commit_ts"].to_numpy(np.int64)
    pk = pdf["pk"].to_numpy(np.int64)
    val = pdf["val"].to_numpy(np.float64)
    tp = pdf["op"].map(_OP_TP).to_numpy(np.int64)
    is_u = tp == UPDATE

    # event headers memoized per (db, tbl, tp): factorize each column
    # and combine the integer codes (string concat would round-trip
    # through numpy unicode, which mangles separator bytes)
    # use_na_sentinel=False: the default -1 NA code would go negative
    # in the combined integer and wrap duniq[dt // len(tuniq)] to a
    # WRONG header silently; without the sentinel a null db/tbl gets
    # its own unique (str(None)/nan), matching the row-path oracle
    dcodes, duniq = pd.factorize(pdf["db"], use_na_sentinel=False)
    tcodes, tuniq = pd.factorize(pdf["tbl"], use_na_sentinel=False)
    combined = (dcodes.astype(np.int64) * len(tuniq) + tcodes) * 3 + tp
    hcodes, huniq = pd.factorize(combined)
    hdrs = []
    for key in huniq:
        t = int(key) % 3
        dt = int(key) // 3
        db, tbl = duniq[dt // len(tuniq)], tuniq[dt % len(tuniq)]
        hdrs.append(_field_bytes(1, str(db).encode())
                    + _field_bytes(2, str(tbl).encode())
                    + _field_varint(3, t))

    # pk datum: VARINT_FLAG + uvarint(zigzag(pk))
    upk = pk.astype(np.uint64)
    zz = (upk << np.uint64(1)) ^ np.where(
        pk < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
    pk_mat, pk_n = _uvarint_matrix(zz)
    dpk_len = 1 + pk_n                      # flag + varint

    # val datum bytes: FLOAT_FLAG + 8B big-endian ordered u64;
    # UPDATE rows carry (val - 1) in field 4 and val in field 5
    def _ordered_bytes(f64):
        u = np.ascontiguousarray(f64).view(np.uint64)
        sign = np.uint64(1) << np.uint64(63)
        o = np.where(u & sign, ~u, u | sign)
        return o.astype(">u8").view(np.uint8).reshape(-1, 8)

    val_new = _ordered_bytes(val)
    val_old = _ordered_bytes(np.where(is_u, val - 1.0, val))

    # k datum memoized per unique string (full datum incl flag)
    kcodes, kuniq = pd.factorize(pdf["k"], use_na_sentinel=False)
    kdatums = [encode_datum(u, "string") for u in kuniq]
    klens_u = np.array([len(d) for d in kdatums], dtype=np.int64)
    dk_lens = klens_u[kcodes]
    dk_mat, dk_vn = _uvarint_matrix(dk_lens.astype(np.uint64))

    c1, c2, c3 = (len(_COL_HDR["pk"]), len(_COL_HDR["val"]),
                  len(_COL_HDR["k"]))
    colpk_len = c1 + (2 + dpk_len) * np.where(is_u, 2, 1)
    colval_len = c2 + 11 * np.where(is_u, 2, 1)     # 0x22 0x09 f 8B
    colk_len = c3 + (1 + dk_vn + dk_lens) * np.where(is_u, 2, 1)
    ck_mat, ck_vn = _uvarint_matrix(colk_len.astype(np.uint64))
    # colpk/colval stay < 128 (fixed col specs), so their length
    # varints are single bytes; colk carries a full varint. Hard
    # error, not assert: python -O would strip an assert and a future
    # _COLSPEC change would then emit corrupt wire bytes silently.
    if int(colpk_len.max()) >= 128 or int(colval_len.max()) >= 128:
        raise ValueError(
            "column block exceeds single-byte length varint "
            f"(pk {int(colpk_len.max())}, val {int(colval_len.max())}); "
            "_COLSPEC changed — widen the length encoding")

    def fused(*cols):
        """Column-stack scalars / vectors / (N, w) blocks into one
        uint8 matrix — merges adjacent constant and 1-byte-variable
        segments into a single broadcast write."""
        parts = []
        for c in cols:
            if isinstance(c, (int, bytes)):
                b = bytes([c]) if isinstance(c, int) else c
                parts.append(np.broadcast_to(
                    np.frombuffer(b, dtype=np.uint8), (n, len(b))))
            elif c.ndim == 1:
                parts.append(c.astype(np.uint8).reshape(-1, 1))
            else:
                parts.append(c)
        return np.concatenate(parts, axis=1)

    body = _SegBuf(np, n)
    body.coded(hdrs, hcodes)                             # event hdr
    # pk column: glue + header + field-4 datum prefix in ONE write
    body.matrix(fused(0x22, colpk_len, _COL_HDR["pk"], 0x22, dpk_len,
                      bytes([8])))
    body.matrix(pk_mat, pk_n)                            # pk varint
    body.matrix(fused(0x2A, dpk_len, bytes([8])), present=is_u)
    body.matrix(pk_mat, pk_n, present=is_u)
    # val column: fixed width end to end
    body.matrix(fused(0x22, colval_len, _COL_HDR["val"],
                      b"\x22\x09" + bytes([5]), val_old))
    body.matrix(fused(b"\x2a\x09" + bytes([5]), val_new),
                present=is_u)
    # k column
    ckfull = np.concatenate(
        [np.full((n, 1), 0x22, dtype=np.uint8), ck_mat], axis=1)
    body.matrix(ckfull, ck_vn + 1)
    body.matrix(fused(_COL_HDR["k"], 0x22))
    body.matrix(dk_mat, dk_vn)
    body.coded(kdatums, kcodes)
    u_tail = np.concatenate(
        [np.full((n, 1), 0x2A, dtype=np.uint8), dk_mat], axis=1)
    body.matrix(u_tail, dk_vn + 1, present=is_u)
    body.coded(kdatums, kcodes, present=is_u)

    body_len = body.lengths()
    eb_mat, eb_vn = _uvarint_matrix(body_len.astype(np.uint64))
    pfxfull = np.concatenate(
        [np.full((n, 1), 0x0A, dtype=np.uint8), eb_mat], axis=1)
    pfx_len = eb_vn + 1
    ev_len = pfx_len + body_len
    ev_off = np.cumsum(ev_len) - ev_len
    evbuf = np.empty(int(ev_len.sum()), dtype=np.uint8)
    pfx = _SegBuf(np, n)
    pfx.matrix(pfxfull, pfx_len)
    pfx.render(evbuf, ev_off)
    body.render(evbuf, ev_off + pfx_len)

    # txn grouping: sorted ct -> contiguous event runs per commit
    starts = np.flatnonzero(np.r_[True, ct[1:] != ct[:-1]])
    cts = ct[starts]
    dml_len = np.add.reduceat(ev_len, starts)
    dml_off = ev_off[starts]
    dl_mat, dl_vn = _uvarint_matrix(dml_len.astype(np.uint64))
    ct_mat, ct_vn = _uvarint_matrix(cts.astype(np.uint64))

    t = len(cts)
    lead = b"\x08" + _uvarint(DML) + b"\x10"
    hdr_mats = np.concatenate([
        np.broadcast_to(np.frombuffer(lead, dtype=np.uint8),
                        (t, len(lead))),
    ], axis=1)
    hdr_seg = _SegBuf(np, t)
    hdr_seg.matrix(hdr_mats)
    hdr_seg.matrix(ct_mat, ct_vn)
    hdr_seg.matrix(np.full((t, 1), 0x1A, dtype=np.uint8))
    hdr_seg.matrix(dl_mat, dl_vn)
    hl = hdr_seg.lengths()
    ho = np.cumsum(hl) - hl
    hbuf = np.empty(int(hl.sum()), dtype=np.uint8)
    hdr_seg.render(hbuf, ho)

    he = ho + hl
    de = dml_off + dml_len
    out_payload = [
        hbuf[ho[i]:he[i]].tobytes() + evbuf[dml_off[i]:de[i]].tobytes()
        for i in range(t)]
    return pd.DataFrame({"commit_ts": cts.astype(np.int64),
                         "payload": out_payload})


def binlog_payloads(changes, n_buckets: int | None = None
                    ) -> "DataFrame":  # noqa: F821
    """One marshalled pb.Binlog per TRANSACTION (commit_ts), events in
    (seq, arrival_seq) order — the reference writes one file record per
    commit (drainer/sync/pb.go). Emits (commit_ts, payload BINARY).

    Arrow granularity: the applyInPandas groups are hash(commit_ts) %
    n_buckets (default 4 x parallelism — even load at any ts density);
    the per-commit split is ONE in-batch sort + linear scan
    (_assemble_payloads), not a Python call per (tiny) transaction."""
    from pyspark.sql import functions as F
    assemble = _assemble_payloads
    if n_buckets is None:
        n_buckets = changes.sparkSession.sparkContext \
            .defaultParallelism * 4
    bucketed = changes.withColumn(
        "_tsb", F.pmod(F.hash("commit_ts"), F.lit(n_buckets)))
    return (bucketed.groupBy("_tsb")
            .applyInPandas(assemble, schema="commit_ts long, payload binary"))


def ddl_payloads(ddls) -> "DataFrame":  # noqa: F821
    """(commit_ts, db, ddl_sql) -> marshalled DDL Binlog records with
    the reference's USE-prefix rule (pb.go:43-55: CREATE DATABASE gets
    a bare ';', everything else 'use `db`; <sql>;')."""
    from pyspark.sql import functions as F
    prefixed = ddls.select(
        "commit_ts",
        F.when(F.upper(F.col("ddl_sql"))
                .rlike("^CREATE (DATABASE|SCHEMA)"),
               F.concat(F.col("ddl_sql"), F.lit(";")))
         .otherwise(F.concat(F.lit("use `"), F.col("db"), F.lit("`; "),
                             F.col("ddl_sql"), F.lit(";")))
         .alias("ddl_query"))

    import pandas as pd

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "commit_ts": pdf["commit_ts"],
                "payload": [
                    encode_binlog(int(ct), ddl_query=q.encode())
                    for ct, q in zip(pdf["commit_ts"], pdf["ddl_query"])]})

    return prefixed.mapInPandas(assemble,
                                schema="commit_ts long, payload binary")


def write_pb_dump(changes, path: str, partitions: int | None = None,
                  ddls=None) -> None:
    """Frame + append binlog records into <path>/binlog-<part>.pb files,
    bucketed by commit-ts range like the parquet dump (each task writes
    one file; on a cluster ``path`` is shared storage). Records within
    a file are commit_ts-ascending."""
    if partitions is None:
        # hash-partition ts buckets into the session's shuffle
        # parallelism: non-empty partitions (= files) still track the
        # DISTINCT bucket count — an empty partition writes nothing —
        # without the extra count(distinct) job the r9 form ran to
        # size the shuffle exactly (two buckets sharing a partition
        # merge into one file, which the exact sizing also allowed
        # via hash collisions; the read path filters on record
        # content, not file assignment).
        partitions = int(changes.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
    payloads = binlog_payloads(changes)
    if ddls is not None:
        payloads = payloads.unionByName(ddl_payloads(ddls))
    os.makedirs(path, exist_ok=True)

    import pandas as pd

    def write_partition(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
        # Arrow-batched writer (r11): records arrive sorted within the
        # partition (sortWithinPartitions below), so batches stream to
        # the file in order — no pickled-Row iterator, no in-task sort.
        f = None
        n_out = 0
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if f is None:
                    first_ct = int(pdf["commit_ts"].iloc[0])
                    bucket = first_ct // 100000
                    fn = os.path.join(
                        path, f"binlog-{bucket:010d}-{first_ct}.pb")
                    f = open(fn, "wb")
                recs = [bytes(p) for p in pdf["payload"]]
                crcs = crc32c_batch(recs)   # vectorized across records
                f.write(b"".join(
                    struct.pack("<I", MAGIC) + struct.pack("<Q", len(p))
                    + p + struct.pack("<I", crc)
                    for p, crc in zip(recs, crcs)))
                n_out += len(recs)
        finally:
            if f is not None:
                f.close()
        yield pd.DataFrame({"n": [n_out]})

    (payloads
     .repartition(partitions,
                  (payloads["commit_ts"] / 100000).cast("long"))
     .sortWithinPartitions("commit_ts")
     .mapInPandas(write_partition, "n long")
     .write.format("noop").mode("overwrite").save())


def write_pb_segments(changes, path: str, suffix: str = "",
                      partitions: int | None = None,
                      ddls=None) -> list[dict]:
    """Segmented variant of :func:`write_pb_dump` for the STREAMING
    file sink (streaming/file_dump_stream): same record framing and
    ts-bucketed layout, plus

    - file names carry the first AND last record commit-ts —
      ``binlog-<bucket>-<first>-<last><suffix>.pb`` — so crash
      recovery (truncate segments past the checkpoint) and retention
      GC (drop segments wholly below the safepoint) are name-driven,
      the role the reference's segment index + pb.Pos cursor play
      (pkg/binlogfile/binlogger.go:50, drainer/sync/pb.go:38-120);
    - each file lands via tmp + atomic rename, so a reader scanning
      ``*.pb`` never sees a torn segment and a re-delivered
      micro-batch overwrites its own files idempotently.

    Returns the written segments as [{"file", "n", "first_ts",
    "last_ts"}] — one entry per non-empty partition, driver-bounded.
    """
    if partitions is None:
        partitions = int(changes.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
    payloads = binlog_payloads(changes)
    if ddls is not None:
        payloads = payloads.unionByName(ddl_payloads(ddls))
    os.makedirs(path, exist_ok=True)

    import pandas as pd

    def write_partition(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
        # buffer the partition's framed bytes, then name the file by
        # (bucket, first_ts, last_ts) and publish with atomic rename
        chunks: list[bytes] = []
        first_ct = last_ct = None
        n_out = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if first_ct is None:
                first_ct = int(pdf["commit_ts"].iloc[0])
            last_ct = int(pdf["commit_ts"].iloc[-1])
            recs = [bytes(p) for p in pdf["payload"]]
            crcs = crc32c_batch(recs)
            chunks.append(b"".join(
                struct.pack("<I", MAGIC) + struct.pack("<Q", len(p))
                + p + struct.pack("<I", crc)
                for p, crc in zip(recs, crcs)))
            n_out += len(recs)
        if first_ct is None:
            yield pd.DataFrame({"file": pd.Series([], dtype=object),
                                "n": pd.Series([], dtype="int64"),
                                "first_ts": pd.Series([], dtype="int64"),
                                "last_ts": pd.Series([], dtype="int64")})
            return
        bucket = first_ct // 100000
        fn = os.path.join(
            path, f"binlog-{bucket:010d}-{first_ct}-{last_ct}{suffix}.pb")
        tmp = fn + ".tmp"
        with open(tmp, "wb") as f:
            for c in chunks:
                f.write(c)
        os.replace(tmp, fn)
        yield pd.DataFrame({"file": [os.path.basename(fn)], "n": [n_out],
                            "first_ts": [first_ct], "last_ts": [last_ct]})

    out = (payloads
           .repartition(partitions,
                        (payloads["commit_ts"] / 100000).cast("long"))
           .sortWithinPartitions("commit_ts")
           .mapInPandas(write_partition,
                        "file string, n long, first_ts long, last_ts long")
           .collect())
    return [r.asDict() for r in out]


_OP_OF_TP = {INSERT: "I", UPDATE: "U", DELETE: "D"}


def _dml_rows_fast(payload: bytes, rows: list) -> None:
    """Shape-specialized unmarshal of one DML Binlog payload into
    read_pb_dump's row tuples — the same walk decode_binlog +
    decode_event + decode_column perform, but with direct varint
    cursors instead of per-message field dicts (the generic parse
    allocates 4 dicts + lists per column; this allocates the row
    tuple). Raises KeyError/ValueError/IndexError on any shape it
    doesn't recognize — the caller falls back to the generic parser
    for THAT payload, so unusual dumps stay correct (parity pinned by
    tests/test_pbcodec.py). Rows are staged in a local list and only
    extended onto `rows` after the WHOLE payload parses, so a
    mid-payload raise leaves `rows` untouched and the fallback
    re-parse cannot duplicate earlier events."""
    pos, n = 0, len(payload)
    tp = ct = None
    dml = None
    while pos < n:
        key, pos = _read_uvarint(payload, pos)
        f, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_uvarint(payload, pos)
            if f == 1:
                tp = v
            elif f == 2:
                ct = _signed64(v)
        elif wire == 2:
            ln, pos = _read_uvarint(payload, pos)
            if f == 3:
                dml = payload[pos:pos + ln]
            pos += ln
        else:
            raise ValueError(f"wire {wire}")
    if tp == DDL:
        return
    if ct is None or dml is None:
        if dml is None:     # empty DML section: no rows
            return
        raise ValueError("no commit_ts")
    pos, n = 0, len(dml)
    staged: list = []
    while pos < n:
        key, pos = _read_uvarint(dml, pos)
        if key != (1 << 3) | 2:
            raise ValueError("unexpected DMLData field")
        eln, pos = _read_uvarint(dml, pos)
        ev = dml[pos:pos + eln]
        pos += eln
        # Event: 1 schema, 2 table, 3 tp, 4 repeated column
        epos, en = 0, len(ev)
        schema = table = None
        etp = 0
        vals = {}
        while epos < en:
            ekey, epos = _read_uvarint(ev, epos)
            ef, ewire = ekey >> 3, ekey & 7
            if ewire == 0:
                v, epos = _read_uvarint(ev, epos)
                if ef == 3:
                    etp = v
                continue
            if ewire != 2:
                raise ValueError(f"wire {ewire}")
            ln, epos = _read_uvarint(ev, epos)
            blob = ev[epos:epos + ln]
            epos += ln
            if ef == 1:
                schema = blob.decode()
            elif ef == 2:
                table = blob.decode()
            elif ef == 4:
                # Column: 1 name, 4 value datum, 5 changed datum
                cpos, cn = 0, len(blob)
                name = value = changed = None
                has_changed = False
                while cpos < cn:
                    ckey, cpos = _read_uvarint(blob, cpos)
                    cf, cwire = ckey >> 3, ckey & 7
                    if cwire != 2:
                        v, cpos = _read_uvarint(blob, cpos)
                        continue
                    cln, cpos = _read_uvarint(blob, cpos)
                    cblob = blob[cpos:cpos + cln]
                    cpos += cln
                    if cf == 1:
                        name = cblob
                    elif cf == 4:
                        value = cblob
                    elif cf == 5:
                        changed = cblob
                        has_changed = True
                    # tp / mysql_type: constant headers, skipped
                datum = changed if has_changed else value
                vals[name] = decode_datum(datum, 0)[0]
        staged.append((ct, schema, table, _OP_OF_TP[etp],
                       vals[b"pk"], float(vals[b"val"]), vals[b"k"]))
    rows.extend(staged)


def read_pb_dump(spark, path: str, start_ts: int | None = None,
                 stop_ts: int | None = None) -> "DataFrame":  # noqa: F821
    """Reparo-equivalent replay: scan the .pb files, verify magic+CRC,
    unmarshal, explode to one row per mutation. binaryFile source +
    mapInPandas keeps the decode distributed (one task per file)."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for payload in scan_records(bytes(content)):
                    try:
                        _dml_rows_fast(payload, rows)
                    except (KeyError, ValueError, IndexError):
                        # unusual shape: the generic (oracle) parse
                        b = decode_binlog(payload)
                        if b["tp"] == DDL:
                            continue   # read_pb_dump_ddl reads these
                        for ev in b["events"]:
                            vals = {c["name"]: c for c in ev["columns"]}
                            op = _OP_OF_TP[ev["tp"]]
                            rows.append((
                                b["commit_ts"], ev["schema_name"],
                                ev["table_name"], op,
                                vals["pk"]["value"],
                                float(vals["val"].get(
                                    "changed_value",
                                    vals["val"]["value"])),
                                vals["k"].get("changed_value",
                                              vals["k"]["value"]),
                            ))
            yield pd.DataFrame(
                rows, columns=["commit_ts", "db", "tbl", "op",
                               "pk", "val", "k"])

    df = (spark.read.format("binaryFile").load(os.path.join(path, "*.pb"))
          .select("content")
          .mapInPandas(decode,
                       schema="commit_ts long, db string, tbl string, "
                              "op string, pk long, val double, k string"))
    if start_ts is not None:
        df = df.where(df["commit_ts"] >= start_ts)
    if stop_ts is not None:
        df = df.where(df["commit_ts"] <= stop_ts)
    return df


def read_pb_dump_ddl(spark, path: str) -> "DataFrame":  # noqa: F821
    """The DDL records of a dump: (commit_ts, ddl_query) — reparo
    replays these as barriers between the DML ranges."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for payload in scan_records(bytes(content)):
                    b = decode_binlog(payload)
                    if b["tp"] == DDL:
                        rows.append((b["commit_ts"], b["ddl_query"]))
            yield pd.DataFrame(rows, columns=["commit_ts", "ddl_query"])

    return (spark.read.format("binaryFile").load(os.path.join(path, "*.pb"))
            .select("content")
            .mapInPandas(decode,
                         schema="commit_ts long, ddl_query string"))
