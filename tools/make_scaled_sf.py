"""Derive a LARGER scale-factor directory from an existing driver one
by disjoint-keyspace replication — for scaling MEASUREMENTS only (the
driver's own sf dirs stay authoritative for correctness; this never
writes outside the repo).

Construction (copies = N gives N x the rows):
- events: copy i shifts event_id by i*max_id and user_id by
  i*max_user, so the derived change stream gets N disjoint commit-ts
  bands AND N x the distinct PKs — a 10x corpus looks like more keys,
  not hotter keys. Everything else (op mix, source interleave,
  disorder/dup markers) replicates structurally.
- documents: copy i shifts doc_id and prefixes every token with
  ``c{i}_`` (ALL copies, so no natural source token can collide with
  a prefixed one; the underscore delimiter keeps multi-digit copy
  indices unambiguous), which keeps each copy's internal near-dup
  structure intact while making shingle spaces disjoint across
  copies — the near-dup pair workload scales exactly N x instead of
  exploding quadratically in the copy count.

- TPC-H (orders + lineitem): copy i shifts o_orderkey/l_orderkey by
  i*span (disjoint order bands, referential integrity per copy);
  dimension tables copy verbatim — the more-transactions growth
  model, so the snapshot_* join/agg family gets graded too.

Types are preserved exactly via pyarrow (the driver parquet carries
TIMESTAMP(NANOS) that engines downcast if rewritten naively).

Usage: python tools/make_scaled_sf.py SRC_DIR DST_DIR COPIES
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _concat_write(parts: list[pa.Table], dst: str) -> int:
    out = pa.concat_tables(parts)
    # bounded row groups: pyarrow's default (~1M rows) writes the
    # 500k-row 100x documents table as ONE row group, and a row group
    # is Spark's minimum split — every map-only stage (the zero-shuffle
    # regex/projection family) then runs on a single task no matter how
    # many cores exist. 16k-row groups keep scans ~32-way parallel at
    # every derived scale. (At real scale the file/row-group layout IS
    # the parallelism knob for map stages.)
    pq.write_table(out, dst, row_group_size=16_384)
    return out.num_rows


def scale_events(src_dir: str, dst_dir: str, copies: int) -> int:
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    # +50 id padding: the change-stream derivation's late-ts marker
    # (event_id % 97 == 0 -> commit_ts = id*10 - 500) reaches at most
    # 500 ts units (= 50 ids) below its band, so padding the span by
    # 50 keeps every copy's commit-ts band STRICTLY disjoint from its
    # neighbor — no accidental cross-copy ts collisions that the
    # order gate would misread as duplicates.
    id_span = pc.max(t["event_id"]).as_py() + 1 + 50
    user_span = pc.max(t["user_id"]).as_py() + 1
    parts = []
    for i in range(copies):
        c = t
        if i:
            c = c.set_column(
                c.schema.get_field_index("event_id"), "event_id",
                pc.add(c["event_id"], i * id_span))
            c = c.set_column(
                c.schema.get_field_index("user_id"), "user_id",
                pc.add(c["user_id"], i * user_span))
        parts.append(c)
    return _concat_write(parts, os.path.join(dst_dir, "events.parquet"))


def scale_documents(src_dir: str, dst_dir: str, copies: int) -> int:
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    doc_span = pc.max(t["doc_id"]).as_py() + 1
    parts = []
    for i in range(copies):
        c = t
        if i:
            c = c.set_column(
                c.schema.get_field_index("doc_id"), "doc_id",
                pc.add(c["doc_id"], i * doc_span))
        # EVERY copy gets its own token prefix (copy 0 included): if
        # copy 0 were verbatim, a natural source token that happens to
        # start with "c<digit>_" could collide with another copy's
        # prefixed token. The trailing underscore disambiguates
        # multi-digit copy indices ("c1_0x" vs "c10_x").
        text = pc.replace_substring_regex(
            c["text"], pattern=r"(\S+)", replacement=rf"c{i}_\1")
        c = c.set_column(
            c.schema.get_field_index("text"), "text",
            text.cast(c.schema.field("text").type))
        parts.append(c)
    return _concat_write(parts, os.path.join(dst_dir, "documents.parquet"))


def scale_embeddings(src_dir: str, dst_dir: str, copies: int) -> int:
    """Vectors replicate VERBATIM with shifted vec_id: the ANN
    workloads select query/centroid sets by vec_id residues, so each
    copy contributes its own queries and IVF lists — corpus, query
    count, and centroid count all scale by N while per-list size
    stays constant (the IVF contract)."""
    t = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    span = pc.max(t["vec_id"]).as_py() + 1
    parts = []
    for i in range(copies):
        c = t
        if i:
            c = c.set_column(
                c.schema.get_field_index("vec_id"), "vec_id",
                pc.add(c["vec_id"], i * span))
        parts.append(c)
    return _concat_write(parts,
                         os.path.join(dst_dir, "embeddings.parquet"))


TPCH_DIMS = ("customer", "supplier", "part", "nation", "region")


def scale_tpch(src_dir: str, dst_dir: str, copies: int) -> tuple[int, int]:
    """Fact tables (orders + lineitem) replicate with DISJOINT
    o_orderkey bands — copy i shifts o_orderkey AND l_orderkey by the
    same i*span, so each copy's lineitems reference exactly its own
    orders and (o_orderkey) / (l_orderkey, l_linenumber) stay unique.
    Dimension tables copy VERBATIM (the more-transactions growth
    model: the customer/part/supplier catalog stays fixed while facts
    scale Nx) — dims stay broadcast-small, per-customer and per-part
    group cardinality grows Nx, and the join/agg workload scales
    linearly in the fact rows, which is exactly what the sweep
    measures. Dates, prices, statuses replicate structurally."""
    import shutil
    o = pq.read_table(os.path.join(src_dir, "orders.parquet"))
    li = pq.read_table(os.path.join(src_dir, "lineitem.parquet"))
    okey_span = pc.max(o["o_orderkey"]).as_py() + 1
    parts_o, parts_l = [], []
    for i in range(copies):
        co, cl = o, li
        if i:
            co = co.set_column(
                co.schema.get_field_index("o_orderkey"), "o_orderkey",
                pc.add(co["o_orderkey"], i * okey_span))
            cl = cl.set_column(
                cl.schema.get_field_index("l_orderkey"), "l_orderkey",
                pc.add(cl["l_orderkey"], i * okey_span))
        parts_o.append(co)
        parts_l.append(cl)
    n_o = _concat_write(parts_o, os.path.join(dst_dir, "orders.parquet"))
    n_l = _concat_write(parts_l, os.path.join(dst_dir, "lineitem.parquet"))
    for d in TPCH_DIMS:
        shutil.copyfile(os.path.join(src_dir, f"{d}.parquet"),
                        os.path.join(dst_dir, f"{d}.parquet"))
    return n_o, n_l


def main() -> None:
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    ne = scale_events(src, dst, copies)
    nd = scale_documents(src, dst, copies)
    nv = scale_embeddings(src, dst, copies)
    no, nl = scale_tpch(src, dst, copies)
    print(f"wrote {dst}: events={ne} documents={nd} embeddings={nv} "
          f"orders={no} lineitem={nl} (+verbatim dims: "
          f"{', '.join(TPCH_DIMS)}) ({copies}x {src})")


if __name__ == "__main__":
    main()
