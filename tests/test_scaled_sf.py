"""Contracts of the scaled-dataset builder (tools/make_scaled_sf.py):
the scaling PROOF is only meaningful if the derived dataset scales the
WORKLOAD linearly — disjoint keyspaces (not hotter keys), disjoint
shingle spaces (not quadratic cross-copy near-dups), schema and types
preserved exactly. Pure pyarrow, no Spark session needed."""

from __future__ import annotations

import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SRC = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SRC),
    reason=f"fixture dir {SRC} not present on this machine")


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    import make_scaled_sf as m
    dst = str(tmp_path_factory.mktemp("scaled"))
    m.scale_events(SRC, dst, 3)
    m.scale_documents(SRC, dst, 3)
    m.scale_embeddings(SRC, dst, 3)
    return dst


def test_events_scale_rows_keys_and_schema(scaled):
    src = pq.read_table(os.path.join(SRC, "events.parquet"))
    out = pq.read_table(os.path.join(scaled, "events.parquet"))
    assert out.num_rows == 3 * src.num_rows
    assert out.schema == src.schema           # TIMESTAMP(NANOS) intact
    # disjoint id spans: every copy contributes its own event_id range
    n_ids = len(pc.unique(out["event_id"]))
    assert n_ids == 3 * len(pc.unique(src["event_id"]))
    # distinct PKs scale too (more keys, not hotter keys)
    assert len(pc.unique(out["user_id"])) == \
        3 * len(pc.unique(src["user_id"]))
    # commit-ts bands strictly disjoint under the change-stream rules:
    # min possible ts in band i (id*10 - 500 for an early %97 id)
    # must exceed band i-1's max possible ts (its top id * 10)
    span = pc.max(src["event_id"]).as_py() + 1 + 50
    ids = out["event_id"].to_pylist()
    for i in (1, 2):
        band_ids = [e for e in ids if i * span <= e < (i + 1) * span]
        lo = min(band_ids)
        assert lo * 10 - 500 > ((i - 1) * span + pc.max(
            src["event_id"]).as_py()) * 10


def test_documents_disjoint_shingle_spaces(scaled):
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    out = pq.read_table(os.path.join(scaled, "documents.parquet"))
    assert out.num_rows == 3 * src.num_rows
    assert out.schema == src.schema
    texts = out["text"].to_pylist()
    n = src.num_rows
    # EVERY copy's tokens carry the c{i}_ prefix (copy 0 included, so
    # natural c<digit>_ source tokens cannot collide across copies);
    # no token (hence no shingle) is shared between any two copies
    for i in (0, 1, 2):
        toks = texts[i * n].split()
        assert all(t.startswith(f"c{i}_") for t in toks)
    t0 = set(texts[0].split())
    t1 = set(texts[n].split())
    t2 = set(texts[2 * n].split())
    assert not (t0 & t1) and not (t0 & t2) and not (t1 & t2)
    # within-copy structure is preserved: copy i's token stream is the
    # source stream with a constant per-copy prefix
    assert [t[3:] for t in texts[n].split()] == \
        src["text"].to_pylist()[0].split()


def test_embeddings_verbatim_with_shifted_ids(scaled):
    src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    out = pq.read_table(os.path.join(scaled, "embeddings.parquet"))
    assert out.num_rows == 3 * src.num_rows
    assert out.schema == src.schema
    n = src.num_rows
    span = pc.max(src["vec_id"]).as_py() + 1
    ids = out["vec_id"].to_pylist()
    assert ids[:n] == src["vec_id"].to_pylist()
    assert ids[n:2 * n] == [v + span for v in src["vec_id"].to_pylist()]
    # vectors replicate verbatim (IVF lists stay constant-size)
    assert out["embedding"].to_pylist()[n:2 * n] == \
        src["embedding"].to_pylist()


@pytest.fixture(scope="module")
def scaled_tpch(tmp_path_factory):
    import make_scaled_sf as m
    dst = str(tmp_path_factory.mktemp("scaled_tpch"))
    m.scale_tpch(SRC, dst, 3)
    return dst


def test_tpch_facts_disjoint_bands_dims_verbatim(scaled_tpch):
    so = pq.read_table(os.path.join(SRC, "orders.parquet"))
    sl = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    oo = pq.read_table(os.path.join(scaled_tpch, "orders.parquet"))
    ol = pq.read_table(os.path.join(scaled_tpch, "lineitem.parquet"))
    assert oo.num_rows == 3 * so.num_rows
    assert ol.num_rows == 3 * sl.num_rows
    assert oo.schema == so.schema and ol.schema == sl.schema
    # o_orderkey stays unique (disjoint bands)
    assert len(pc.unique(oo["o_orderkey"])) == oo.num_rows
    # referential integrity: every copy's lineitems reference exactly
    # its own orders — the joined key sets are identical
    okeys = set(oo["o_orderkey"].to_pylist())
    assert set(ol["l_orderkey"].to_pylist()) <= okeys
    # per-copy shift is the SAME span on both tables
    span = pc.max(so["o_orderkey"]).as_py() + 1
    assert sorted(set(ol["l_orderkey"].to_pylist()))[0] == \
        sorted(set(sl["l_orderkey"].to_pylist()))[0]
    n = sl.num_rows
    assert ol["l_orderkey"].to_pylist()[n:2 * n] == \
        [k + span for k in sl["l_orderkey"].to_pylist()]
    # dims copied verbatim
    for d in ("customer", "nation"):
        a = pq.read_table(os.path.join(SRC, f"{d}.parquet"))
        b = pq.read_table(os.path.join(scaled_tpch, f"{d}.parquet"))
        assert a.equals(b)
