"""Randomized replication equivalence — the dailytest analog
(SURVEY §5): seeded random op workloads over PK'd tables, replayed by
the engine, compared against a straightforward driver-side simulation
(our stand-in for sync_diff_inspector against a real MySQL).
"""

from __future__ import annotations

import random

from tests.conftest import make_changes
from tidb_binlog_spark.operators import compaction, ordering
from tidb_binlog_spark.plans.pipeline import ReplicationConfig, build_pipeline


def _random_workload(seed: int, n_ops: int = 300, n_pks: int = 20):
    rng = random.Random(seed)
    rows, cts = [], 0
    for i in range(n_ops):
        cts += rng.randint(1, 5)
        op = rng.choice(["I", "U", "U", "D"])   # update-heavy like dailytest
        pk = rng.randrange(n_pks)
        rows.append((i, f"s{i % 3}", cts, op, pk, 0, round(rng.uniform(0, 100), 2)))
    return rows


def _simulate(rows):
    """Reference semantics in 20 lines: last-writer-wins per pk, D
    removes. (Ops arrive in ascending commit_ts here by construction.)"""
    state = {}
    for _, _, cts, op, pk, _, val in sorted(rows, key=lambda r: r[2]):
        if op == "D":
            state.pop(pk, None)
        else:
            state[pk] = val
    return state


def test_random_replay_matches_simulation(spark):
    for seed in range(3):
        rows = _random_workload(seed)
        ch = make_changes(spark, rows)
        snap = compaction.apply_snapshot(ordering.ordered_stream(ch))
        got = {r["pk"]: r["val"] for r in snap.collect()}
        assert got == _simulate(rows), f"seed {seed}"


def test_random_replay_through_full_pipeline(spark):
    rows = _random_workload(99)
    ch = make_changes(spark, rows)
    out = build_pipeline(ch, ReplicationConfig(compact=True))
    got = {r["pk"]: r["val"] for r in out.filter("op <> 'D'").collect()}
    assert got == _simulate(rows)


def test_merged_op_rules_randomized(spark):
    """merged_op against a direct implementation of the merge.go rule
    table, over random per-PK op sequences."""
    rng = random.Random(7)
    rows, cts = [], 0
    for i in range(200):
        cts += 1
        rows.append((i, "s0", cts, rng.choice(["I", "U", "D"]), rng.randrange(8)))
    ch = make_changes(spark, rows)
    got = {r["pk"]: r["merged_op"]
           for r in compaction.merged_op(ordering.ordered_stream(ch)).collect()}

    seqs: dict[int, list[str]] = {}
    for _, _, cts_, op, pk in sorted(rows, key=lambda r: r[2]):
        seqs.setdefault(pk, []).append(op)
    for pk, seq in seqs.items():
        last_d = max((i for i, o in enumerate(seq) if o == "D"), default=None)
        last_i = max((i for i, o in enumerate(seq) if o == "I"), default=None)
        if seq[-1] == "D":
            want = "D"
        elif last_i is not None and (last_d is None or last_i > last_d):
            want = "I"
        else:
            want = "U"
        assert got[pk] == want, f"pk {pk}: {seq} -> {got[pk]} != {want}"


def test_compact_wide_stitching_randomized(spark):
    """compact_wide's whole-map stitch rules (merge.go:69-127 over
    Values/OldValues) against a direct simulation: final image = last
    event's values; old image = first update's old_values AFTER the
    last delete, reported only when the merged op is U."""
    rng = random.Random(23)
    rows, cts = [], 0
    for i in range(300):
        cts += 1
        op = rng.choice(["I", "U", "U", "D"])
        pk = rng.randrange(10)
        vals = {"pk": str(pk), "val": str(round(rng.uniform(0, 9), 1)),
                "k": rng.choice(["a", "b", "c"])}
        old = ({"pk": str(pk), "val": str(round(rng.uniform(0, 9), 1)),
                "k": rng.choice(["x", "y"])} if op == "U" else None)
        rows.append(("d", "t", pk, op, cts, 0, i, vals, old))
    ch = spark.createDataFrame(
        rows, "db string, tbl string, pk long, op string, commit_ts long, "
              "seq int, arrival_seq long, values map<string,string>, "
              "old_values map<string,string>")
    from tidb_binlog_spark.operators import compaction as comp
    out = comp.compact_wide(ch)
    got = {}
    for r in out.collect():
        got.setdefault(int(r["pk"]), {})[r["col"]] = (
            r["merged_op"], r["final_val"], r["first_old_val"])

    # simulation
    seqs: dict[int, list] = {}
    for _, _, _, op, cts_, _, _, vals, old in sorted(rows, key=lambda r: r[4]):
        seqs.setdefault(int(vals["pk"]), []).append((op, vals, old))
    for pk, seq in seqs.items():
        ops = [o for o, _, _ in seq]
        last_d = max((i for i, o in enumerate(ops) if o == "D"), default=None)
        last_i = max((i for i, o in enumerate(ops) if o == "I"), default=None)
        if ops[-1] == "D":
            want_op = "D"
        elif last_i is not None and (last_d is None or last_i > last_d):
            want_op = "I"
        else:
            want_op = "U"
        final = seq[-1][1]
        first_old = None
        if want_op == "U":
            for i, (o, _, old) in enumerate(seq):
                if o == "U" and (last_d is None or i > last_d):
                    first_old = old
                    break
        for col in ("pk", "val", "k"):
            want = (want_op, final.get(col),
                    first_old.get(col) if first_old else None)
            assert got[pk][col] == want, f"pk {pk} col {col}"


def test_random_bloom_membership_never_false_negative(spark):
    """Randomized corpora (overlapping seen/new, duplicates inside
    both, tiny filters to force false positives): a seen doc is ALWAYS
    bloom-positive, and admission (NOT seen_exact) always equals the
    plain hash anti-join — the contract that makes the pre-filter safe
    to deploy at any m/k sizing."""
    from tidb_binlog_spark.functions.dedup import bloom_membership

    def docs(texts, start=0):
        return spark.createDataFrame(
            [(start + i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    for seed in range(3):
        rng = random.Random(1000 + seed)
        vocab = [f"w{j}" for j in range(30)]
        mk = lambda: " ".join(rng.choice(vocab)  # noqa: E731
                              for _ in range(rng.randint(1, 8)))
        seen_texts = [mk() for _ in range(60)]
        new_texts = ([rng.choice(seen_texts) for _ in range(20)]
                     + [mk() for _ in range(40)])
        seen, new = docs(seen_texts), docs(new_texts, start=1000)
        out = bloom_membership(new, seen, m_bits=128,
                               k_hashes=3).collect()
        seen_set = set(seen_texts)
        for r in out:
            t = new_texts[r["doc_id"] - 1000]
            if t in seen_set:
                assert r["maybe_seen"] and r["seen_exact"], \
                    f"seed {seed}: false negative on doc {r['doc_id']}"
            assert r["seen_exact"] == (t in seen_set)
            assert r["false_positive"] == (
                r["maybe_seen"] and not r["seen_exact"])
