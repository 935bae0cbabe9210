"""Spine scaling proof (VERDICT r7 item 4, extended round 8): run the
spine queries at sf0.1 and at derived 10x / 100x directories
(tools/make_scaled_sf.py) and report seconds-per-million-input-rows at
every scale plus a fitted log-log scaling exponent per query. The
claim under test: "linear in corpus bytes, no driver bottleneck" — the
per-row cost should not grow with scale (exponent <= ~1.1; fixed
JVM/session overheads amortize, shuffles stay key-partitioned, nothing
quadratic hides in the plan). Two measured decades make the exponent a
fit, not a single ratio.

Usage: python tools/scale_proof.py [SF01_DIR [SCALE_DIR ...]]
Defaults: /root/testdata/sf0.1, then .scale/sf1 (10x) and .scale/sf10
(100x) when present. Big directories (>= 10M base events) are timed
min-of-RUNS_BIG (default 1; each run is minutes long, so straggler
noise is proportionally small) — smaller ones min-of-2.
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tidb_binlog_spark.cache import release_all
from tidb_binlog_spark.session import get_spark

# query -> the input table whose row count is the scale denominator.
# The five spine queries (VERDICT r7 item 4) plus one representative
# per heavy family: consensus dedup (three bucketed signal graphs +
# iterative CC), IVF ANN (N x queries x constant per-list work — the
# documented contrast with brute-force's N^2), sessionization (the
# per-user window family), SCD2 (interval windows).
SPINE = {
    "cdc_snapshot_apply": "events",
    "cdc_full_pipeline": "events",
    "cdc_kway_merge": "events",
    "cdc_wide_row_apply": "events",
    "dedup_minhash_lsh": "documents",
    "dedup_consensus": "documents",
    "ann_ivf_topk": "embeddings",
    "events_sessionize": "events",
    "cdc_scd2_history": "events",
    # round-8 additions: the composed curation chain, the Arrow
    # kvcodec hot path (the one heavy mapInPandas stage), and the
    # BPE learn+encode pipeline (driver-capped learn + Arrow encode)
    "corpus_full_curation": "documents",
    "cdc_kv_decode": "events",
    "text_bpe_encode": "documents",
}

RUNS_SMALL = 2
RUNS_BIG = int(os.environ.get("SCALE_PROOF_RUNS_BIG", "1"))
BIG_EVENT_ROWS = 10_000_000


def _rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _fit_exponent(points: list[tuple[int, float]]) -> float:
    """Least-squares slope of log(sec) vs log(rows) — the measured
    scaling exponent (1.0 = linear, < 1 = overhead-amortizing)."""
    xs = [math.log(n) for n, _ in points]
    ys = [math.log(s) for _, s in points]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


from tools.common import shuffle_partitions_for as _shuffle_partitions_for


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 1:
        dirs = sys.argv[1:]
    else:
        dirs = ["/root/testdata/sf0.1"]
        for d in ("sf1", "sf10"):
            p = os.path.join(repo, ".scale", d)
            if os.path.exists(os.path.join(p, "events.parquet")):
                dirs.append(p)
    labeled = [(os.path.basename(d.rstrip("/")), d) for d in dirs]

    spark = get_spark("scale_proof")
    qs = entry.queries()

    # warm-up (same convention as bench.py): one non-spine query plus
    # the Arrow worker pool, untimed
    warm = next(n for n in qs if n not in SPINE)
    qs[warm](spark, labeled[0][1]).write.format("noop") \
        .mode("overwrite").save()

    shuffle_parts = {lbl: _shuffle_partitions_for(_rows(d, "events"))
                     for lbl, d in labeled}
    print(f"# shuffle partitions per dir: {shuffle_parts}",
          file=sys.stderr)

    out: dict = {}
    for name, table in SPINE.items():
        row = {}
        points = []
        for label, d in labeled:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(shuffle_parts[label]))
            runs = (RUNS_BIG if _rows(d, "events") >= BIG_EVENT_ROWS
                    else RUNS_SMALL)
            best = None
            for _ in range(runs):
                t0 = time.time()
                qs[name](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.time() - t0
                release_all()
                best = dt if best is None else min(best, dt)
            n = _rows(d, table)
            row[label] = {"sec": round(best, 3), "rows": n,
                          "sec_per_mrow": round(best * 1e6 / n, 3)}
            points.append((n, best))
            print(f"# {name} @{label}: {row[label]['sec']}s "
                  f"({n} {table} rows)", file=sys.stderr)
        first, last = labeled[0][0], labeled[-1][0]
        row["per_row_ratio"] = round(
            row[last]["sec_per_mrow"] / row[first]["sec_per_mrow"], 3)
        if len(points) >= 2:
            row["exponent"] = round(_fit_exponent(points), 3)
        out[name] = row
        print(f"# {name}: per-row ratio {row['per_row_ratio']} "
              f"exponent {row.get('exponent')}", file=sys.stderr)
    print(json.dumps({"metric": "spine_scaling",
                      "scales": [lbl for lbl, _ in labeled],
                      "shuffle_partitions": shuffle_parts,
                      "queries": out}))


if __name__ == "__main__":
    main()
