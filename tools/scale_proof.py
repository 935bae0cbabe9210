"""Spine scaling proof (VERDICT r7 item 4): run the five spine
queries at sf0.1 and at a derived 10x directory (tools/
make_scaled_sf.py) and report seconds-per-million-input-rows at each
scale. The claim under test: "linear in corpus bytes, no driver
bottleneck" — the per-row cost at 10x should stay within ~1.3x of the
sf0.1 per-row cost (fixed JVM/session overheads amortize, shuffles
stay key-partitioned, nothing quadratic hides in the plan).

Usage: python tools/scale_proof.py [SF01_DIR] [SF1_DIR]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
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
}


def _rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale", "sf1")
    spark = get_spark("scale_proof")
    qs = entry.queries()

    # warm-up (same convention as bench.py): one non-spine query plus
    # the Arrow worker pool, untimed
    warm = next(n for n in qs if n not in SPINE)
    qs[warm](spark, sf01).write.format("noop").mode("overwrite").save()

    out: dict = {}
    for name, table in SPINE.items():
        row = {}
        for label, d in (("sf0.1", sf01), ("sf1", sf1)):
            best = None
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.time() - t0
                release_all()
                best = dt if best is None else min(best, dt)
            n = _rows(d, table)
            row[label] = {"sec": round(best, 3), "rows": n,
                          "sec_per_mrow": round(best * 1e6 / n, 3)}
        row["per_row_ratio"] = round(
            row["sf1"]["sec_per_mrow"] / row["sf0.1"]["sec_per_mrow"], 3)
        out[name] = row
        print(f"# {name}: {row['sf0.1']['sec']}s @sf0.1 -> "
              f"{row['sf1']['sec']}s @10x  per-row ratio "
              f"{row['per_row_ratio']}", file=sys.stderr)
    print(json.dumps({"metric": "spine_scaling", "queries": out}))


if __name__ == "__main__":
    main()
