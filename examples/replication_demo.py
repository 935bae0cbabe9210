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
