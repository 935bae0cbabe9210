"""Kill-and-resume campaign for the 100M-event SQL-apply stream
(VERDICT r11 item 2): crash recovery was proven only at fixture scale
(test_sql_apply_stream_chaos_crash_ddl_uk_relay) and the r11 1000x
campaign showed threshold-gated defects are real. This harness
hard-kills (os._exit(137), the SIGKILL analog that skips every
finally/atexit) the streaming DRIVER at two points and proves the
resumed state equals the batch recompute:

  phase 1  BETWEEN micro-batches — SPARK_GRAFT_CRASH_BEFORE_WAL: the
           previous batch is fully committed (rows + downstream
           checkpoint, sinks/jdbc.CKPT_TABLE), the next one touched
           nothing, not even the relay WAL;
  phase 2  INSIDE a micro-batch — SPARK_GRAFT_CRASH_AFTER_WAL: the
           batch is in the relay WAL but nothing is applied and no
           checkpoint moved (the drainer's crash-with-WAL window,
           drainer/relay.go); phase 2's own start first REPLAYS
           phase 1's lost window from the relay feed
           (feed_sql_by_relay_if_needed, relay.go feedByRelayLogIfNeed);
  phase 3  clean restart -> runs to completion, graceful
           mark_consistent.

Every restart uses a FRESH Spark checkpoint dir: recovery must come
from the DOWNSTREAM checkpoint table + relay feed alone (reference
semantics: drainer/checkpoint/mysql.go:100-165 + drainer/relay.go),
never from Spark's offset log. Safe mode runs CONFIGURED
(drainer.toml safe-mode = true) like every sf100 stream run since
r11 — the derived stream carries ~15% redelivery-shaped traffic, so
the idempotent rewrite is required in steady state; the auto-window
branch (status=crash -> 5-min window) is therefore bypassed by
config, and each phase records the status byte it found instead.

Usage: python tools/stream_kill_resume.py [SF_DIR] [N_SEGMENTS]
(default .scale/sf10 = 10M events for a rehearsal; the campaign run
is .scale/sf100). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_COLS = ["arrival_seq", "source_id", "commit_ts", "start_ts",
               "op", "db", "tbl", "pk", "seq", "schema_version",
               "val", "row_json"]


def _child(work: str, phase: int) -> int:
    """one stream attempt in THIS process (invoked as a subprocess so
    the kill hooks can take the whole driver down)."""
    from pyspark.sql import functions as F

    from tidb_binlog_spark.operators import safe_mode as sm
    from tidb_binlog_spark.session import get_spark
    from tidb_binlog_spark.sinks.relay import RelayLog
    from tidb_binlog_spark.streaming import pipeline
    from tools.common import shuffle_partitions_for

    with open(os.path.join(work, "meta.json")) as fh:
        meta = json.load(fh)
    spark = get_spark(f"kill_resume_p{phase}",
                      extra_conf={
                          "spark.cleaner.periodicGC.interval": "45s"})
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(shuffle_partitions_for(meta["n_events"])))
    setup = tuple(
        f"CREATE TABLE IF NOT EXISTS `{t}` "
        f"(pk INTEGER PRIMARY KEY, val REAL)" for t in meta["tables"])
    q = pipeline.run_sql_apply_stream(
        spark, os.path.join(work, "src"), os.path.join(work, "db"),
        os.path.join(work, f"ck_{phase}"),
        num_workers=4, setup_sql=setup,
        safe_window=sm.SafeModeWindow(configured=True),
        relay_dir=os.path.join(work, "relay"),
        max_files_per_trigger=meta["files_per_segment"])
    q.awaitTermination(7200)
    RelayLog(os.path.join(work, "relay")).mark_consistent()
    return 0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1].startswith("--child"):
        sys.exit(_child(sys.argv[2], int(sys.argv[3])))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".scale", "sf10")
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from tidb_binlog_spark.operators import ordering
    from tidb_binlog_spark.operators.compaction import apply_snapshot
    from tidb_binlog_spark.session import get_spark
    from tidb_binlog_spark.sinks import jdbc
    from tidb_binlog_spark.sources.changestream import change_stream

    spark = get_spark("kill_resume_parent")
    work = tempfile.mkdtemp(prefix="kill_resume_")
    out: dict = {"metric": "stream_kill_resume", "sf_dir": sf_dir,
                 "n_segments": n_segments}
    try:
        # -- land segments (same shape as tools/stream_scale_check).
        # row_json is blanked: with no sink catalog wired the apply
        # path never reads it, and carrying the full image through
        # landing + relay WAL at 100M events costs ~25 GB of the
        # 58 GB free disk this campaign has to live in.
        ch = (change_stream(spark, sf_dir)
              .withColumn("tbl", F.concat_ws("_", "db", "tbl"))
              .withColumn("row_json", F.lit("{}"))
              .select(*STREAM_COLS)).persist()
        n = ch.count()
        tables = sorted(r["tbl"] for r in
                        ch.select("tbl").distinct().collect())
        hi = ch.agg(F.max("arrival_seq")).first()[0] + 1
        src = os.path.join(work, "src")
        os.makedirs(src)
        cut = hi // n_segments + 1
        files_per_segment = 4
        for i in range(n_segments):
            # repartition, not coalesce: a single-partition source
            # (small sf dirs) would otherwise land 1 file/segment and
            # halve the micro-batch count under maxFilesPerTrigger
            (ch.filter((F.col("arrival_seq") >= i * cut)
                       & (F.col("arrival_seq") < (i + 1) * cut))
             .repartition(files_per_segment)
             .write.mode("append").parquet(src))
        out["n_events"] = int(n)
        ch.unpersist()

        with open(os.path.join(work, "meta.json"), "w") as fh:
            json.dump({"n_events": int(n), "tables": tables,
                       "files_per_segment": files_per_segment}, fh)

        def run_phase(phase: int, env_extra: dict) -> dict:
            env = dict(os.environ)
            env["SPARK_DRIVER_MEM"] = os.environ.get(
                "SPARK_DRIVER_MEM", "24g")
            env.update(env_extra)
            t0 = time.time()
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__),
                 "--child", work, str(phase)], env=env,
                cwd=repo)
            ck, status = jdbc.load_checkpoint(os.path.join(work, "db"))
            return {"rc": rc, "sec": round(time.time() - t0, 2),
                    "checkpoint_ts": int(ck), "status": status}

        # profile mode (VERDICT r11 item 5): ONE clean run with the
        # per-batch phase instrumentation, over this harness's proven
        # 100M landing (the stream_scale_check landing OOM'd a
        # 24-32g heap three ways on this host); state equality is
        # skipped here — the kill campaign proved it on identical
        # machinery the same day.
        prof = os.environ.get("KILL_RESUME_PROFILE")
        if prof:
            out["profile_jsonl"] = prof
            out["phase_profile"] = run_phase(
                1, {"SPARK_GRAFT_APPLY_PROFILE": prof})
            out["events_per_s_profile_mode"] = round(
                n / max(out["phase_profile"]["sec"], 1e-6))
            print(json.dumps(out))
            return
        # kill thresholds are apply()-call indices: phase 1 dies
        # entering its (~30%)th batch with the previous ones fully
        # committed; phase 2 replays the relay window (call #1) then
        # dies after the WAL write of a later batch.
        k1 = max(2, n_segments * 3 // 10)
        k2 = max(3, n_segments * 4 // 10)
        out["kill_batch_indices"] = {"phase1": k1, "phase2": k2}
        out["phase1_kill_between"] = run_phase(
            1, {"SPARK_GRAFT_CRASH_BEFORE_WAL": str(k1)})
        out["phase2_kill_after_wal"] = run_phase(
            2, {"SPARK_GRAFT_CRASH_AFTER_WAL": str(k2)})
        out["phase3_clean"] = run_phase(3, {})
        out["kills_effective"] = (
            out["phase1_kill_between"]["rc"] == 137
            and out["phase2_kill_after_wal"]["rc"] == 137
            and out["phase3_clean"]["rc"] == 0)

        # -- equality: resumed downstream state == batch recompute
        got = None
        for t in tables:
            part = jdbc.read_applied(spark, os.path.join(work, "db"),
                                     f"`{t}`", ["pk", "val"]) \
                .withColumn("tbl", F.lit(t))
            got = part if got is None else got.unionByName(part)
        ch2 = (change_stream(spark, sf_dir)
               .withColumn("tbl", F.concat_ws("_", "db", "tbl"))
               .select(*STREAM_COLS))
        want = (apply_snapshot(ordering.ordered_stream(ch2))
                .select("tbl", "pk", "val"))
        cols = sorted(want.columns)
        a, b = got.select(*cols), want.select(*cols)
        out["state_match"] = (a.exceptAll(b).isEmpty()
                              and b.exceptAll(a).isEmpty())
        out["final_checkpoint_ts"] = out["phase3_clean"]["checkpoint_ts"]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    if not (out.get("state_match") and out.get("kills_effective")):
        raise SystemExit("kill-resume FAILED: " + json.dumps(out))


if __name__ == "__main__":
    main()
