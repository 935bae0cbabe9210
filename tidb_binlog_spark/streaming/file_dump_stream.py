"""Streaming twin of the pb file-dump sink (the reference's SEGMENTED
streaming file sink).

Reference: drainer/sync/pb.go:38-120 is a *streaming* sink — every
commit binlog is appended to a segmented binlogger
(pkg/binlogfile/binlogger.go:50: ``binlog-NNNN`` segment files,
WriteTail appends CRC-framed records, rotation by size) whose replay
cursor (pb.Pos) is checkpointed after the write, with file-level
retention GC behind it. Until now this repo had only the batch ops
(pbcodec.write_pb_dump / read_pb_dump, payload.gc_file_dump); this
module is the sink's streaming LIFECYCLE:

    readStream(landing zone) -> foreachBatch{
        resume filter -> order gate -> DDL/DML split ->
        write CRC-framed segments (atomic rename) ->
        atomic ts checkpoint }

Exactly-once contract (mirrors the mysql path's downstream-checkpoint
recipe, streaming/pipeline.run_sql_apply_stream):

- segments land via tmp + atomic rename BEFORE the checkpoint file
  advances (write-then-cursor, binlogger WriteTail then pb.Pos);
- the checkpoint file itself is written atomically (tmp + rename)
  and carries a running/normal status flag exactly like the jdbc
  checkpoint's StatusRunning crash detection;
- on restart, ``recover_pb_dump`` deletes any segment whose FIRST
  record ts lies above the checkpoint — such segments can only be
  orphans of a crashed batch (every batch writes strictly above the
  previous checkpoint, so no segment straddles it) — the
  binlogger recover-scan's truncate-past-cursor, binlogfile
  corruption/tail handling (binlogger.go:504-540);
- the foreachBatch resume filter drops rows at or below the
  checkpoint, so a re-delivered micro-batch (same split or re-split
  under a fresh Spark checkpoint dir) re-writes exactly the orphaned
  tail and nothing else.

Source contract: landing segments carry WHOLE transactions (a binlog
is a txn; pump segments never split one across files), so micro-batch
boundaries are txn boundaries and the cursor (max commit-ts written)
is exact. A txn straddling two segments would be half-dropped by the
resume filter — the same contract the reference's Pos cursor assumes
of its segment files.

Retention GC (``gc_pb_dump_segments``) drops whole segments whose
LAST record ts is below the safepoint — the reference's file-level GC
granularity (pump/storage GC deletes data below gcTS; a segment
containing the safepoint is kept whole).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CKPT_FILE = "_ckpt.json"
STATUS_NORMAL = "normal"      # graceful shutdown
STATUS_RUNNING = "running"    # mid-run; on restart => crash recovery


def load_dump_checkpoint(path: str) -> tuple[int, str]:
    """(commit_ts cursor, status). A fresh dir is (-1, normal)."""
    fn = os.path.join(path, CKPT_FILE)
    if not os.path.exists(fn):
        return -1, STATUS_NORMAL
    with open(fn) as f:
        d = json.load(f)
    return int(d["commit_ts"]), d["status"]


def save_dump_checkpoint(path: str, commit_ts: int,
                         status: str = STATUS_RUNNING) -> None:
    """Atomic cursor write (tmp + rename): the dump's pb.Pos analog."""
    fn = os.path.join(path, CKPT_FILE)
    tmp = fn + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"commit_ts": int(commit_ts), "status": status}, f)
    os.replace(tmp, fn)


def _parse_segment_name(fn: str) -> tuple[int, int, int]:
    """binlog-<bucket>-<first>-<last>[<suffix>].pb -> ints.
    Raises on names not written by write_pb_segments."""
    stem = os.path.basename(fn)
    if not stem.startswith("binlog-") or not stem.endswith(".pb"):
        raise ValueError(stem)
    parts = stem[len("binlog-"):-len(".pb")].split("-")
    return int(parts[0]), int(parts[1]), int(parts[2])


def recover_pb_dump(path: str) -> list[str]:
    """Crash recovery: when the last run did not shut down gracefully
    (status=running), delete orphaned segments — any whose first
    record ts is ABOVE the checkpoint cursor. No-op after a graceful
    stop. Returns the removed segment names."""
    os.makedirs(path, exist_ok=True)
    ck, status = load_dump_checkpoint(path)
    removed: list[str] = []
    if status == STATUS_NORMAL:
        return removed
    for fn in sorted(glob.glob(os.path.join(path, "binlog-*.pb"))):
        try:
            _bucket, first, _last = _parse_segment_name(fn)
        except (ValueError, IndexError):
            continue                    # not a streamed segment
        if first > ck:
            os.remove(fn)
            removed.append(os.path.basename(fn))
    return removed


def gc_pb_dump_segments(path: str, safepoint_ts: int) -> list[str]:
    """Retention GC: delete segments ENTIRELY below the safepoint
    (last record ts < safepoint). File-level granularity like the
    reference; a segment containing the safepoint is kept whole.
    Returns the removed segment names."""
    removed: list[str] = []
    if not os.path.isdir(path):
        return removed
    for fn in sorted(glob.glob(os.path.join(path, "binlog-*.pb"))):
        try:
            _bucket, _first, last = _parse_segment_name(fn)
        except (ValueError, IndexError):
            continue
        if last < safepoint_ts:
            os.remove(fn)
            removed.append(os.path.basename(fn))
    return removed


def mark_dump_graceful(path: str) -> None:
    """Graceful-shutdown marker: call after awaitTermination. The
    cursor keeps its value; only the status flips, so the next start
    skips the recovery scan (checkpoint Save(..., consistent=true))."""
    ck, _status = load_dump_checkpoint(path)
    save_dump_checkpoint(path, ck, STATUS_NORMAL)


_CHAOS_DUMP_CALLS = 0


class FileDumpApplier:
    """The foreachBatch body of :func:`run_file_dump_stream`, factored
    out (exactly like pipeline.SqlBatchApplier) so tests and the
    crash-resume path drive batches through IDENTICAL machinery.

    Constructing the applier performs crash recovery (orphan-segment
    truncation) and flips the checkpoint to ``running``; every
    ``apply`` writes one micro-batch's segments then advances the
    cursor; ``mark_graceful`` records a clean stop."""

    def __init__(self, path: str, ordered_gate: bool = True):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.ordered_gate = ordered_gate
        self.recovered = recover_pb_dump(path)
        self.resume_ts, _status = load_dump_checkpoint(path)
        save_dump_checkpoint(path, self.resume_ts, STATUS_RUNNING)

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators import ordering
        from ..sinks import kafka, pbcodec

        batch_df = batch_df.persist()
        try:
            # resume filter: strictly above the cursor — a re-delivered
            # batch (crash between segments and checkpoint) re-writes
            # only what recovery just truncated
            live = batch_df.filter(F.col("commit_ts") > self.resume_ts)
            if self.ordered_gate:
                # TXN-granularity order gate: the dup/disorder unit is
                # the BINLOG (one per commit_ts), not the exploded row
                # — a redelivered txn drops whole, a multi-row txn
                # stays whole (classify_disorder's commit_ts dup
                # partition would keep only row 1 of each txn)
                txns = (live.groupBy("source_id", "commit_ts")
                        .agg(F.min("arrival_seq").alias("arrival_seq")))
                ok_ts = (ordering.classify_disorder(txns)
                         .filter(F.col("order_status") == "ok")
                         .select("source_id", "commit_ts"))
                live = live.join(ok_ts, ["source_id", "commit_ts"],
                                 "left_semi")
            # FAKE heartbeats advance the cursor but are never written
            # (drainer filters fake binlogs before the sinks and uses
            # them only to move the savepoint forward)
            mx = live.agg(F.max("commit_ts").alias("m")).first()["m"]
            if mx is None:
                batch_df.unpersist()
                return
            real = live.filter(F.col("op") != "FAKE")
            dml = real.filter(F.col("op") != "DDL")
            ddl = (real.filter(F.col("op") == "DDL")
                   .select("commit_ts", "db",
                           F.col("row_json").alias("ddl_sql"))
                   if "row_json" in real.columns else None)
            pbcodec.write_pb_segments(
                kafka.with_row_image(dml), self.path,
                suffix=f"-b{batch_id}", ddls=ddl)

            global _CHAOS_DUMP_CALLS
            _CHAOS_DUMP_CALLS += 1
            if os.environ.get("SPARK_GRAFT_DUMP_FAIL_BEFORE_CKPT") \
                    == str(_CHAOS_DUMP_CALLS):
                raise RuntimeError(
                    "chaos: crash between segment write and checkpoint")
            if os.environ.get("SPARK_GRAFT_DUMP_CRASH_BEFORE_CKPT") \
                    == str(_CHAOS_DUMP_CALLS):
                os._exit(137)   # hard driver death for the campaign

            self.resume_ts = int(mx)
            save_dump_checkpoint(self.path, self.resume_ts,
                                 STATUS_RUNNING)
        finally:
            batch_df.unpersist()

    def mark_graceful(self) -> None:
        mark_dump_graceful(self.path)


def run_file_dump_stream(spark: SparkSession, source_dir: str,
                         dump_dir: str, checkpoint_dir: str,
                         available_now: bool = True,
                         max_files_per_trigger: int | None = None,
                         retention_safepoint_ts: int | None = None):
    """The file-archive replication path as one streaming query
    (drainer/sync/pb.go as a Structured Streaming sink). Returns
    (StreamingQuery, FileDumpApplier) — the caller awaits termination
    then calls ``applier.mark_graceful()``; a crashed run recovers on
    the next construction (orphan truncation + resume filter).

    ``retention_safepoint_ts``: when set, retention GC runs after
    each micro-batch (binlogctl-driven gcTS), dropping segments
    wholly below the safepoint."""
    from .pipeline import read_change_stream

    applier = FileDumpApplier(dump_dir)

    def on_batch(df: DataFrame, bid: int) -> None:
        applier.apply(df, bid)
        if retention_safepoint_ts is not None:
            gc_pb_dump_segments(dump_dir, retention_safepoint_ts)

    stream = read_change_stream(spark, source_dir,
                                max_files_per_trigger=max_files_per_trigger)
    writer = (stream.writeStream
              .foreachBatch(on_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), applier
