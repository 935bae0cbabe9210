"""Safe-mode rewrite + PK-changing-update split.

Reference:
- safe mode rewrites INSERT -> REPLACE and UPDATE -> DELETE(old) +
  REPLACE(new) so re-applying a batch after restart is idempotent
  (pkg/loader/executor.go:407-443; auto-on for the first 5 minutes,
  drainer/syncer.go:180-197);
- an UPDATE that changes the primary key is always split into
  DELETE(old key) + INSERT(new key) before compaction
  (pkg/loader/merge.go:47-67).

Spark-first: both are projections/unions — the split is a union of two
narrow selects (no shuffle); ordering is preserved by (commit_ts, seq,
sub_seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SafeModeWindow:
    """Auto safe-mode window after (re)start — drainer/syncer.go:180-197
    forces safe mode ON for the first 5 minutes after the drainer
    starts (covering re-application of possibly-already-applied events
    after a crash), then reverts to the configured flag
    (arbiter/server.go:34 does the same for the Kafka applier).

    ``active()`` is evaluated per micro-batch by the apply stream; the
    clock is injectable so tests can step time deterministically.
    """

    def __init__(self, duration_s: float = 300.0, configured: bool = False,
                 clock=None):
        import time as _time
        self._clock = clock if clock is not None else _time.monotonic
        self.duration_s = duration_s
        self.configured = configured
        self._start = self._clock()

    def active(self) -> bool:
        return self.configured or \
            (self._clock() - self._start) < self.duration_s


def split_pk_change(changes: DataFrame,
                    old_pk_col: str = "old_pk") -> DataFrame:
    """Split U rows whose PK changed into D(old_pk) + I(new pk).

    Input rows carry ``pk`` (new) and ``old_pk`` (non-null only when the
    update moved the key). Emits ``sub_seq`` (0 = delete half, 1 =
    insert half) to keep intra-statement order under later sorts.
    """
    moved = F.col(old_pk_col).isNotNull() & (F.col(old_pk_col) != F.col("pk"))

    untouched = changes.filter(~moved).withColumn("sub_seq", F.lit(0))
    delete_half = (changes.filter(moved)
                   .withColumn("pk", F.col(old_pk_col))
                   .withColumn("op", F.lit("D"))
                   .withColumn("sub_seq", F.lit(0)))
    insert_half = (changes.filter(moved)
                   .withColumn("op", F.lit("I"))
                   .withColumn("sub_seq", F.lit(1)))
    return untouched.unionByName(delete_half).unionByName(insert_half)


def safe_mode_rewrite(changes: DataFrame) -> DataFrame:
    """Rewrite ops for idempotent re-apply: I -> R(eplace); U -> D + R.

    Returned stream is directly applicable by a dumb sink in order:
    REPLACE upserts, DELETE removes — replaying the same batch twice
    converges to the same table state.
    """
    inserts = (changes.filter(F.col("op") == "I")
               .withColumn("op", F.lit("R"))
               .withColumn("sub_seq", F.lit(0)))
    deletes = (changes.filter(F.col("op") == "D")
               .withColumn("sub_seq", F.lit(0)))
    upd = changes.filter(F.col("op") == "U")
    upd_delete = upd.withColumn("op", F.lit("D")).withColumn("sub_seq", F.lit(0))
    upd_replace = upd.withColumn("op", F.lit("R")).withColumn("sub_seq", F.lit(1))
    return (inserts.unionByName(deletes)
            .unionByName(upd_delete).unionByName(upd_replace))
