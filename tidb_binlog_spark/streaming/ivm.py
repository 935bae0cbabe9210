"""Streaming incremental view maintenance: group aggregates kept
exactly up to date across micro-batches, without ever materializing
or re-scanning the replicated table.

This composes the batch pieces into the foreachBatch shape:

- ``operators/ordering`` semantics across batches: the stored
  per-source max commit_ts cursor is injected as one pseudo-row per
  source (arrival_seq = -1) so ``classify_disorder``'s prefix max
  continues seamlessly from earlier batches — a late row that would
  have been quarantined by the whole-history gate is quarantined here
  too. (Cross-batch duplicate commit_ts needs no extra state for a
  binlog-shaped stream: a repeated ts is <= the per-source prefix max
  by definition of "already seen from this source", so the disorder
  gate drops it; production sources with cross-SOURCE ts collisions
  bound the residual risk with dropDuplicatesWithinWatermark.)

- ``operators/incremental_agg`` liveness across batches: the PK state
  (a SnapshotTable, tombstones included) is seeded into
  ``coherent_changelog`` as arrival_seq = -1 rows — a live row seeds
  op 'I', a tombstone seeds op 'D' — so the first change of a PK in
  this batch sees its true prior version through the same lag window
  the batch operator uses. Seeds are dropped from the output.

- aggregate state stays DECIMAL(38,6): per-batch partials merge by
  decimal addition (associative), so any batch split yields the exact
  whole-history answer. State writes are versioned directories with
  an atomically-renamed JSON checkpoint (the SnapshotTable recipe) —
  idempotent re-apply after a crash is guaranteed by Spark's
  streaming checkpoint replaying the same batch into the same
  version-advance.

Scale: per batch the work is O(batch) — one PK-state join keyed on
the PK (co-located for free when the state table is stored bucketed,
sinks/bucketed.py) and one group-keyed partial aggregate; the
aggregate state itself is #groups rows, never #rows.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import compaction, ordering
from ..operators.incremental_agg import (coherent_changelog,
                                         maintain_group_aggregates)
from ..sinks.table_sink import SnapshotTable


class MaterializedAggregate:
    """Exactly-maintained COUNT/SUM per group over a CDC stream."""

    def __init__(self, spark: SparkSession, root: str,
                 group_keys: tuple[str, ...] = ("db", "tbl"),
                 pk_keys: tuple[str, ...] = ("db", "tbl", "pk")):
        self.spark = spark
        self.root = root
        self.group_keys = list(group_keys)
        self.pk_keys = list(pk_keys)
        self.pk_state = SnapshotTable(spark, os.path.join(root, "pkstate"),
                                      key_cols=tuple(pk_keys))

    # -- agg-state checkpoint ----------------------------------------------
    def _ckpt_path(self) -> str:
        return os.path.join(self.root, "agg_checkpoint.json")

    def _checkpoint(self) -> dict:
        if not os.path.exists(self._ckpt_path()):
            return {"version": 0, "source_max": {}}
        with open(self._ckpt_path()) as f:
            return json.load(f)

    def _save_checkpoint(self, version: int, source_max: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "source_max": source_max}, f)
        os.replace(tmp, self._ckpt_path())

    def _read_agg(self) -> DataFrame | None:
        ck = self._checkpoint()
        if ck["version"] == 0:
            return None
        return self.spark.read.parquet(
            os.path.join(self.root, f"agg_v{ck['version']}"))

    def read(self) -> DataFrame | None:
        """The maintained view: (group_keys..., n_rows, sum_val);
        empty groups omitted — identical to aggregating the applied
        snapshot."""
        agg = self._read_agg()
        if agg is None:
            return None
        return (agg.filter(F.col("n_rows") > 0)
                   .withColumn("sum_val", F.col("sum_dec").cast("double"))
                   .drop("sum_dec"))

    # -- one micro-batch ----------------------------------------------------
    def apply_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        ck = self._checkpoint()
        batch_df = batch_df.persist()
        try:
            ok = self._gate(batch_df, ck["source_max"]).persist()
            cl = self._changelog(ok)
            partial = maintain_group_aggregates(
                cl, self.group_keys, drop_empty=False, as_decimal=True)
            prior = self._read_agg()
            merged = (partial if prior is None
                      else prior.unionByName(partial)
                      .groupBy(*self.group_keys)
                      .agg(F.sum("sum_dec").cast("decimal(38,6)")
                            .alias("sum_dec"),
                           F.sum("n_rows").cast("long").alias("n_rows")))
            new_version = ck["version"] + 1
            out = os.path.join(self.root, f"agg_v{new_version}")
            merged.write.mode("overwrite").parquet(out)

            # PK liveness state advances with the same gated batch
            self.pk_state.apply_batch(compaction.compact_last_image(ok))

            # per-source cursors advance to max(stored, batch max)
            smax = dict(ck["source_max"])
            for r in (batch_df.groupBy("source_id")
                      .agg(F.max("commit_ts").alias("m")).collect()):
                old = smax.get(r["source_id"])
                smax[r["source_id"]] = int(r["m"]) if old is None \
                    else max(int(old), int(r["m"]))
            self._save_checkpoint(new_version, smax)
            for v in range(1, new_version - 1):
                stale = os.path.join(self.root, f"agg_v{v}")
                if os.path.exists(stale):
                    shutil.rmtree(stale)
            ok.unpersist()
        finally:
            batch_df.unpersist()

    def _gate(self, batch_df: DataFrame, source_max: dict) -> DataFrame:
        """ordered_stream with the per-source cursor carried in as
        arrival_seq = -1 pseudo-rows (they extend the prefix max and
        are dropped from the output)."""
        if not source_max:
            return ordering.ordered_stream(batch_df)
        seed = (self.spark.createDataFrame(
                    [(s, int(m)) for s, m in source_max.items()],
                    "source_id string, commit_ts long")
                .withColumn("arrival_seq", F.lit(-1).cast("long")))
        seeded = batch_df.unionByName(seed, allowMissingColumns=True)
        return (ordering.ordered_stream(seeded)
                .filter(F.col("arrival_seq") >= 0))

    def _changelog(self, ok: DataFrame) -> DataFrame:
        """coherent_changelog with PK liveness seeded from state:
        live rows seed op 'I', tombstones seed op 'D', both at
        arrival_seq = -1 so they only feed the lag window."""
        state = self.pk_state._read_full()
        if state is None:
            return coherent_changelog(ok)
        seed = (state.select(
                    *self.pk_keys,
                    F.col("val"),
                    F.when(F.col("op") == "D", F.lit("D"))
                     .otherwise(F.lit("I")).alias("op"))
                .withColumn("commit_ts", F.lit(-1).cast("long"))
                .withColumn("seq", F.lit(-1).cast("int"))
                .withColumn("arrival_seq", F.lit(-1).cast("long")))
        seeded = ok.unionByName(seed, allowMissingColumns=True)
        return (coherent_changelog(seeded)
                .filter(F.col("arrival_seq") >= 0))


def run_ivm_stream(spark: SparkSession, source_dir: str, state_root: str,
                   checkpoint_dir: str, available_now: bool = True,
                   max_files_per_trigger: int | None = None,
                   group_keys: tuple[str, ...] = ("db", "tbl")):
    """The maintained aggregate as one streaming query over a change
    landing zone. Returns the StreamingQuery; read the result with
    ``MaterializedAggregate(spark, state_root).read()`` afterwards."""
    from .pipeline import read_change_stream
    view = MaterializedAggregate(spark, state_root, group_keys=group_keys)
    stream = read_change_stream(spark, source_dir,
                                max_files_per_trigger=max_files_per_trigger)
    writer = (stream.writeStream
              .foreachBatch(view.apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
