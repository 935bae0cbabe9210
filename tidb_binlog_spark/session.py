"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the same configs are what we would set
on a real cluster (AQE on, sensible shuffle partitioning, Arrow on for
the few Pandas-UDF paths). Nothing here is local-mode-only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "tidb_binlog_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE is on so skewed causality groups / merge keys get re-planned at
    runtime; shuffle partitions default to the core count for local
    runs (a cluster deployment would size this to 2-3x total cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing for the mapInPandas hot paths (kvcodec
        # decode/encode, pb assembly): measured on cdc_kv_decode at
        # 10M rows — 10k (Spark default) 19.5s, 65536 16.5s, 262144
        # 18.5s. 64k batches amortize the per-batch Python overhead
        # (pandas frame construction + Arrow IPC framing) without
        # blowing the per-batch pandas working set; this is what kept
        # the third-decade sec/Mrow from creeping up (SCALE_PROOF_3D).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Register the driver's parquet tables as temp views; return dict of DFs.

    Contract: the driver parquet's TIMESTAMP(NANOS) columns ALWAYS
    surface as BIGINT epoch-nanoseconds, whatever Spark does natively:

    - Spark <= 4.0 honors ``spark.sql.legacy.parquet.nanosAsLong`` and
      reads them as BIGINT nanos directly.
    - Spark 4.1+ removed that conf and reads TIMESTAMP(NANOS) as
      TIMESTAMP_NTZ truncated to microseconds; ``_ts_ntz_to_nanos``
      converts that back to epoch nanos (micros * 1000).

    The driver fixtures are micro-aligned (verified: DuckDB
    ``epoch_ns(ts) % 1000 == 0`` for every row), so both paths produce
    identical nanos and agree with the DuckDB oracles' ``epoch_ns``.
    Use ``ts_nanos_to_timestamp`` when timestamp semantics are needed.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # removed in Spark 4.1+: the NTZ branch below covers it
    # timestamp->string rendering must be TZ-stable for checksum parity
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    tables = names or ("region", "nation", "customer", "supplier", "part",
                       "orders", "lineitem", "events", "documents", "embeddings")
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            key = (session_key(spark), path)
            df = _TABLE_MEMO.get(key)
            if df is None:
                # re-reading the same immutable fixture parquet re-does
                # schema inference per query; the plan (not data) is
                # memoized per (session, path).
                df = _ts_ntz_to_nanos(spark.read.parquet(path))
                _TABLE_MEMO[key] = df
            # always (re-)register: a different sf_dir may have claimed
            # the view name since the plan was first memoized.
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def session_key(spark: SparkSession) -> str:
    """Stable identity for plan memos: the Spark applicationId — unlike
    id(spark), it cannot collide when a stopped session's object
    address is reused by a new one."""
    return spark.sparkContext.applicationId


# (application id, parquet path) -> DataFrame plan. Never holds data;
# safe because fixture tables are immutable within a run.
_TABLE_MEMO: dict = {}


def _ts_ntz_to_nanos(df):
    """Spark 4.1+ surfaces parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ
    (micro precision). Re-establish the engine's BIGINT-nanos contract
    for the event-time column ``ts`` (the only column queries consume
    as epoch nanos — other temporal columns like o_orderdate keep their
    native surface): NTZ -> session-tz timestamp (session tz is pinned
    UTC, so this is the epoch instant) -> unix micros -> nanos.
    Column-level projection only — no shuffle, fully codegen'd,
    pushdown-transparent."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(
                f.name, F.unix_micros(F.col(f.name).cast("timestamp")) * 1000)
    return df


def ts_nanos_to_timestamp(col):
    """BIGINT nanoseconds (see load_tables) -> TimestampType (micros).
    Integer division — float /1000 loses nanosecond precision beyond
    2^53 (realistic epoch-nanos exceed it)."""
    from pyspark.sql import functions as F
    return F.timestamp_micros(F.expr(f"{col} div 1000"))
