"""Statement-executing sink: the loader executor analog.

Reference: pkg/loader/executor.go:179-443 executes the generated
statements against the downstream over N workers, each worker applying
its causality group's statements in order.

Spark form: statements are repartitioned by worker id and each
partition executes its statements IN ORDER through a DB-API
connection. The test target is SQLite (one file per worker — workers
never share a connection, mirroring the reference's
connection-per-worker pool); a production target swaps the connect
callable for a MySQL/JDBC driver, nothing else changes.

Ordering contract: within a partition the rows MUST already be sorted
by (commit_ts, seq, sub_seq) — repartition + sortWithinPartitions is
the caller's job (provided by ``apply_statements``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_statements(stmts: DataFrame, db_dir: str,
                     num_workers: int = 4,
                     worker_col: str = "worker_id",
                     setup_sql: tuple[str, ...] = ()) -> None:
    """Execute the ``sql_text`` column per worker partition.

    stmts: columns (worker_id, commit_ts, seq, sub_seq, sql_text).
    Each worker writes <db_dir>/worker_<id>.db; per-worker order is
    (commit_ts, seq, sub_seq) — exactly the per-causality-group order
    guarantee of the reference's dispatch.
    """
    os.makedirs(db_dir, exist_ok=True)
    setup = list(setup_sql)

    def run_partition(rows) -> None:
        import sqlite3
        conn = None
        try:
            for row in rows:
                if conn is None:
                    path = os.path.join(db_dir, f"worker_{row[worker_col]}.db")
                    conn = sqlite3.connect(path)
                    for s in setup:
                        conn.execute(s)
                conn.execute(row["sql_text"])
            if conn is not None:
                conn.commit()
        finally:
            if conn is not None:
                conn.close()

    (stmts
     .repartition(num_workers, F.col(worker_col))
     .sortWithinPartitions("commit_ts", "seq", "sub_seq")
     .foreachPartition(run_partition))


def read_applied(spark, db_dir: str, table: str, columns: list[str]) -> DataFrame:
    """Union the per-worker databases back into one DataFrame (the
    downstream state, for sync-diff-style verification)."""
    import sqlite3

    import pandas as pd

    frames = []
    for fname in sorted(os.listdir(db_dir)):
        if not fname.endswith(".db"):
            continue
        conn = sqlite3.connect(os.path.join(db_dir, fname))
        try:
            frames.append(pd.read_sql_query(
                f"SELECT {', '.join(columns)} FROM {table}", conn))
        finally:
            conn.close()
    merged = pd.concat(frames) if frames else pd.DataFrame(columns=columns)
    return spark.createDataFrame(merged)
