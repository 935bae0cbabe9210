"""Statement-executing sink: the loader executor analog.

Reference: pkg/loader/executor.go:179-443 executes the generated
statements against the downstream over N workers, each worker applying
its causality group's statements in order; pkg/loader/load.go:40-45
retries DML 100x and DDL 5x with 1s backoff; executor.go:336-405
refreshes the cached table info on ErrColumnNotExists and retries once
more.

Spark form: statements are repartitioned by worker id and each
partition executes its statements IN ORDER through a DB-API
connection. The test target is SQLite (one file per worker — workers
never share a connection, mirroring the reference's
connection-per-worker pool); a production target swaps the connect
callable for a MySQL/JDBC driver, nothing else changes.

Ordering contract: within a partition the rows MUST already be sorted
by (commit_ts, seq, sub_seq) — repartition + sortWithinPartitions is
the caller's job (provided by ``apply_statements``).

Hash-partitioning note: two distinct worker_ids can land in the same
Spark partition; run_partition therefore keys its connections by the
row's worker_id, not by the partition — the one-connection-per-worker
contract holds regardless of the hash layout.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference retry policy (pkg/loader/load.go:40-45)
MAX_DML_RETRY = 100
MAX_DDL_RETRY = 5

# downstream checkpoint table (arbiter/checkpoint.go:40-78): the
# savepoint lives IN the target DB and commits atomically with the
# applied rows, so a crash can never separate data from cursor.
CKPT_TABLE = "_binlog_checkpoint"
CKPT_SETUP = (f"CREATE TABLE IF NOT EXISTS {CKPT_TABLE}("
              f"topic_name TEXT PRIMARY KEY, ts BIGINT NOT NULL, "
              f"status INT NOT NULL)")
STATUS_RUNNING = 0   # arbiter/server.go StatusRunning
STATUS_NORMAL = 1    # graceful shutdown (server.go:220)

# single-downstream layout (apply_statements shared_db=True): all
# workers connect to this one file; per-worker cursors live under
# "<topic>@<worker_id>" rows of CKPT_TABLE
SHARED_DB_NAME = "downstream.db"


class RetryPolicy:
    """Retry/backoff policy for transient downstream errors.

    ``max_retries`` per statement, sleeping ``backoff_s`` between
    attempts (the reference sleeps 1s; tests shrink it). ``on_refresh``
    is the ErrColumnNotExists hook: called once per failing statement
    before the next attempt, giving the caller a chance to refresh
    downstream table info / re-create a missing column
    (executor.go:336-405 evict-and-refresh)."""

    def __init__(self, max_retries: int = MAX_DML_RETRY,
                 backoff_s: float = 1.0,
                 on_refresh=None,
                 is_transient=None):
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.on_refresh = on_refresh
        self.is_transient = is_transient if is_transient is not None \
            else default_is_transient


def default_is_transient(exc: Exception) -> bool:
    """Retryability classification — the analog of the reference's
    retryable-error-code check (pkg/sql retries only connection/lock
    errors). Schema and constraint violations are deterministic:
    retrying a syntax error or duplicate key 100x just stalls the
    worker. Name-based so no DB driver import is required."""
    name = type(exc).__name__
    if name in ("IntegrityError", "ProgrammingError", "DataError",
                "NotSupportedError", "TypeError"):
        return False
    return True


def _execute_with_retry(conn, sql_text: str, policy: RetryPolicy,
                        inject=None) -> None:
    refreshed = False
    attempt = 0
    while True:
        try:
            if inject is not None:
                inject(sql_text)   # test hook: raises to simulate a flake
            conn.execute(sql_text)
            return
        except Exception as exc:
            # the refresh hook fires once per statement, mirroring the
            # single evict-and-refresh the reference does for
            # ErrColumnNotExists (loader/executor.go singleExecRetry:
            # refresh table info, then re-run the statement). The
            # post-refresh retry happens REGARDLESS of transience —
            # an unknown-column ProgrammingError is deterministic
            # against the stale catalog but may succeed against the
            # refreshed one.
            if policy.on_refresh is not None and not refreshed:
                refreshed = True
                policy.on_refresh(conn, sql_text, exc)
                if attempt < policy.max_retries:
                    attempt += 1
                    time.sleep(policy.backoff_s)
                    continue
            if attempt >= policy.max_retries or not policy.is_transient(exc):
                # name the statement SHAPE in the raised error — a
                # worker failure at scale is undebuggable from the
                # bare driver-side "constraint failed" text alone.
                # Verb + target only, never literals: the full text
                # carries row values, which must not leak into logs /
                # error trackers if this helper fronts a real
                # database (ADVICE r11).
                if hasattr(exc, "add_note"):
                    head = " ".join(sql_text.split()[:3])
                    exc.add_note(f"statement shape: {head[:120]} ... "
                                 f"({len(sql_text)} chars)")
                raise
            attempt += 1
            time.sleep(policy.backoff_s)


def apply_statements(stmts: DataFrame, db_dir: str,
                     num_workers: int = 4,
                     worker_col: str = "worker_id",
                     setup_sql: tuple[str, ...] = (),
                     retry: RetryPolicy | None = None,
                     inject=None,
                     checkpoint_ts: int | None = None,
                     topic: str = "default",
                     shared_db: bool = False,
                     shard_files: bool = False) -> None:
    """Execute the ``sql_text`` column per worker, partitioned by
    worker id.

    stmts: columns (worker_id, commit_ts, seq, sub_seq, sql_text).
    Per-worker order is (commit_ts, seq, sub_seq) — exactly the
    per-causality-group order guarantee of the reference's dispatch.
    Transient failures are retried per ``retry`` (default: the
    reference's 100x policy with a 10ms local backoff).

    ``shared_db`` selects the downstream topology:
    - False (default): each worker writes its own
      <db_dir>/worker_<id>.db — the sharded test layout. Row placement
      then follows routing, so the router must be STABLE per row
      across batches (pmod(pk)-style).
    - True: every worker is a connection to ONE database
      (<db_dir>/downstream.db) — the reference's actual topology
      (pkg/loader/executor.go: N workers, one MySQL). Routing only
      decides execution order/parallelism, so causality-group worker
      ids (which vary per batch) are safe, and sink-side UNIQUE
      constraints span all rows. SQLite serializes the writers via
      its file lock (busy_timeout); a real MySQL executes them
      concurrently. Workers sharing a Spark partition apply
      sequentially (group-by-worker first) so one partition never
      holds two open transactions against the same file.

    ``shard_files`` (only with ``shared_db=True``): each worker's
    transaction writes <db_dir>/worker_<id>.db instead of the one
    shared file — the measurement stand-in for MySQL's concurrent
    sessions (within a batch, causality routing makes worker key sets
    disjoint, so N writers never contend in MySQL; SQLite's file lock
    serializes them anyway). TIMING EXPERIMENTS ONLY: causality
    worker ids vary per batch, so the same pk lands in different
    files across batches and the sharded state is not a readable
    replica. The shared single file stays the correctness topology.

    ``inject``: optional callable(sql_text) raised into every execute —
    the deterministic transient-failure injector used by tests.

    ``checkpoint_ts``: the batch watermark. When set, each worker
    REPLACEs it into the downstream checkpoint table in the SAME
    transaction as its data (arbiter/checkpoint.go Save) — the commit
    makes rows + cursor atomic, so ``load_checkpoint`` (min over
    workers; per-worker ``topic@wid`` rows in shared mode) is always
    the last FULLY-applied batch after any crash. Never regresses
    (MAX against the stored ts).
    """
    os.makedirs(db_dir, exist_ok=True)
    setup = list(setup_sql)
    if checkpoint_ts is not None:
        setup.append(CKPT_SETUP)
    policy = retry if retry is not None else RetryPolicy(backoff_s=0.01)

    ckpt_upsert = (f"INSERT INTO {CKPT_TABLE}(topic_name, ts, status) "
                   f"VALUES (?, ?, ?) ON CONFLICT(topic_name) DO "
                   f"UPDATE SET ts = MAX(ts, excluded.ts), "
                   f"status = excluded.status")

    def run_partition(rows) -> None:
        import sqlite3
        if shared_db:
            # one txn per worker, applied sequentially: a partition
            # must never hold two open write txns on the same file
            by_wid: dict = {}
            for row in rows:
                by_wid.setdefault(row[worker_col], []).append(row)
            for wid, wrows in by_wid.items():
                path = os.path.join(
                    db_dir,
                    f"worker_{wid}.db" if shard_files else SHARED_DB_NAME)
                conn = sqlite3.connect(path)
                conn.execute("PRAGMA busy_timeout=30000")
                try:
                    # setup through the retry policy too: CREATE IF
                    # NOT EXISTS is idempotent, and when every worker
                    # reaches its first write simultaneously (warm
                    # cache upstream) a sibling's minutes-long batch
                    # txn holds the file lock far past busy_timeout —
                    # r12 caught this as a raw "database is locked"
                    # from the unprotected setup loop at 100M events
                    for s in setup:
                        _execute_with_retry(conn, s, policy, None)
                    for row in wrows:
                        _execute_with_retry(conn, row["sql_text"],
                                            policy, inject)
                    if checkpoint_ts is not None:
                        conn.execute(ckpt_upsert,
                                     (f"{topic}@{wid}", int(checkpoint_ts),
                                      STATUS_RUNNING))
                    conn.commit()
                finally:
                    conn.close()
            return
        conns: dict = {}
        try:
            for row in rows:
                wid = row[worker_col]
                conn = conns.get(wid)
                if conn is None:
                    path = os.path.join(db_dir, f"worker_{wid}.db")
                    conn = sqlite3.connect(path)
                    for s in setup:
                        conn.execute(s)
                    conns[wid] = conn
                _execute_with_retry(conn, row["sql_text"], policy, inject)
            for conn in conns.values():
                if checkpoint_ts is not None:
                    conn.execute(ckpt_upsert,
                                 (topic, int(checkpoint_ts), STATUS_RUNNING))
                conn.commit()
        finally:
            for conn in conns.values():
                conn.close()

    (stmts
     .repartition(num_workers, F.col(worker_col))
     .sortWithinPartitions("commit_ts", "seq", "sub_seq")
     .foreachPartition(run_partition))

    if checkpoint_ts is not None:
        # barrier passed: every busy worker committed data+cursor
        # atomically above. Idle workers (no rows this batch) still
        # need their cursor advanced or they pin the min forever; a
        # crash RIGHT HERE only leaves a conservative cursor -> the
        # batch replays under safe mode, which is idempotent.
        save_checkpoint(db_dir, checkpoint_ts, topic)


def save_checkpoint(db_dir: str, ts: int, topic: str = "default") -> None:
    """Advance every downstream cursor to ``ts`` (never regresses —
    MAX against the stored value): the plain topic row per shard plus,
    in the shared layout, every per-worker ``topic@wid`` row (the
    apply barrier has passed, so raising idle/stale workers is
    correct). Used by the post-apply idle-worker sweep and by the
    streaming DDL barrier, which saves the checkpoint IMMEDIATELY
    after a DDL executes (drainer/syncer.go:234-238 savePoint)."""
    import sqlite3
    for fname in sorted(os.listdir(db_dir)):
        if not fname.endswith(".db"):
            continue
        conn = sqlite3.connect(os.path.join(db_dir, fname))
        try:
            conn.execute("PRAGMA busy_timeout=30000")
            conn.execute(CKPT_SETUP)
            conn.execute(
                f"INSERT INTO {CKPT_TABLE}(topic_name, ts, status) "
                f"VALUES (?, ?, ?) ON CONFLICT(topic_name) DO "
                f"UPDATE SET ts = MAX(ts, excluded.ts)",
                (topic, int(ts), STATUS_RUNNING))
            conn.execute(
                f"UPDATE {CKPT_TABLE} SET ts = MAX(ts, ?) "
                f"WHERE topic_name LIKE ? || '@%'",
                (int(ts), topic))
            conn.commit()
        finally:
            conn.close()


def _applied_fragments_for(ddl_sql: str) -> tuple[str, ...]:
    """Error fragments that can only mean "this exact DDL already took
    effect downstream" — seen when a crash lands between the DDL
    commit and the immediate checkpoint save, so the restart replays
    it. Scoped to the DDL's own shape: an ADD COLUMN replay hitting
    'duplicate column name' is the DDL's own effect, but a 'no such
    table' there is genuine divergence and must raise."""
    u = " ".join(ddl_sql.split()).upper()
    if u.startswith("ALTER") and " ADD " in u:
        return ("duplicate column name",)
    if " DROP COLUMN " in u:
        return ("no such column",)
    if u.startswith("CREATE"):
        return ("already exists",)
    if u.startswith("DROP"):
        return ("no such table", "no such index", "no such view")
    if u.startswith("RENAME") or " RENAME TO " in u:
        return ("no such table", "already exists")
    return ()


def execute_ddl(db_dir: str, ddl_sql: str,
                retry: RetryPolicy | None = None,
                catalog=None, schema: str = "main",
                table: str | None = None,
                tolerate_applied: bool = True) -> None:
    """DDL through the executed-SQL sink: the reference flushes pending
    DMLs, then runs the DDL with its own 5x retry budget
    (pkg/loader/load.go:40-45 maxDDLRetryCount, load.go:476-500
    execDDL) and refreshes the cached table info afterwards. The DDL
    applies to every downstream file (one in the shared layout);
    ``catalog.evict`` makes the next statement build see the new
    schema (executor.go:336-405).

    ``tolerate_applied``: a crash between the DDL's commit and the
    immediate checkpoint save makes the restart re-execute it; errors
    that can only be THIS DDL's own prior effect (scoped per DDL kind
    by _applied_fragments_for — e.g. 'duplicate column name' for an
    ADD COLUMN) are swallowed so the replay converges instead of
    wedging the stream; anything else ('no such table' on an ADD)
    still raises. Matching errors are classified non-transient so the
    replay is a true no-op, not 5 retries with backoff first."""
    import sqlite3
    frags = _applied_fragments_for(ddl_sql) if tolerate_applied else ()

    def is_transient(exc: Exception) -> bool:
        if any(f in str(exc).lower() for f in frags):
            return False
        return default_is_transient(exc)

    policy = retry if retry is not None else RetryPolicy(
        max_retries=MAX_DDL_RETRY, backoff_s=0.01,
        is_transient=is_transient)
    for fname in sorted(os.listdir(db_dir)):
        if not fname.endswith(".db"):
            continue
        conn = sqlite3.connect(os.path.join(db_dir, fname))
        try:
            try:
                _execute_with_retry(conn, ddl_sql, policy)
            except sqlite3.OperationalError as e:
                msg = str(e).lower()
                if not any(f in msg for f in frags):
                    raise
            conn.commit()
        finally:
            conn.close()
    if catalog is not None and table is not None:
        catalog.evict(schema, table)


def ensure_shards(db_dir: str, num_workers: int,
                  setup_sql: tuple[str, ...] = (),
                  shared_db: bool = False) -> None:
    """Create the downstream file(s) up front with ``setup_sql``
    applied (idempotent CREATE IF NOT EXISTS). The streaming DDL
    barrier needs this: a DDL arriving before any DML (CREATE TABLE
    first in the log) must reach the downstream, and
    execute_ddl/save_checkpoint iterate the files that exist."""
    import sqlite3
    os.makedirs(db_dir, exist_ok=True)
    names = ([SHARED_DB_NAME] if shared_db
             else [f"worker_{i}.db" for i in range(num_workers)])
    for name in names:
        conn = sqlite3.connect(os.path.join(db_dir, name))
        try:
            for s in setup_sql:
                conn.execute(s)
            conn.commit()
        finally:
            conn.close()


def load_checkpoint(db_dir: str, topic: str = "default") -> tuple[int, int]:
    """Restart cursor: the MIN over worker DBs of their saved ts — any
    worker that died pre-commit holds the previous batch's ts, so the
    min is the last batch every worker completed (arbiter Load +
    server.go:126-136 resume-from-checkpoint). Returns (ts, status);
    (-1, STATUS_NORMAL) when no worker has a checkpoint yet."""
    import sqlite3
    found = []
    if os.path.isdir(db_dir):
        for fname in sorted(os.listdir(db_dir)):
            if not fname.endswith(".db"):
                continue
            conn = sqlite3.connect(os.path.join(db_dir, fname))
            try:
                rows = conn.execute(
                    f"SELECT ts, status FROM {CKPT_TABLE} "
                    f"WHERE topic_name = ? "
                    f"OR topic_name LIKE ? || '@%'",
                    (topic, topic)).fetchall()
                found.extend((int(r[0]), int(r[1])) for r in rows)
            except sqlite3.OperationalError:
                pass            # worker never created the table
            finally:
                conn.close()
    if not found:
        return -1, STATUS_NORMAL
    return (min(ts for ts, _ in found),
            min(st for _, st in found))


def finalize_checkpoint(db_dir: str, topic: str = "default") -> None:
    """Graceful shutdown: mark the saved checkpoints StatusNormal
    (arbiter/server.go:218-236) so the next start knows no replay /
    safe-mode window is needed."""
    import sqlite3
    for fname in sorted(os.listdir(db_dir)):
        if not fname.endswith(".db"):
            continue
        conn = sqlite3.connect(os.path.join(db_dir, fname))
        try:
            conn.execute(
                f"UPDATE {CKPT_TABLE} SET status = ? WHERE topic_name = ? "
                f"OR topic_name LIKE ? || '@%'",
                (STATUS_NORMAL, topic, topic))
            conn.commit()
        except sqlite3.OperationalError:
            pass
        finally:
            conn.close()


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
