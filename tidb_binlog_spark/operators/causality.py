"""Causality grouping: transactions that touch overlapping keys must
apply in order; disjoint groups may apply in parallel.

Reference: pkg/loader/causality.go:31-99 builds a key -> group map over
every PK/UK key-string a txn touches (old and new images,
pkg/loader/model.go:459-512); conflicting groups force a flush barrier;
the group label routes the txn to a worker.

Spark-first: this is connected components on the bipartite txn↔key
graph, with an ADAPTIVE physical strategy (the same size-gated shape
as Spark's broadcast-join threshold). Small candidate graphs — the
common case after LSH banding or causality bucketing — are solved by a
driver union-find in one collect; anything above LOCAL_CC_MAX_EDGES
runs alternating min-label propagation (a fixed-point loop of two
shuffles per iteration) — converges in O(diameter) iterations; each
iteration is a plain groupBy/join so it scales horizontally. Both
paths produce the identical min-txn_id labeling. The final group id
becomes the repartition key for the parallel apply, giving the
reference's "per-key order is sufficient" guarantee at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Edge-count gate below which components are solved on the driver
# instead of by the distributed fixpoint loop. Rationale (the
# autoBroadcastJoinThreshold pattern — adapt the physical strategy to
# the measured relation size, keep the distributed plan for anything
# big): the candidate graph after LSH banding / causality bucketing is
# typically orders of magnitude smaller than the corpus, and each
# distributed min-propagation round costs two shuffles of FIXED
# scheduler latency regardless of size — ~0.7 s/round x ~7 rounds
# measured at bench scale on a 39k-edge graph (ROUNDLOG r10), i.e.
# ~6 s to label a graph a driver union-find solves in <50 ms.
#
# The default sits at the MEASURED crossover, not at the driver-memory
# ceiling: the single-threaded union-find costs ~6 us/edge, so by 2M
# edges it LOSES to the loop (12.3 s vs 4.8 s measured on a
# conflict-pair graph; a first sf10 streaming run with a 2M gate sent
# ~1.5M-edge micro-batches down the local path and regressed SQL-apply
# 190 -> 339 s). 500k edges: local 3.3 s vs distributed 4.5 s — still
# a win, and every registry/bench graph (39k-400k edges) stays local.
# Tunable per deployment via SPARK_GRAFT_CC_LOCAL_EDGES (0 disables
# the local path and skips the gate count entirely).
LOCAL_CC_MAX_EDGES = 500_000


def _local_components_np(txn, kinv, n_keys):
    """Vectorized driver CC over the bipartite txn<->key edge list
    (r12: the 100M-event apply profile measured the DISTRIBUTED
    fixpoint as 66% of per-batch time at ~6M edges — far above the
    old 500k python-union-find gate, far below where the driver
    actually runs out of road). Same min-label fixpoint as both other
    paths, computed with sort-once + np.minimum.reduceat grouped mins
    and pointer jumping per round (labels are txn ids, so jumping is
    one searchsorted gather).

    txn: int64 edge txn ids; kinv: int64 key codes 0..n_keys-1 (every
    code present at least once — pandas factorize output). Returns
    (unique txn ids, their component labels = min txn of component).
    """
    import numpy as np
    ut, tinv = np.unique(txn, return_inverse=True)
    korder = np.argsort(kinv, kind="stable")
    kbounds = np.flatnonzero(
        np.r_[True, kinv[korder][1:] != kinv[korder][:-1]])
    torder = np.argsort(tinv, kind="stable")
    tbounds = np.flatnonzero(
        np.r_[True, tinv[torder][1:] != tinv[torder][:-1]])
    tlab = ut.copy()
    for _ in range(64):
        # key label = min over its edges' txn labels (groups arrive
        # in code order 0..n_keys-1 because factorize covers every
        # code); txn label = min(own, min over its keys' labels)
        klab = np.minimum.reduceat(tlab[tinv][korder], kbounds)
        new = np.minimum(tlab, np.minimum.reduceat(
            klab[kinv][torder], tbounds))
        # pointer jumping: a label IS a txn id, so shortcut through
        # that txn's current label
        new = np.minimum(new, tlab[np.searchsorted(ut, new)])
        if np.array_equal(new, tlab):
            return ut, tlab
        tlab = new
    raise RuntimeError(
        "local causality CC did not converge in 64 rounds — "
        "component diameter beyond pointer-jumped bounds "
        "(corrupt edge list?)")


def _local_components(rows) -> "pandas.DataFrame":
    """Driver-side union-find over collected (txn_id, key) rows.

    Produces exactly the distributed loop's fixpoint: every txn with at
    least one non-null key appears once, labeled with the minimum
    txn_id of its connected component in the bipartite txn<->key graph.
    """
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    for txn_id, key in rows:
        t, k = ("t", txn_id), ("k", key)   # namespaced bipartite nodes
        if t not in parent:
            parent[t] = t
        if k not in parent:
            parent[k] = k
        ra, rb = find(t), find(k)
        if ra != rb:
            parent[rb] = ra

    group_min: dict = {}
    txns = [n for n in parent if n[0] == "t"]
    roots = {t: find(t) for t in txns}
    for t, r in roots.items():
        tid = t[1]
        cur = group_min.get(r)
        if cur is None or tid < cur:
            group_min[r] = tid
    return pd.DataFrame(
        {"txn_id": [t[1] for t in txns],
         "group_id": [group_min[roots[t]] for t in txns]})


def causality_groups(txn_keys: DataFrame, max_iter: int = 50,
                     local_threshold: int | None = None) -> DataFrame:
    """txn_keys: (txn_id BIGINT, key STRING) one row per key a txn
    touches. Returns (txn_id, group_id) where group_id = min txn_id of
    the connected component.

    Adaptive physical strategy (r10): one cheap count on the persisted
    edge frame picks between a driver union-find (small graphs — see
    LOCAL_CC_MAX_EDGES) and the distributed min-propagation fixpoint
    (everything else). Both paths compute the identical min-txn_id
    component labeling; tests/test_operators.py asserts their
    equality on randomized graphs.

    Distributed path: each iteration's labels are localCheckpoint'ed —
    this both caches the data (the convergence check would otherwise
    re-execute the whole lineage every round) and TRUNCATES the logical
    plan; without it the plan nests one join deeper per iteration and
    deep components OOM the driver on plan construction alone. The loop
    RAISES if the fixpoint isn't reached within max_iter — a silently
    split component would let order-dependent txns apply in parallel,
    the exact corruption this operator prevents.
    """
    if local_threshold is None:
        import os
        local_threshold = int(os.environ.get(
            "SPARK_GRAFT_CC_LOCAL_EDGES", LOCAL_CC_MAX_EDGES))
    # null txn_id rows must go too: the distributed joins would drop
    # them silently but toPandas would surface them as float64/NaN
    # labels on the local path — filter both so the paths agree.
    edges = txn_keys.select("txn_id", "key").distinct() \
                    .filter(F.col("txn_id").isNotNull()
                            & F.col("key").isNotNull())
    edges.persist()
    try:
        return _causality_groups_on_edges(
            txn_keys, edges, max_iter, local_threshold)
    finally:
        edges.unpersist()


def _cc_shuffle_partitions(n_edges: int) -> int:
    """Deployment-sizing rule applied to the fixpoint's OWN input:
    next power of two of edge-rows/1M in [32, 1024]. The iterative CC
    runs 4 shuffles per round over the EDGE frame, whose size is set
    by the micro-batch, not the corpus — r13 measured the same-size
    graph (~10-16M edge rows) costing 20-33 s at 32 partitions (sf10
    run) but 96-119 s at the event-sized 128 (sf100 run): with ~100k
    rows/task, per-task scheduling overhead dominates every round and
    AQE cannot help because each localCheckpoint materializes the
    full partitioning. Numbers in SCALING.md."""
    p = 32
    while p < 1024 and p * 1_000_000 < n_edges:
        p *= 2
    return p


def _causality_groups_on_edges(txn_keys, edges, max_iter,
                               local_threshold):
    id_type = txn_keys.schema["txn_id"].dataType

    n_edges = edges.count()
    if local_threshold and n_edges <= local_threshold:
        import numpy as np
        import pandas as pd
        epdf = edges.toPandas()            # Arrow batch transfer
        schema = T.StructType([T.StructField("txn_id", id_type),
                               T.StructField("group_id", id_type)])
        if epdf.empty:
            return txn_keys.sparkSession.createDataFrame([], schema=schema)
        # numpy min-label fixpoint (r12) — the python union-find
        # (_local_components) stays as the parity oracle in tests
        kcodes, _ = pd.factorize(epdf["key"])
        ut, lab = _local_components_np(
            epdf["txn_id"].to_numpy(np.int64),
            kcodes.astype(np.int64), int(kcodes.max()) + 1)
        pdf = pd.DataFrame({"txn_id": ut, "group_id": lab})
        return txn_keys.sparkSession.createDataFrame(pdf, schema=schema)

    # scoped shuffle sizing for the fixpoint rounds (see
    # _cc_shuffle_partitions). The session conf is restored after the
    # loop; every round's labels are localCheckpoint'ed, so downstream
    # consumers never re-execute these shuffles under the restored
    # conf. Single-driver pipelines run one foreachBatch at a time,
    # which is the context this operator executes in.
    spark = txn_keys.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(_cc_shuffle_partitions(n_edges)))
    try:
        return _cc_fixpoint(edges, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _cc_fixpoint(edges, max_iter):
    labels = edges.select("txn_id").distinct() \
                  .withColumn("label", F.col("txn_id")).localCheckpoint()

    # Pointer jumping (label-of-label shortcutting) was A/B-measured
    # here in r10 and REJECTED as the DEFAULT: it halves the
    # propagation rounds (7 -> 4 on the chain-heavy consensus graph)
    # but adds a label-map self-join shuffle per round, netting SLOWER
    # at both bench scale (5.9 -> 6.2s, fixed-overhead-dominated) and
    # 100x (70.1 -> 87.5s, where the label map is no longer small
    # relative to the round cost). Plain min-propagation stays the
    # default; pointer jumping kicks in ONLY as the deep-component
    # fallback below (plain rounds advance a label one txn-hop per
    # round, so a chain of diameter d needs ~d rounds and would RAISE
    # past max_iter; with jumping, labels shortcut through their
    # current root, giving O(log d) rounds — the convergence safety
    # net, paid only when the graph is actually deep).
    jump_after = 16
    prev_sum, converged = None, False
    for it in range(max_iter):
        lk = (edges.join(labels, "txn_id")
                   .groupBy("key").agg(F.min("label").alias("key_label")))
        new_labels = (edges.join(lk, "key")
                      .groupBy("txn_id")
                      .agg(F.min("key_label").alias("label")))
        if it >= jump_after:
            lmap = labels.select(F.col("txn_id").alias("_l_txn"),
                                 F.col("label").alias("_l_lab"))
            new_labels = (new_labels
                          .join(lmap, new_labels["label"] == lmap["_l_txn"],
                                "left")
                          .select("txn_id",
                                  F.least("label", "_l_lab").alias("label")))
        new_labels = new_labels.localCheckpoint()
        s = new_labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
        labels = new_labels
        # s is None <=> the label frame is empty (empty micro-batch):
        # already at the (empty) fixpoint.
        if s is None or (prev_sum is not None and s == prev_sum):
            converged = True
            break
        prev_sum = s
    if not converged:
        raise RuntimeError(
            f"causality_groups did not converge in {max_iter} iterations; "
            f"raise max_iter (component diameter exceeds it)")
    return labels.withColumnRenamed("label", "group_id")


def stamp_workers(changes: DataFrame, groups: DataFrame,
                  num_workers: int = 16,
                  txn_col: str = "commit_ts") -> DataFrame:
    """Stamp a (txn_id, group_id) labeling onto the statement frame as
    (group_id, worker_id) — the join half of
    :func:`conflict_free_partitions`, split out so the apply profile
    can clock the CC fixpoint and the big-frame stamp separately
    (VERDICT r12 item 1).

    worker_id is computed on the SMALL groups frame before the join
    (one row per txn, not per statement) and the join side is
    broadcast-hinted when the labeling fits (one row per txn —
    bounded by the micro-batch's txn count, not corpus size), so the
    statement frame keeps its partitioning instead of shuffling
    through a sort-merge join (r13 A/B at 10M events; numbers in
    SCALING.md). The count guarding the hint is cheap: the
    distributed fixpoint localCheckpoints its final labels and the
    local gate builds them on the driver. Past the cap (default 8M
    txns ~ 200MB serialized) the stamp falls back to the shuffle
    join rather than force an oversized broadcast. Unmatched txns
    (no key rows) fall back to singleton groups and get the same
    hash, applied post-join on the big frame only for NULL rows."""
    import os
    small = groups.select(
        F.col("txn_id"),
        F.col("group_id"),
        F.pmod(F.xxhash64(F.col("group_id")),
               F.lit(num_workers)).alias("worker_id"))
    cap = int(os.environ.get("SPARK_GRAFT_STAMP_BROADCAST_MAX",
                             8_000_000))
    if cap > 0 and groups.count() <= cap:
        small = F.broadcast(small)
    out = changes.join(small,
                       changes[txn_col] == small.txn_id, "left") \
                 .drop("txn_id")
    # txns with no key rows: singleton groups (their own id) — a NULL
    # group would hash every unmatched txn onto one worker
    out = out.withColumn("group_id",
                         F.coalesce(F.col("group_id"), F.col(txn_col)))
    return out.withColumn(
        "worker_id",
        F.coalesce(F.col("worker_id"),
                   F.pmod(F.xxhash64(F.col("group_id")),
                          F.lit(num_workers))))


def conflict_free_partitions(changes: DataFrame, txn_keys: DataFrame,
                             num_workers: int = 16,
                             txn_col: str = "commit_ts") -> DataFrame:
    """Stamp each change with its causality group and a worker id
    (hash of group % workers) — the Spark analog of loader's
    hash-to-16-workers dispatch (pkg/loader/load.go:508-575). A
    repartition on worker_id then gives per-group ordered, cross-group
    parallel apply.

    `txn_col` must be the SAME txn identity used to build `txn_keys`.
    Txns with no key rows are singleton groups (their own id) — a NULL
    group would hash every unmatched txn onto one worker.
    """
    return stamp_workers(changes, causality_groups(txn_keys),
                         num_workers=num_workers, txn_col=txn_col)
