"""Graph analytics over document/key relationship graphs: join-based
power iteration (PageRank) in exact integer arithmetic.

The reference has no graph operator; the replica's data does — the
near-dup/shared-content graph over a corpus (canonical selection wants
the most *central* doc of a neighborhood, not just the min-id one),
and the UK-conflict graph the causality map already builds
(operators/causality.py is the connected-components half; this is the
centrality half).

Spark-first shape: PageRank is the textbook join-based power
iteration — per iteration ONE src-keyed equi-join (ranks are
node-sized, far smaller than edges; AQE broadcasts them when they
fit) and ONE dst-keyed map-side-combinable aggregate. No mutable
state, no driver loops over data; iterations unroll into a linear
Catalyst plan. At 100 TB the edge list is shuffled once onto src and
reused every iteration (persist), exactly the classic Pregel/GraphX
cost model expressed in DataFrames.

Determinism: ranks live in integer MICRO-units; contributions are
``rank DIV outdeg`` and damping is ``(d * sum) DIV 100`` — exact
BIGINT algebra both engines reproduce bit-for-bit (floor-division
mass loss is the documented price; centrality ORDER is what the
consumer reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_binlog_spark.cache import managed_persist


def rare_feature_edges(docs: DataFrame, n: int = 4,
                       min_df: int = 2, max_df: int = 3) -> DataFrame:
    """Doc-doc edges via shared RARE n-gram shingles (df in
    [min_df, max_df]): two documents sharing a rare phrase are far
    more likely related than ones sharing stopwords — the df cap is
    also the scale bound (a shingle with df <= k fans out to at most
    k*(k-1) edges, so the self-join is bounded per key and never
    quadratic in the corpus).
    """
    from tidb_binlog_spark.functions.text import (ngram_zip_expr,
                                                   with_tokens)
    grams = (with_tokens(docs.select("doc_id", "text"))
             .select("doc_id", F.explode(
                 F.expr(ngram_zip_expr(n))).alias("sh"))
             .distinct())
    dfreq = grams.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    rare = (dfreq.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
            .select("sh"))
    g = grams.join(rare, "sh")
    other = g.select(F.col("sh"), F.col("doc_id").alias("dst"))
    return (g.join(other, "sh")
            .filter(F.col("doc_id") != F.col("dst"))
            .select(F.col("doc_id").alias("src"), "dst")
            .distinct())


def pagerank(edges: DataFrame, iters: int = 3,
             damping_pct: int = 85) -> DataFrame:
    """Fixed-iteration PageRank in integer micro-units over a
    directed edge list (run it on a symmetric edge set for undirected
    graphs). rank_0 = 1e6 for every node with out-edges; each
    iteration: contrib = rank DIV outdeg along each edge, then
    rank' = (100-d)*10^4 + (d * sum(contrib)) DIV 100.

    Returns (node, rank_micro, outdeg) after ``iters`` rounds.
    """
    edges = managed_persist(edges.select("src", "dst"))
    deg = managed_persist(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    base = (100 - damping_pct) * 10_000
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(1_000_000).cast("bigint").alias("rank_micro"))
    for _ in range(iters):
        sums = (edges.join(deg, "src")
                .join(ranks, edges["src"] == ranks["node"])
                .select(F.col("dst"),
                        F.expr("rank_micro DIV outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.expr("CAST(sum(c) AS BIGINT)").alias("s")))
        # left-join back onto the FULL node set (deg): a node with
        # out-edges but no in-edges keeps its (1-d) base rank and its
        # outgoing contribution instead of silently vanishing after
        # iteration 1 (only relevant for directed graphs; on symmetric
        # edge sets every src is also a dst and the join is total).
        ranks = (deg.select(F.col("src").alias("node"))
                 .join(sums, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         F.expr(f"CAST({base} + ({damping_pct} * "
                                "coalesce(s, CAST(0 AS BIGINT))) "
                                "DIV 100 AS BIGINT)").alias("rank_micro")))
    return (ranks.join(deg, ranks["node"] == deg["src"])
            .select("node", "rank_micro", "outdeg"))
