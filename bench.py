"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are materialized with the noop sink (full execution, no
driver-side collection cost) after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from tidb_binlog_spark.cache import release_all
from tidb_binlog_spark.session import get_spark

# Tiered bench (VERDICT r7 item 6): a STABLE core tracked
# round-over-round (the pipeline spine, the 13 queries shared with the
# round-1 operative baseline, and the heaviest per-family
# representatives — names never rotate, so BENCH_r{N} cores diff
# directly), plus a rotating EXTENDED tier carrying the same-round
# cost-recording convention (each query appears the round its first
# driver CORRECTNESS row lands, then drops out).
CORE = [
    # spine
    "cdc_snapshot_apply",        # full pipeline spine: order->compact->apply
    "cdc_full_pipeline",         # declarative config: filter+route+compact
    "cdc_kway_merge",            # multi-source merge + watermark gate
    "cdc_wide_row_apply",        # per-PK merge over the map row model
    "cdc_pc_match",              # P/C binlog join
    "cdc_kv_decode",             # KV row-value codec (Arrow mapInPandas)
    "cdc_relay_recovery",        # CRC-framed WAL write + pruned re-apply
    "cdc_scd2_history",          # SCD2 version intervals per PK
    "cdc_incremental_agg",       # delta-maintained group aggregates
    # sinks / wire
    "sink_bulk_batches",         # compaction + batched statement build
    "sink_sql_generation",       # dual-dialect statement projection
    "sink_kafka_obinlog",        # protobuf wire + single-producer frame
    # dedup family
    "dedup_exact",               # content-hash dedup clusters
    "dedup_minhash_lsh",         # MinHash+LSH near-dup pairs
    "dedup_simhash_pairs",       # SimHash signatures + banded pairs
    "dedup_consensus",           # 2-of-3 multi-signal dedup (heaviest)
    "dedup_semantic",            # SemDeDup, derived-k guarded
    # ANN family
    "ann_cosine_topk",           # brute-force cosine top-k
    "ann_ivf_topk",              # IVF inverted-list search
    "ann_pca_project",           # integer moments -> eigh basis
    # text / corpus
    "text_bm25",                 # broadcast-stats keyword relevance
    "text_profile",              # all per-doc text metrics
    "text_bpe_encode",           # capped BPE learn + Arrow encode
    "doc_semantic_chunks",       # TextTiling topic-boundary splits
    "corpus_kmv_merge",          # KMV sketch + in-query merge proof
    "corpus_full_curation",      # composed line-dedup->score->gate->pack
    "curation_pipeline",         # lang-ID + quality + dedup composed
    "rag_retrieve_pack",         # retrieve -> dedup -> context pack
    # events / snapshot analytics
    "events_sessionize",         # gap-based sessionization
    "events_funnel",             # k-step conversion funnel
    "mm_assets",                 # mapInPandas multimodal plumbing
    "snapshot_pricing_summary",  # wide aggregate over lineitem
    "snapshot_revenue_by_nation",# broadcast join chain
    "snapshot_checksum_orders",  # sync-diff style checksum
]

# r8 extended tier: the 33 queries earning their FIRST driver
# CORRECTNESS row this round (12 late-r7 + 21 r7-session-new); the 8
# remaining r7-session-new rows rotate in with their r9 driver rows.
EXTENDED = [
    "events_ohlc",
    "cdc_salt_advisor",
    "corpus_oov_rate",
    "events_multitouch",
    "corpus_hll_registers",
    "snapshot_compaction_plan",
    "corpus_pagerank",
    "corpus_dsir_select",
    "ann_ivf_incremental",
    "ann_int8_quant",
    "events_rep_points",
    "snapshot_stats_merge",
    "corpus_quantile_sketch",
    "corpus_cms_topk",
    "events_decayed_topk",
    "cdc_dml_mix_drift",
    "events_growth_accounting",
    "corpus_vocab_growth",
    "ann_recall_curve",
    "events_seasonal_residuals",
    "dedup_lsh_accuracy",
    "events_markov_attribution",
    "cdc_redelivery_proof",
    "rag_retrieval_ndcg",
    "events_activity_gini",
    "events_holt_forecast",
    "events_peak_concurrency",
    "events_conversion_latency",
    "cdc_ddl_risk_audit",
    "events_rfm_segments",
    "events_dau_wau_mau",
    "events_cusum_changepoint",
    "cdc_asof_diff",
]

HEADLINE = CORE + EXTENDED

# the rows the optional scale tier re-times (see main): the bench's
# heaviest data-bound queries plus the r14-touched scale paths
SCALE_TIER = [
    "corpus_pagerank",
    "dedup_consensus",
    "dedup_semantic",
    "corpus_full_curation",
    "cdc_relay_recovery",
    "dedup_lsh_accuracy",
    "snapshot_stats_merge",
    "corpus_kmv_merge",
    "rag_retrieve_pack",
    "corpus_hll_registers",
    "rag_retrieval_ndcg",
    "corpus_tfidf_topk",
    "sink_kafka_obinlog",
    "cdc_kv_decode",
    "dedup_minhash_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = entry.queries()
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names not in queries(): {missing}"

    # warm up the JVM + parquet footers + Python workers once (not
    # timed). Chosen BY EXCLUSION from the live registry — a
    # hard-coded name here is a rotation hazard (the r3 bench crash,
    # and cdc_event_counters' r4 retirement, were both exactly this).
    # A non-HEADLINE query keeps the warm-up from pre-warming any
    # timed query's own first pass.
    warm_name = next(n for n in qs if n not in set(HEADLINE))
    qs[warm_name](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    def _ident(batches):
        yield from batches
    # spin up one Arrow Python worker per core
    spark.range(0, 256, 1, 32).mapInPandas(_ident, "id long") \
        .write.format("noop").mode("overwrite").save()

    # Compile the hot codegen shapes once on tiny synthetic data (windowed
    # prefix aggregates, row_number, broadcast join, max_by groupBy, string
    # builders) — JVM JIT warm-up, the bench-harness analog of `go test
    # -bench`'s warm-up iterations. No scale-factor data is touched, so
    # per-query timings still include their own first pass over the data.
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    tiny = spark.range(0, 2000, 1, 8).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("seq"),
        (F.col("id") * 7 % 1000).alias("ts"),
        F.md5(F.col("id").cast("string")).alias("s"))
    tb = tiny.withColumn("b", F.floor(F.col("seq") / 256))
    w_in = (Window.partitionBy("k", "b").orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, -1))
    w_dup = Window.partitionBy("ts").orderBy("seq", "k")
    side = (tb.groupBy("k", "b")
            .agg(F.max("ts").alias("m"), F.max_by("s", "seq").alias("last_s")))
    warm = (tb.withColumn("p", F.max("ts").over(w_in))
            .withColumn("r", F.row_number().over(w_dup))
            .join(F.broadcast(side), ["k", "b"])
            .withColumn("t", F.concat_ws(",", F.col("s"),
                                         F.col("ts").cast("string"))))
    warm.write.format("noop").mode("overwrite").save()
    # wide-aggregate codegen (the 64-bit simhash shape: one sum per bit,
    # each extracting an array element — the exact expression class)
    (tiny.withColumn("arr", F.expr("transform(sequence(1, 64), "
                                   "p -> IF(p % 2 = 0, 1, -1))"))
         .groupBy("k")
         .agg(*[F.sum(F.col("arr")[i]).alias(f"s{i}") for i in range(64)])
         .write.format("noop").mode("overwrite").save())

    # min of 3 runs per query: this host shows ±15% co-tenant noise with
    # occasional 2-3x stragglers (documented in BASELINE.md) that can hit
    # two consecutive runs; the min is the standard straggler-robust
    # estimator (pytest-benchmark, go test -bench best-of-N). Every run
    # executes the full plan — nothing is cached between them
    # (release_all unpersists).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            release_all()
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # second-tier metric (VERDICT r5 item 6): FULL-RATE wire marshal —
    # the un-subsampled change stream through the secondary-binlog
    # protobuf assembly and the CRC-framed pb-dump writer, reported as
    # events/s (the analog of the reference's kafka marshal bench,
    # drainer/sync/bench_kafka_test.go:52). The headline queries
    # subsample these paths to bound per-round cost; this records the
    # raw marshal throughput so regressions in the Arrow/protobuf hot
    # loop are tracked even when the subsampled rows stay flat.
    import shutil
    import tempfile

    from tidb_binlog_spark.sinks import kafka as kafka_sink
    from tidb_binlog_spark.sinks import obinlog_pb, pbcodec
    from tidb_binlog_spark.sources.changestream import change_stream

    ch = kafka_sink.with_row_image(change_stream(spark, sf_dir)).persist()
    n_events = ch.count()
    # min-of-3 like every query row (VERDICT r8 item 6): this is the
    # one Python-bound (Arrow mapInPandas marshal) tier and the
    # recorded number swung 46-69k ev/s across rounds at min-of-2 —
    # co-tenant stragglers hit two consecutive runs often enough.
    obinlog_best = None
    for _ in range(3):
        t0 = time.time()
        obinlog_pb.secondary_binlog_payloads(ch).write.format("noop") \
            .mode("overwrite").save()
        dt = time.time() - t0
        obinlog_best = dt if obinlog_best is None else min(obinlog_best, dt)
    dump_best = None
    dump_dir = None
    for _ in range(3):
        if dump_dir is not None:
            shutil.rmtree(dump_dir, ignore_errors=True)
        dump_dir = tempfile.mkdtemp(prefix="bench_pbdump_")
        t0 = time.time()
        pbcodec.write_pb_dump(ch, dump_dir)
        dt = time.time() - t0
        dump_best = dt if dump_best is None else min(dump_best, dt)
    # the reparo replay direction (read_pb_dump: scan_records batched
    # CRC + shape-specialized unmarshal) over the last written dump
    read_best = None
    for _ in range(3):
        t0 = time.time()
        pbcodec.read_pb_dump(spark, dump_dir).write.format("noop") \
            .mode("overwrite").save()
        dt = time.time() - t0
        read_best = dt if read_best is None else min(read_best, dt)
    shutil.rmtree(dump_dir, ignore_errors=True)
    ch.unpersist()
    wire_marshal = {
        "n_events": int(n_events),
        "obinlog_marshal_events_per_s": round(n_events / obinlog_best),
        "pb_dump_events_per_s": round(n_events / dump_best),
        "pb_read_events_per_s": round(n_events / read_best),
    }

    total = round(sum(timings.values()), 3)
    core_t = {n: timings[n] for n in CORE}
    ext_t = {n: timings[n] for n in EXTENDED}
    tiers = {
        "core": {"value": round(sum(core_t.values()), 3),
                 "queries": core_t},
        "extended": {"value": round(sum(ext_t.values()), 3),
                     "queries": ext_t},
    }

    # Optional SCALE tier (VERDICT r13 item 9): every remaining top
    # sf0.1 row sits at its per-task-overhead floor, so round-over-
    # round deltas at the default SF measure scheduling, not data
    # work. When SPARK_GRAFT_BENCH_SCALE_DIR names a bigger fixture
    # dir (tools/make_scaled_sf.py output), the heaviest rows re-run
    # against it with the SAME min-of-3 noop-sink methodology and
    # land under tiers.scale — NEVER in `queries` or `value`, and
    # OFF unless the env var is set, so the driver's default
    # invocation times the same queries at the same scale factor as
    # every prior round (the bench-contract invariant).
    scale_dir = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR")
    if scale_dir:
        scale_t: dict[str, float] = {}
        for name in SCALE_TIER:
            best = None
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, scale_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.time() - t0
                release_all()
                best = dt if best is None else min(best, dt)
            scale_t[name] = round(best, 3)
        tiers["scale"] = {"dir": scale_dir,
                          "value": round(sum(scale_t.values()), 3),
                          "queries": scale_t}

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "runs_per_query": 3,
        "queries": timings,
        "tiers": tiers,
        "wire_marshal": wire_marshal,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
