#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints a
detailed JSON line followed by ONE FINAL COMPACT JSON line::

    {"metric": "...", "value": N, "unit": "sec", "sf": ..., ...}

The compact line exists because the driver keeps only the last ~2 kB of
output: round 5's single detailed line (44 cold + 44 warm per-query
timings) outgrew that window and the driver recorded ``parsed: null``
(VERDICT r5 "What's wrong" #1). The final line carries only the totals
(≈300 chars) so the tail window always contains one complete object;
the detailed per-query line is printed immediately before it for humans
and for the repo's own round-over-round analysis.

Pass ordering (VERDICT r5 "What's wrong" #2): the frozen SHARED set is
measured first — cold then warm — BEFORE any non-shared query runs, so
its warm numbers see the same JVM state (generated-class count, heap
debt) every round regardless of how many new queries later rounds add.
r5's shared-warm regression (q3 0.78→1.41 s, simhash 1.73→2.46 s,
code-unchanged, canary flat) was consistent with warm-pass pollution
from a 44-query cold pass; this ordering removes that variable.

``--isolate`` runs each shared query in its own subprocess (fresh JVM)
and prints a comparison line — the one-time receipt for SCALE_NOTES
§bench-isolation. ``--only a,b,c`` restricts the run to those queries.

Timing methodology: each query's result is written to the ``noop`` sink
so we measure the full distributed plan (scan → shuffle → agg/join)
without driver-side collect skew. A warmup query first pays the JVM /
codegen / parquet-footer costs once, the way a long-lived cluster would.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: one per plan family (scan+pushdown, wide agg, multi-join
#: top-k, 6-way broadcast join, distinct agg, window, semi join, top-k sort,
#: exact-count-many-splits) plus the LLM-pipeline operators once present.
HEADLINE = [
    "flagship_offset_agg",
    "count_many_splits",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "join_broadcast",
    "join_semi",
    "agg_distinct",
    "window_rank",
    "topk_parts",
    # LLM-pipeline scale paths (brute-force counterparts are
    # verification-scale only and deliberately not benched)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_lsh",
    "text_stats",
    "text_fingerprint",
    "multimodal_features",
    # round 4: training-data curation scale paths (quality filter,
    # chunking, packing, tf-idf w/ broadcast df, n-gram decontamination,
    # int8 quantization receipt)
    "quality_gopher_rules",
    "doc_chunking",
    # round 5: packing benches the PARTITION-PARALLEL form (the global-
    # window form stays registered for the oracle contract but is a
    # deliberate single-task sort — not a scale path, not benched).
    "pack_token_budget_partitioned",
    "text_tfidf_topk",
    "decontaminate_ngram",
    "embedding_quantize_int8",
    # round 4b: PQ ANN (ADC lookup scoring) and the four-stage curation
    # pipeline composed as one Catalyst plan
    "sim_topk_pq",
    "pipeline_curate_pack",
    # round 4c: the Rakam event-analytics shapes the reference serves
    # (sessionize = window chain; funnel = sorted-fold, one corpus
    # shuffle; retention = single-pass cohort matrix)
    "events_sessionize",
    "events_funnel",
    "events_retention",
    # round 5: ts->offset segment pruning through the native source,
    # composed IVF-PQ, predicate/segment funnels, configured-action
    # retention, dynamic prop-schema inference
    "dsv2_ts_pruned_scan",
    "sim_topk_ivfpq",
    "events_funnel_filtered",
    "events_retention_filtered",
    "events_props_schema_inference",
    # round 5b: the new curation layer — semantic dedup, LM perplexity
    # scoring, BM25 lexical retrieval, epoch-weighted mixture
    # materialization, embedding-space decontamination
    "dedup_semantic",
    "quality_lm_bigram",
    "search_bm25",
    "mix_sources_epochs",
    "decontaminate_embedding",
    "events_attribution",
    # round 5c: substring-span dedup (n-gram-keyed shuffle) and the
    # persisted IVF-PQ index (cold = index build + probe, warm = pure
    # partition-pruned probe against the cached index)
    "dedup_substring_spans",
    "sim_topk_ivfpq_indexed",
    # round 6: query-table BM25 (batch retrieval per scan), span
    # trimming (the Lee-et-al. treatment step), incremental IVF-PQ
    # upsert (cold = init+upsert+probe, warm = pure 2-delta pruned
    # probe)
    "search_bm25_multi",
    "dedup_substring_trim",
    "sim_topk_ivfpq_upsert",
    # round 6b: batch three-leg hybrid retrieval, model-based quality
    # scoring (shuffle-free classifier serving), monthly stickiness
    "search_hybrid_rrf3_multi",
    "quality_logreg_score",
    "events_stickiness",
    # round 6c: contamination audit (broadcast join, benchmark-bounded
    # output) and the dataset-export manifest aggregate
    "decontaminate_report",
    "dataset_shard_stats",
    # round 7: IVF-PQ with the exact re-rank stage (refine-flat index),
    # Kafka log compaction read view, one-pass table profiling, dataset
    # version diff
    "sim_topk_ivfpq_refined",
    "kafka_log_compacted_scan",
    "profile_orders",
    "dataset_diff",
    # round 7b: warehouse maintenance (MERGE upsert, SCD2 history),
    # phrase retrieval, path analysis
    "merge_upsert_orders",
    "scd2_user_history",
    "search_phrase",
    "events_top_paths",
    # round 7c: batch phrase table, GDPR-purged log scan, experiment
    # readout, daily anomaly z-scores
    "search_phrase_multi",
    "kafka_log_purged_scan",
    "events_ab_test",
    "events_anomaly_days",
    "events_cohort_ltv",
    "text_entropy",
    # round 8: bucket-pruned MERGE against the sharded snapshot store,
    # the approx (Expand-free) table profile, the serving-codec ANN
    # probe, growth accounting, mergeable histogram quantiles, and the
    # cluster-keyed leakage-safe split
    "merge_upsert_orders_sharded",
    "profile_orders_approx",
    "sim_topk_ivfpq_serving",
    "events_lifecycle",
    "events_value_quantiles",
    "split_leakage_safe",
    "events_rfm_segments",
    # round 8b: compacted-topic point read (keyed log + bloom index are
    # pre-staged in warmup since r9 — Kafka writes the log, the index is
    # built at ingest; cold times the READ) and the sweep-line
    # peak-concurrency curve (distributed exact cumsum)
    "kafka_key_lookup",
    "events_peak_concurrency",
    # round 9: distributed point read for key tables, log-scale quantile
    # sketch, rolling HLL merge. (stream_enrich_latest stays a gate row
    # but is not benched — like every stream_* row, its wall time is
    # file-trigger replay overhead, not a batch scale path.)
    "kafka_key_lookup_spark",
    "events_value_quantiles_log",
    "events_hll_rolling_users",
    "events_forecast_holt",
    "events_audience_rule",
    "kafka_key_history",
    # pairs_contrastive_mining is gate-only: its oracle-verifiable form
    # is the anchors x corpus brute force (verification scale, like
    # every brute-force counterpart); the benched form is the indexed
    # miner below (round 10 — hard leg via the IVF-PQ probe).
    "pairs_contrastive_indexed",
    # round 10: rollup+tail serving (store maintenance is the
    # ingest-time job and is pre-staged in warmup — cold times the
    # SERVE: stored cells + pushdown-pruned tail), the Confluent-framed
    # catalog scan, and the embedding post-processing passes.
    # stream_serve_rollup / avro_confluent_wire_roundtrip stay
    # gate-only (stream-replay / python-encode fixture overhead is not
    # a batch scale path).
    "events_serve_rollup_tail",
    "events_serve_rollup_distinct",
    "catalog_confluent_wire_agg",
    "embeddings_dim_stats",
    "embeddings_whiten_topvar",
    "embeddings_covariance_probe",
    "embeddings_matryoshka16",
    "events_serve_rollup_quantiles",
    "sql_over_serving_view",
    "events_serve_rollup_day",
    "events_serve_rollup_stats",
    # round 11: pull query by group key — stored side reads only
    # matching parquet row groups, tail side filters cells pre-merge —
    # and the GDPR-repaired serve (store maintenance + purge + repair
    # are ingest-time jobs, pre-staged in warmup; cold times the serve).
    # stream_confluent_wire_agg / stream_confluent_wire_evolving_agg
    # stay gate-only (stream-replay fixture overhead, like every
    # stream_* row).
    "events_serve_rollup_keyed",
    "events_serve_rollup_repair",
    # the Druid-style exact topN tile over per-(day,user) count cells
    # (round 13: served with the ADAPTIVE prune gate — fixture-scale
    # stores go straight to the window, entity-scale stores keep the
    # Arrow pre-prune; SCALE_NOTES §r13-topn-adaptive)
    "events_serve_rollup_topn",
    # round 13: sim_topk_stream_batch_upsert stays gate-only like every
    # stream_* row — its wall time is streaming-replay fixture overhead
    # (one availableNow trigger + a hook-injected concurrent batch
    # upsert), not a batch scale path; the benched ANN probe paths
    # already time the identical pruned-probe plan.
    # The real compressed-image decode (zlib inflate + unfilter per
    # asset inside mapInPandas) IS a batch scale path — per-asset
    # parallel, payloads never leave their partition.
    "multimodal_png_decode",
]

#: Indexed-ANN queries whose cost is two phases with different lifecycles:
#: the index build runs once at ingest, the probe runs per search. The
#: bench stages the (process-cached) index FIRST and times it as build_s,
#: then times the query run as the pure probe — the query's headline cold
#: number stays build+probe (unchanged round-over-round semantics), and
#: the compact line carries the split (VERDICT r6 next-4).
ANN_STAGERS = {}


def _register_ann_stagers() -> None:
    from presto_rakam_kafka_spark.operators import similarity as sim
    from presto_rakam_kafka_spark.queries import _t

    DIM = 64

    def _indexed(spark):
        emb = _t(spark, SF_DIR, "embeddings")
        sim.stage_ivfpq_index(spark, emb, SF_DIR, "embedding", "vec_id", dim=DIM)

    def _refined(spark):
        emb = _t(spark, SF_DIR, "embeddings")
        sim.stage_ivfpq_index(
            spark, emb, SF_DIR, "embedding", "vec_id", dim=DIM,
            store_vectors=True,
        )

    def _upserted(spark):
        from pyspark.sql import functions as F

        emb = _t(spark, SF_DIR, "embeddings")
        sim.stage_ivfpq_index_upserted(
            spark,
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            SF_DIR,
            "embedding",
            "vec_id",
            dim=DIM,
        )

    ANN_STAGERS["sim_topk_ivfpq_indexed"] = _indexed
    ANN_STAGERS["sim_topk_ivfpq_refined"] = _refined
    ANN_STAGERS["sim_topk_ivfpq_upsert"] = _upserted
    # the serving-codec probe reuses the refined row's stored-vector
    # index (same stage_ivfpq_index geometry), so its query run times
    # the pure pandas-codec probe
    ANN_STAGERS["sim_topk_ivfpq_serving"] = _refined
    # the indexed miner probes the same stored-vector index, so its
    # query run times hard-leg probe + rand-leg draws, not the build
    ANN_STAGERS["pairs_contrastive_indexed"] = _refined

#: The round-3-era query set, frozen: every round reports this subtotal
#: unchanged so round-over-round comparisons never mix query-set drift
#: with code/box drift (the canary separates box drift; this separates
#: set drift — VERDICT r4 item 7).
SHARED = [
    "flagship_offset_agg",
    "count_many_splits",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "join_broadcast",
    "join_semi",
    "agg_distinct",
    "window_rank",
    "topk_parts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_lsh",
    "text_stats",
    "text_fingerprint",
    "multimodal_features",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _isolate_main() -> None:
    """Run each SHARED query in its own subprocess (fresh JVM per query)
    and print a JSON comparison line. One-time receipt for SCALE_NOTES
    §bench-isolation: separates JVM-state effects (codegen cache, heap
    debt from earlier queries) from plan effects."""
    import subprocess

    iso_cold: dict[str, float] = {}
    iso_warm: dict[str, float] = {}
    for name in SHARED:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        iso_cold[name] = rec["value"]
        iso_warm[name] = rec["warm_value"]
    print(
        json.dumps(
            {
                "metric": "shared_isolated",
                "unit": "sec",
                "sf": _sf_from_dir(SF_DIR),
                "iso_cold": iso_cold,
                "iso_warm": iso_warm,
                "iso_cold_total": round(sum(iso_cold.values()), 3),
                "iso_warm_total": round(sum(iso_warm.values()), 3),
            }
        )
    )


def main() -> None:
    from presto_rakam_kafka_spark import queries as Q
    from presto_rakam_kafka_spark.fixtures import sweep_staging
    from presto_rakam_kafka_spark.session import get_spark

    # age-keyed staging sweep BEFORE the cold pass: stale staging from
    # prior gate/bench runs inflated the r8 non-shared tail ~15%
    # (4.6 GB of /tmp debris — SCALE_NOTES §r8-bench-drift); the
    # harness now cleans up after its predecessors instead of absorbing
    # them into the round-over-round diff (VERDICT r8 #6)
    swept = sweep_staging()

    only: list[str] | None = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    spark = get_spark(app_name="bench")
    names = [n for n in HEADLINE if n in Q.QUERIES]
    if only is not None:
        names = [n for n in names if n in only]

    # Warmup: JVM + whole-stage-codegen compile + parquet footer reads +
    # catalog registration (schema reads happen once per cluster
    # lifetime, not per query).
    from presto_rakam_kafka_spark.fixtures import load_catalog

    load_catalog(spark, SF_DIR)
    Q.QUERIES["count_star"](spark, SF_DIR).collect()
    # Pre-build the (process-cached) segment-log fixture so the native-
    # source queries time the SCAN, not the one-time log construction —
    # production logs are written by Kafka, not by the query.
    from presto_rakam_kafka_spark import queries_dsv2 as _qd

    # ALL staged-fixture construction is timed here as ``staging_s``
    # and reported separately (VERDICT r10 #5): r10 billed the purged /
    # compacted log builds (write_segments + purge rewrite + bloom and
    # index builds) to the first query that touched them, which made
    # `kafka_log_purged_scan` read 1.98→4.91 s round-over-round with an
    # unchanged plan. Production logs are written by Kafka and their
    # indexes at ingest; the bench queries time scan+plan.
    t_staging = time.perf_counter()
    log_dir = _qd._segment_log_dir(spark, SF_DIR)
    # same rationale for the KEYED log + its bloom index: Kafka writes
    # the log and the index is built at ingest (build_key_blooms /
    # update_key_blooms per trigger); the point-read queries should time
    # the READ, not the one-time fixture construction
    _qd._keyed_log_dir(spark, SF_DIR)
    _qd._compacted_log_dir(spark, SF_DIR)
    _qd._purged_log_dir(spark, SF_DIR)
    # the Confluent-framed log and the serving stores follow the same
    # rule: fixture/ingest construction happens at warmup (maintenance
    # is the ingest-time job — the streaming fold owns it in
    # production); the benched serve queries time cells + live tail.
    # The query calls below run maintenance eagerly but leave the
    # serve DataFrame lazy (nothing is collected here).
    _qd._wire_segment_log_dir(spark, SF_DIR)
    _qd.events_serve_rollup_tail(spark, SF_DIR)
    _qd.events_serve_rollup_distinct(spark, SF_DIR)
    _qd.events_serve_rollup_quantiles(spark, SF_DIR)
    _qd.events_serve_rollup_stats(spark, SF_DIR)
    _qd.events_serve_rollup_repair(spark, SF_DIR)
    _qd.events_serve_rollup_topn(spark, SF_DIR)
    staging_s = round(time.perf_counter() - t_staging, 3)
    # Warm the Python DataSource worker path too (separate worker kind
    # from the Arrow pool below): one tiny kafka_segments scan pays the
    # planner/worker spin-up that a long-lived cluster pays once.
    from presto_rakam_kafka_spark.sources.kafka_datasource import (
        KafkaSegmentDataSource,
    )

    spark.dataSource.register(KafkaSegmentDataSource)
    (
        spark.read.format("kafka_segments")
        .option("path", log_dir)
        .load()
        .limit(1)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # Warm the Arrow/Python worker pool (workers are reused across
    # queries — a long-lived cluster pays this once, not per query).
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # Box-speed canary: a fixed pure-Spark microbenchmark with no
    # dependence on this repo's code or the testdata. When the canary
    # shifts between rounds, environment drift (slower box, contention)
    # is separable from code drift without forensic normalization — the
    # round-3 verdict had to reconstruct a uniform 1.4-1.9× env slowdown
    # from unchanged-plan queries; this field answers it directly.
    def _canary() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id) AS s").write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    canary_cold = _canary()
    canary_warm = _canary()

    def _run(name: str) -> float:
        t0 = time.perf_counter()
        Q.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # Frozen shared set first — cold then warm — so its warm pass sees
    # an identical JVM state every round (only the 20 shared queries'
    # generated classes, never the growing non-shared tail). Second
    # pass over the same queries: every generated class is JIT-compiled,
    # so warm measures steady-state executor throughput — what a
    # long-lived cluster sees after the first run of a recurring
    # pipeline. Cold stays the primary metric for round-over-round
    # comparability; warm separates one-time driver/JIT cost from
    # per-byte work that actually scales with data volume.
    shared_names = [n for n in SHARED if n in names]
    rest_names = [n for n in names if n not in SHARED]
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in shared_names:
        timings[name] = _run(name)
    for name in shared_names:
        warm[name] = _run(name)
    _register_ann_stagers()
    ann_phases: dict[str, dict[str, float]] = {}
    for name in rest_names:
        if name in ANN_STAGERS:
            # build first (fills the process cache), then the query run
            # is the pure partition-pruned probe; headline cold stays
            # build+probe, the split goes to ann_phases.
            t0 = time.perf_counter()
            ANN_STAGERS[name](spark)
            build_s = round(time.perf_counter() - t0, 3)
            probe_s = _run(name)
            timings[name] = round(build_s + probe_s, 3)
            ann_phases[name] = {"build_s": build_s, "probe_cold_s": probe_s}
        else:
            timings[name] = _run(name)
    for name in rest_names:
        warm[name] = _run(name)
        if name in ann_phases:
            ann_phases[name]["probe_warm_s"] = warm[name]

    total = round(sum(timings.values()), 3)
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
        "warm_value": round(sum(warm.values()), 3),
        "n_queries": len(timings),
        "shared_total": round(
            sum(timings[n] for n in SHARED if n in timings), 3
        ),
        "shared_warm": round(sum(warm[n] for n in SHARED if n in warm), 3),
        "canary_range_sum_cold": canary_cold,
        "staging_s": staging_s,
        "staging_swept": swept,
        "canary_range_sum_warm": canary_warm,
    }
    if ann_phases:
        summary["ann_phases"] = ann_phases
    # Detailed line (humans + repo-local analysis) ...
    print(json.dumps({**summary, "queries": timings, "queries_warm": warm}))
    # ... then the FINAL COMPACT line: the driver keeps (and parses from)
    # only the last ~2000 chars of output — r5's oversized single line
    # was head-truncated in the stored tail and recorded ``parsed: null``
    # (VERDICT r5 "What's wrong" #1), so the last line must be a complete
    # JSON object that fits the window WITH slack. VERDICT r13 #2 asks
    # for the per-query map inside this final line so the driver can
    # populate PERF per_query/scaling; the full 97-query map with these
    # names is >2600 chars and cannot fit, so we fold in a prefix of the
    # map — most expensive queries first (the rows perf comparison cares
    # about) — under a hard total-line budget, and flag the remainder
    # with ``queries_omitted``. The complete map stays on the detailed
    # line above and in the committed bench_runs/ artifacts.
    budget = 1960
    fixed = len(json.dumps(summary)) + len(', "queries": {}, "queries_omitted": 99')
    qline: dict[str, float] = {}
    used = 0
    for name in sorted(timings, key=lambda n: -timings[n]):
        cost = len(json.dumps({name: timings[name]}))  # entry + ", "
        if fixed + used + cost > budget:
            break
        qline[name] = timings[name]
        used += cost
    print(
        json.dumps(
            {
                **summary,
                "queries": qline,
                "queries_omitted": len(timings) - len(qline),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    if "--isolate" in sys.argv:
        _isolate_main()
    else:
        main()
