#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the noop sink (no driver collect, no
result materialization cost — pure engine time).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q16_supplier_cnt",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "paimon_pk_upsert_roundtrip",
    "window_topk_per_group",
    "rollup_agg",
    "agg_count_distinct",
    "mor_latest_by_key",
    "events_tumbling_window",
    "events_sessionize",
    "events_asof_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_stats",
    "text_lang_id",
    "text_fingerprint",
    "text_repetition_stats",
    "text_quality_filter",
    "events_retention_cohorts",
    "ann_topk_cosine",
    "ann_lsh_bucket",
    "sketch_quantile_summary",
    "sketch_histogram",
    "sketch_approx_distinct",
    "sample_split_assign",
    "sample_stratified",
    "sample_corpus_mix",
    "text_contamination",
    "pack_sequences",
    "events_anomaly_zscore",
    "dedup_containment",
    "text_unigram_surprisal",
    "text_length_band_filter",
    "sketch_hll_union_sliding",
    "mm_audio_features",
    "dedup_semantic",
    "emb_vector_quality",
    "dedup_url_normalized",
    "events_topk_per_window",
    "pipeline_quality_dedup_tokens",
    "join_salted_skew",
    "events_interval_join_binned",
    "events_moving_window_agg",
    "text_line_filter",
    "dedup_paragraph_exact",
    "profile_table_columns",
    "sample_token_budget_mix",
    "dedup_fuzzy_survivors",
    "ann_pq_rerank",
    "mm_image_resize",
    "dedup_embedding_cosine_lsh",
    "dedup_ngram_jaccard_capped",
    "paimon_dv_roundtrip",
    # r6 additions: the new lake read paths
    "paimon_lake_dv_roundtrip",
    "paimon_lake_evolution_roundtrip",
    "paimon_import_history_roundtrip",
    # r7 additions: the engine-as-lake-participant write surface.
    # (compact/stream-sink roundtrips are correctness-gated but sit out
    # of the bench: their cost is 5 snapshot commits of protocol
    # latency, not query throughput — the maintenance roundtrip is the
    # representative multi-commit lake write here)
    "paimon_lake_pk_write_roundtrip",
    "paimon_lake_maintenance_roundtrip",
    # lookup-producer write (one commit + keyed semi-join changelog
    # derivation) and metadata-only partition expiration — the two new
    # write paths with interesting throughput shapes; the input/
    # full-compaction changelog gates sit out (byte-copy / compaction
    # protocol latency, same rationale as compact above)
    "paimon_lake_lookup_changelog_roundtrip",
    "paimon_lake_partition_expire_roundtrip",
    "window_ntile_quartile",
    "dedup_substring_spans",
    "dedup_contaminated_spans",
    "dedup_excise_contaminated",
    # r8 additions: bucket pruning, footer-stats pruning, tag-window
    # incrementals, and the persisted-index incremental dedup — the
    # point-lookup / ingest shapes whose throughput the round targets.
    # (auto-compact and the stream start modes are correctness-gated
    # but sit out: their cost is multi-commit protocol latency.)
    "paimon_lake_bucket_pruned_point_read",
    "paimon_lake_append_stats_prune_roundtrip",
    "paimon_lake_between_tags_roundtrip",
    "dedup_minhash_incremental_lake",
    "paimon_lake_bucket_local_merge_roundtrip",
    "paimon_lake_format_roundtrip",
    "paimon_lake_format_dv_roundtrip",
    "paimon_lake_format_write_roundtrip",
    "paimon_lake_manifest_skip_roundtrip",
    "pipeline_incremental_ingest",
    "mm_audio_spectral",
    # r9: dynamic-bucket and cross-partition PK writes (hash-index
    # routing / retraction-emitting moves — the two modes the reference
    # refuses; their cost shape is the index join + capacity assignment
    # + state lookup, worth tracking per-round)
    "paimon_dynamic_bucket_roundtrip",
    "paimon_cross_partition_roundtrip",
    # r10: the PK/overwrite front-door writes (lake + engine) and the
    # exact bitmap file index — new prune/route shapes worth tracking
    "paimon_lake_format_pk_write_roundtrip",
    "paimon_lake_bitmap_index_roundtrip",
    "paimon_lake_bsi_index_roundtrip",
    "paimon_engine_exact_index_roundtrip",
    "paimon_datasource_pk_write_roundtrip",
    # late-r10: aggregation merge-engine extension (retraction math,
    # sketch-union fields) — the CDC rollup + pre-sketched-shard shapes
    "paimon_agg_retract_roundtrip",
    "paimon_agg_sketch_roundtrip",
    # third r10 session: event-time merge order, the data-scale audit
    # scan, and the batch incremental window through the front door
    "paimon_sequence_field_roundtrip",
    "paimon_lake_audit_log_roundtrip",
    "paimon_format_incremental_roundtrip",
    # r11: ANALYZE statistics, the concurrent-commit protocol gate, and
    # the bloom-prefiltered decontamination twin
    "paimon_analyze_stats_roundtrip",
    "paimon_concurrent_commit_roundtrip",
    "text_contamination_bloom",
    "text_corpus_overlap",
    "paimon_auto_tag_roundtrip",
]

#: executions per query; the reported time is the MEDIAN. Run 1 pays
#: one-time JIT + codegen (measured 3-9x steady state), machine-load
#: wobble moves any single run by ±10% (PLANS.md: 76.5-84.5 s observed
#: over two hours for the same 85 queries) — the median of 3 discards
#: the JIT run AND the loaded outlier, so per-round regression triage
#: compares signal, not load.
RUNS = 3


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from paimon_python_spark.session import configure_builder, set_spark

    # Shuffle partitions track DATA VOLUME, not core count — the same
    # ~64MB-per-reduce-task rule you'd apply on a cluster. At sf0.1
    # (~100MB input) 32 reduce tasks are pure scheduling overhead
    # (measured 19% of shuffle-query wall time); at sf10+ the rule gives
    # back cpus partitions and AQE handles the rest.
    total_mb = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    ) // (1024 * 1024)
    shuffle_parts = max(8, min(int(cpus), int(total_mb) // 64))
    spark = configure_builder(
        SparkSession.builder.master(f"local[{cpus}]").appName("paimon_spark_bench"),
        shuffle_partitions=shuffle_parts,
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    set_spark(spark)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warmup: JVM JIT, codegen, parquet footer caches — not query cost
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.mode(
        "overwrite"
    ).format("noop").save()
    # warm the table write/commit/merge-read codegen paths with a tiny
    # 100-row PK roundtrip (same JIT'd pipeline the paimon_* queries use)
    import shutil
    import tempfile

    from paimon_python_spark import Catalog, Schema

    _wh = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        _cat = Catalog.create({"warehouse": _wh})
        _cat.create_database("default", True)
        _tiny = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
        _cat.create_table(
            "default.warm",
            Schema(_tiny.schema, primary_keys=["k"], options={"bucket": "2"}),
            False,
        )
        _t = _cat.get_table("default.warm")
        for _ in range(2):
            _wb = _t.new_batch_write_builder()
            _w, _c = _wb.new_write(), _wb.new_commit()
            _w.write_dataframe(_tiny)
            _c.commit(_w.prepare_commit())
            _w.close()
            _c.close()
        _t.new_read_builder().new_read().to_df().write.mode("overwrite").format(
            "noop"
        ).save()
    finally:
        shutil.rmtree(_wh, ignore_errors=True)

    # median-of-RUNS per query (see the RUNS note above).
    # fail-soft: one broken query must not zero the whole bench — record
    # the error string, keep timing the rest, always emit the JSON line
    import statistics

    from paimon_python_spark.operators._cache import release_cached

    # PER-QUERY warm pass at the smallest SF (r11 VERDICT: the tiny PK
    # warm-up above misses the DV/commit/bitmap/analyze codegen paths —
    # the FIRST heavy paimon_* query in a process paid ~10s of JIT that
    # BENCH rounds then mis-read as regression). One untimed execution
    # of every headline query at sf0.001 JITs each family's full
    # pipeline for ~KB-scale data cost; timed runs below then compare
    # engine, not JIT.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
            except Exception:  # noqa: BLE001 — warm-up must never break bench
                pass
            finally:
                release_cached()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            errors[name] = "not registered"
            continue
        runs: list[float] = []
        try:
            for _ in range(RUNS):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.time() - t0)
                release_cached()  # free operator-scoped persisted frames
            timings[name] = round(statistics.median(runs), 3)
        except Exception as exc:  # noqa: BLE001 — benchmark must survive
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            release_cached()

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # stdout stays COMPACT so the driver's tail capture never truncates
    # the JSON line's head (r4 lesson: 64 per-query entries overflowed it
    # and the gate read nothing). Top-10 timings inline; the full
    # per-query dict + errors go to bench_details.json next to this file.
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": top10,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "runs_per_query": RUNS,
        "stat": "median",
        "sf": sf_val,
        "details": "bench_details.json",
    }
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": out["value"],
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "runs_per_query": RUNS,
        "stat": "median",
        "sf": sf_val,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_details.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
