#!/usr/bin/env python
"""Scale sweep: measure how each representative query's wall time grows
across three decades of data (sf0.01 → sf0.1 → sf1) and write
SCALING.md with fitted per-decade scaling exponents.

sf1 does not exist in /root/testdata, so it is synthesized ONCE into
/tmp/sparkgraft_sf1_synth: every table is the sf0.1 table replicated
10× with entity ids shifted per replica (fact keys shift together so
joins stay consistent; doc/vec ids shift and texts are perturbed so
dedup does not degenerate to one giant group). Dimension tables
(region/nation/customer/part/supplier) keep their original rows —
exactly how a real 10× fact growth behaves against stable dimensions.

Exponent: slope of log10(time) between consecutive decades —
e = log10(t_big / t_small). e ≈ 1 is perfectly linear scaling; e < 1
means fixed overhead still dominates (expected at these toy sizes);
e > 1 flags a super-linear operator that would NOT survive 100 TB.

Usage: python tools/scale_sweep.py [--force-synth]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SYNTH_DIR = "/tmp/sparkgraft_sf1_synth"
SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# (table, id columns to shift per replica, text column to perturb)
FACT_TABLES = {
    "lineitem": (["l_orderkey"], None),
    "orders": (["o_orderkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}
DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]

# representative operator families (name → why it's in the sweep)
SWEEP = [
    ("q1_pricing_summary", "scan + hash agg"),
    ("q3_shipping_priority", "3-way join + agg + topk"),
    ("q18_large_orders", "join + having subquery"),
    ("mor_latest_by_key", "window group-limit (merge-on-read shape)"),
    ("events_sessionize", "session windows (lag + running sum)"),
    ("events_topk_per_window", "windowed agg + rank"),
    ("dedup_exact", "exact dedup hash agg"),
    ("dedup_minhash_lsh", "MinHash LSH banded self-join"),
    ("text_quality_stats", "pure projection pipeline"),
    ("text_contamination", "explode + broadcast semi-join"),
    ("ann_topk_cosine", "brute-force vector topk"),
    ("ann_lsh_bucket", "LSH-bucketed vector topk"),
    ("sample_split_assign", "hash-threshold sampling (no shuffle)"),
    ("join_salted_skew", "salted skew join"),
    ("pipeline_quality_dedup_tokens", "multi-stage pipeline"),
    ("events_moving_window_agg", "RANGE-frame moving aggregate"),
    ("events_interval_join_binned", "binned interval join"),
    ("sample_token_budget_mix", "token-budget corpus mix"),
    ("profile_table_columns", "column profiling (multi-distinct agg)"),
    # r5 additions: the new headliners + table-format roundtrips
    ("dedup_ngram_jaccard_capped", "df-capped exact n-gram Jaccard (persisted index)"),
    ("dedup_embedding_cosine_lsh", "hyperplane-LSH embedding dedup (persisted buckets)"),
    ("paimon_pk_upsert_roundtrip", "PK table write+merge-on-read roundtrip"),
    ("paimon_dv_roundtrip", "deletion-vector write+index+read roundtrip"),
    # r7 additions: distributed exact ranking + lake-participant writes
    ("window_ntile_quartile", "scalable_rank global ntile (no single-partition window)"),
    ("paimon_lake_pk_write_roundtrip", "fixed-bucket PK write into a real lake"),
    ("paimon_lake_maintenance_roundtrip", "lake tag+rollback+expiry (multi-commit maintenance)"),
    # late-r7 additions: span-level dedup family
    ("dedup_substring_spans", "ExactSubstr span dedup (anchor fingerprint shuffle)"),
    ("dedup_excise_contaminated", "span decontamination detect+excise end-to-end"),
    # r9 additions: the new lake surfaces whose plans must survive scale
    ("paimon_lake_lookup_changelog_roundtrip", "lookup-producer CDC commit (point-lookup file pruning)"),
    ("paimon_lake_manifest_skip_roundtrip", "manifest-level partition skipping (planner metadata cost)"),
    ("paimon_lake_format_write_roundtrip", "format() append write + read (Python DataSource)"),
    ("paimon_lake_bucket_local_merge_roundtrip", "no-shuffle bucket-closed PK merge read"),
    # late-r9 additions: the two write modes the reference refuses
    ("paimon_dynamic_bucket_roundtrip", "dynamic-bucket PK writes (hash-index routing + capacity fill)"),
    ("paimon_cross_partition_roundtrip", "cross-partition PK moves (state join + retractions)"),
    # r10 additions: front-door PK writes + exact file indexes
    ("paimon_lake_format_pk_write_roundtrip", "format() PK write (executor murmur routing)"),
    ("paimon_lake_bitmap_index_roundtrip", "exact bitmap file index write + pruned read"),
    ("paimon_lake_bsi_index_roundtrip", "exact bit-sliced index write + pruned read"),
    ("paimon_engine_exact_index_roundtrip", "engine-table exact indexes (zero-split plan)"),
    # third r10 session
    ("paimon_sequence_field_roundtrip", "event-time merge order (struct-ordered dedup window)"),
    ("paimon_lake_audit_log_roundtrip", "data-scale merge-free audit scan via format()"),
    ("paimon_format_incremental_roundtrip", "batch incremental window (per-delta-file partitions)"),
    ("paimon_analyze_stats_roundtrip", "ANALYZE one-pass stats agg + statistic file commit"),
    ("paimon_concurrent_commit_roundtrip", "4-thread CAS-retry commit race"),
    ("text_contamination_bloom", "bloom bitset prefilter + exact confirm-join"),
    ("text_corpus_overlap", "per-gram source-set fold, no gram self-join"),
    ("paimon_auto_tag_roundtrip", "tag-on-commit + with_tag read"),
]


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SYNTH_DIR, exist_ok=True)
    for t in DIM_TABLES:
        # dims: copy through (stable dimensions under 10x fact growth)
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SYNTH_DIR}/{t}.parquet"
        )
    for t, (id_cols, text_col) in FACT_TABLES.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        offsets = {c: df.agg(F.max(F.col(c))).first()[0] + 1 for c in id_cols}
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for c in id_cols:
            rep = rep.withColumn(c, F.col(c) + F.col("__r") * F.lit(offsets[c]))
        if text_col:
            # perturb replicas so exact/fuzzy dedup keeps realistic group
            # sizes instead of collapsing to 10-row clones
            rep = rep.withColumn(
                text_col,
                F.when(F.col("__r") == 0, F.col(text_col)).otherwise(
                    F.concat(
                        F.col(text_col),
                        F.lit(" replica "),
                        F.col("__r").cast("string"),
                    )
                ),
            )
        rep.drop("__r").write.mode("overwrite").parquet(f"{SYNTH_DIR}/{t}.parquet")
    print(f"synthesized {SYNTH_DIR} ({REPLICAS}x facts, stable dims)")


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duckdb_times(
    entrymod, tiers: list[tuple[str, str]], timeout_s: float = 60.0
) -> dict[str, dict[str, float | None]]:
    """Best-of-2 DuckDB wall time for each sweep query's oracle SQL at
    each tier; None = no oracle or exceeded the interrupt guard."""
    import threading

    import duckdb

    oracles = entrymod.oracle_sql()
    out: dict[str, dict[str, float | None]] = {n: {} for n, _ in SWEEP}
    for tier, d in tiers:
        con = duckdb.connect()
        for t in TABLES:
            # Spark-synthesized tiers are directories of part files
            p = f"{d}/{t}.parquet"
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
            )
        for name, _why in SWEEP:
            sql = oracles.get(name)
            if sql is None:
                out[name][tier] = None
                continue
            best: float | None = math.inf
            for _ in range(2):
                timer = threading.Timer(timeout_s, con.interrupt)
                timer.start()
                t0 = time.time()
                try:
                    con.execute(sql).fetchall()
                    best = min(best, time.time() - t0)  # type: ignore[arg-type]
                except duckdb.Error:
                    best = None
                    break
                finally:
                    timer.cancel()
            out[name][tier] = best
            shown = f"{best:7.3f}s" if best is not None else "  >60s/err"
            print(f"duckdb {name:27s} {tier:7s} {shown}", flush=True)
        con.close()
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from paimon_python_spark.session import configure_builder, set_spark

    spark = (
        configure_builder(
            SparkSession.builder.master("local[32]").appName("scale_sweep"),
            shuffle_partitions=32,
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    set_spark(spark)

    if "--force-synth" in sys.argv and os.path.exists(SYNTH_DIR):
        shutil.rmtree(SYNTH_DIR)
    if not os.path.exists(f"{SYNTH_DIR}/lineitem.parquet"):
        synthesize(spark)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    tiers = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", SRC), ("sf1*", SYNTH_DIR)]

    # warm the JVM/codegen once
    spark.read.parquet(f"{SRC}/lineitem.parquet").limit(1000).write.mode(
        "overwrite"
    ).format("noop").save()

    from paimon_python_spark.operators._cache import release_cached

    results: dict[str, dict[str, float]] = {}
    for name, _why in SWEEP:
        fn = qs[name]
        results[name] = {}
        for tier, d in tiers:
            best = math.inf
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
                release_cached()
            results[name][tier] = best
            print(f"{name:34s} {tier:7s} {best:7.3f}s", flush=True)

    # DuckDB single-node comparison on the same parquet at each tier —
    # the reference delegates its relational work to DuckDB, so this IS
    # the baseline. 60s interrupt guard per query (a super-linear
    # oracle at sf1* would otherwise wall the sweep).
    duck = _duckdb_times(entrymod, tiers)

    lines = [
        "# SCALING — wall time across three decades of data (local[32])",
        "",
        "Generated by `tools/scale_sweep.py`. sf1* is sf0.1 with facts",
        "replicated 10× (ids shifted per replica, dims stable — see the",
        "tool docstring). `e` = log10 time ratio per decade: ~1.0 linear,",
        "<1 overhead-dominated, >1 super-linear (a 100 TB red flag).",
        "`duck` columns run the SAME query's DuckDB oracle on the same",
        "parquet (the reference's actual execution engine); `×` is",
        "spark/duck at that tier — watch it fall as data grows and",
        "Spark's per-job floor amortizes.",
        "",
        "| query | family | sf0.01 | sf0.1 | sf1* | e(0.1→1) "
        "| duck sf0.1 | × | duck sf1* | × | verdict |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    worst = []
    for name, why in SWEEP:
        r = results[name]
        t0, t1, t2 = r["sf0.01"], r["sf0.1"], r["sf1*"]
        e2 = math.log10(t2 / t1) if t1 > 0 else float("nan")
        verdict = "OK" if e2 <= 1.15 else "SUPER-LINEAR"
        if e2 > 1.15:
            worst.append(name)
        d1, d2 = duck[name].get("sf0.1"), duck[name].get("sf1*")

        def _fmt(d, s):
            if d is None:
                return "—", "—"
            return f"{d:.3f}s", f"{s / d:.1f}"

        d1s, x1 = _fmt(d1, t1)
        d2s, x2 = _fmt(d2, t2)
        lines.append(
            f"| {name} | {why} | {t0:.3f}s | {t1:.3f}s | {t2:.3f}s "
            f"| {e2:.2f} | {d1s} | {x1} | {d2s} | {x2} | {verdict} |"
        )
    lines += [
        "",
        f"Super-linear at the top decade: {worst if worst else 'none'}.",
        "",
        "Reading: at these sizes sub-second queries are floor-bound by",
        "per-job overhead (~0.2 s), so e < 1 is expected; the signal is",
        "the top decade, where data cost finally exceeds the floor. An",
        "operator whose e(0.1→1) stays ≤ ~1 grows with data, not with",
        "plan pathology — the property that survives the jump to a",
        "1000-executor cluster.",
    ]
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
