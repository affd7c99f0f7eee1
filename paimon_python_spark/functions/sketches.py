"""Sketch-style and distributional aggregates.

The reference delegates all aggregation to DuckDB after the scan
(pypaimon/api/table_read.py:47-56); a 100 TB engine needs the
sub-linear versions built in. Everything here is a single hash
aggregate (map-side partial + final), so shuffle volume is the number
of groups x sketch size, never the row count:

- HLL distinct counts: Spark's ``approx_count_distinct`` (HyperLogLog++,
  fixed xxhash64 seed) — deterministic for a given dataset and rsd,
  mergeable across partitions, ~1.5 KB of state per group instead of a
  distinct-set shuffle.
- Exact interpolated quantiles: ``percentile`` (SQL percentile_cont
  semantics). Exact beats t-digest at test scale and is oracle-checkable;
  at 100 TB swap in ``percentile_approx`` with the same call shape.
- Fixed-width histograms: one ``floor((x - lo) / w)`` bucket expression +
  hash agg; bucket arithmetic is IEEE-double-exact so it hash-matches any
  engine.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F


def group_distinct_sketch(
    df: DataFrame, keys: List[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative error rsd).

    Output: keys..., approx_distinct (long). Genuinely approximate, but
    deterministic for fixed input+rsd: the sketch_approx_distinct gate
    asserts the estimate lands inside a 3·rsd envelope of the exact
    count (SKETCH_APPROX_SQL), and unit tests compare against exact
    countDistinct at small scale — changing rsd or the HLL internals can
    fail that oracle.
    """
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct")
    )


def quantile_summary(
    df: DataFrame, keys: List[str], col: str, probs: Sequence[float] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Per-group interpolated quantiles (percentile_cont semantics),
    one output column per probability: ``p50``, ``p90``, ...

    Uses exact ``percentile`` (single hash agg; state = per-group value
    buffer). At 100 TB call sites should pass a pre-aggregated or
    sampled frame, or swap to ``percentile_approx`` — same output shape.
    """
    aggs = [
        F.round(F.percentile(F.col(col), F.lit(p)), 2).alias(
            f"p{str(p * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        )
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-width histogram over [lo, hi): bucket index, inclusive lower
    bound, and row count. Out-of-range rows clamp into the edge buckets
    (standard width_bucket behavior minus the overflow buckets).
    """
    w = (hi - lo) / nbins
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / w).cast("int")),
    )
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("lo", F.round(F.lit(lo) + F.col("bucket") * w, 2))
        .select("bucket", "lo", "n")
    )


def sliding_distinct_hll(
    df: DataFrame,
    keys: List[str],
    bucket_col: str,
    id_col: str,
    window_buckets: int,
) -> DataFrame:
    """Sliding-window distinct counts via MERGEABLE HLL sketches: one
    sketch per (keys, bucket), then each window unions its
    ``window_buckets`` member sketches — never re-touching raw rows.

    This is THE 100 TB pattern for sliding distinct: an exact
    countDistinct per overlapping window re-shuffles every raw id once
    per window it belongs to (w× data amplification), while sketches
    shrink the shuffle to KB-sized state per bucket and windows merge
    downstream — the same mergeability contract Paimon's aggregation
    merge engine relies on for HLL columns.

    Output: keys..., ``win_end`` (bucket id of the window's last
    bucket), ``n_buckets`` present, ``approx_distinct`` (the unioned
    estimate, deterministic for fixed input). Windows at the stream's
    start cover fewer buckets (standard sliding-window edge).
    """
    hourly = df.groupBy(*keys, bucket_col).agg(
        F.hll_sketch_agg(id_col).alias("__sk")
    )
    contrib = hourly.withColumn(
        "win_end",
        F.explode(
            F.sequence(
                F.col(bucket_col), F.col(bucket_col) + (window_buckets - 1)
            )
        ),
    )
    return (
        contrib.groupBy(*keys, "win_end")
        .agg(
            F.hll_union_agg("__sk").alias("__merged"),
            F.count("*").alias("n_buckets"),
        )
        .withColumn(
            "approx_distinct", F.hll_sketch_estimate("__merged").cast("long")
        )
        .drop("__merged")
    )


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = True
) -> DataFrame:
    """Column-level data profile — one output row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``;
    min/max are stringified so heterogeneous column types share one
    schema (the standard profiling-table shape).

    One aggregate job over a single scan. ``exact_distinct`` uses
    ``countDistinct`` (Spark expands the plan per distinct column —
    exact, fine up to a handful of columns); at 100 TB set it False
    for ``approx_count_distinct`` (HLL — one pass, sketch-sized state,
    no expand)."""
    # column names are interpolated into stack()/CAST SQL below —
    # reject names that would escape the quoting rather than emit
    # broken (or injectable) SQL
    for c in cols:
        if "`" in c or "'" in c:
            raise ValueError(
                f"profile_columns: column name {c!r} contains a quote "
                "character; rename the column first"
            )
    # basic stats: one agg, no distinct — cheap at any width
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__min`, `{c}__max`" for c in cols
    )
    basics = row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, min_value, max_value)"
        )
    )
    # distincts: N distinct-aggregates in ONE agg would trigger Spark's
    # Expand (N-fold row duplication — measured 112x slower than DuckDB
    # at 1.5M rows x 4 columns). Instead stack the columns into narrow
    # (column, value) rows and run a SINGLE countDistinct per group —
    # the planner's two-stage distinct, no Expand. Values stringify for
    # one schema; distinct-on-string == distinct-on-native per column.
    val_args = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    stacked = df.select(
        F.expr(f"stack({len(cols)}, {val_args}) AS (column, value)")
    )
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    nd = stacked.groupBy("column").agg(
        distinct("value").cast("long").alias("n_distinct")
    )
    # LEFT join: on an empty table the stacked frame has zero rows so
    # nd is empty, but every column must still surface (n_rows=0,
    # n_distinct=0) — an inner join would return an empty profile
    return (
        basics.join(nd, "column", "left")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("n_distinct"), F.lit(0).cast("long")).alias(
                "n_distinct"
            ),
            "min_value",
            "max_value",
        )
        .orderBy("column")
    )
