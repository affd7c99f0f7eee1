"""Scale-safe EXACT global ranking — no single-partition WindowExec.

A window with ``ORDER BY`` and no ``PARTITION BY`` (or a handful of hot
partition keys) makes Spark move every row of the frame into ONE reduce
task ("Moving all data to a single partition" — WindowExec's own
warning). Correct at sf0.01; a 100-TB scan through one task at scale.

``scalable_rank`` computes the same exact ranks distributed:

1. Bucket rows by the FIRST order column against a broadcast boundary
   array derived from ``approx_percentile`` — accuracy only affects
   balance, never correctness, because every row with the same leading
   value lands in the same bucket and buckets are range-ordered.
2. One hash shuffle on ``(partition_cols, bucket)`` gives bucket-local
   ``row_number`` via an ordinary (well-partitioned) window.
3. Per-bucket counts aggregate to ≤ ``groups × num_buckets`` rows —
   bounded by construction — which the driver turns into cumulative
   offsets and group totals, broadcast-joined back.
4. ``global_rn = offset + local_rn``; ``percent_rank``/``cume_dist``/
   ``ntile`` are then closed-form expressions over ``(rn, n)``.

Requires a TIE-FREE total order (include a unique key as the last
order column) so ``rank == row_number`` — both engines then agree
bit-for-bit on the derived ratios.

Parity target: the reference exposes ranking through its SQL surface
(see SURVEY.md §2.4 key-ordered output); this operator exists so the
engine's ranking queries keep exact semantics WITHOUT the reference's
single-node luxury of a global sort in one process.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["scalable_rank"]


def _ntile_expr(rn: Column, n: Column, tiles: int) -> Column:
    """Spark/ANSI ntile: ``n`` rows into ``tiles`` buckets, the first
    ``n % tiles`` buckets one row larger."""
    base = F.floor(n / tiles)
    rem = n % tiles
    big = rem * (base + 1)
    return (
        F.when(rn <= big, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - big - 1) / base) + 1)
        .cast("int")
    )


def scalable_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    *,
    num_buckets: int = 64,
    row_number_col: Optional[str] = "row_number",
    percent_rank_col: Optional[str] = None,
    cume_dist_col: Optional[str] = None,
    ntile: Optional[int] = None,
    ntile_col: str = "ntile",
) -> DataFrame:
    """Exact distributed ``row_number``/``percent_rank``/``cume_dist``/
    ``ntile`` over a tie-free total order, without a single-partition
    window. See module docstring for the plan shape.

    ``order_cols`` must make rows unique within each partition group
    (append a key column); ascending order only — wrap a descending
    sort key as a negated/inverted column first.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    lead = order_cols[0]
    pcols = list(partition_cols)

    # 1. boundary array from a single approx-percentile aggregate
    fracs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(
        F.percentile_approx(lead, F.array(*[F.lit(f) for f in fracs]), 10_000).alias(
            "b"
        )
    ).first()
    bounds = sorted(set(row["b"] or []))
    if bounds:
        # plain CASE-WHEN sum, not a higher-order filter() — a lambda
        # capturing the outer column hit a nondeterministic Catalyst
        # binding error under AQE broadcast reordering; this form stays
        # inside whole-stage codegen and has no capture at all
        bucket = sum(
            (F.when(F.col(lead) >= F.lit(b), 1).otherwise(0) for b in bounds),
            F.lit(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("__rk_bucket", bucket.cast("int"))

    # 2. bucket-local row numbers — the one (well-keyed) shuffle
    w = W.partitionBy(*pcols, "__rk_bucket").orderBy(*order_cols)
    local = bucketed.withColumn("__rk_local", F.row_number().over(w))

    # 3. offsets: bounded aggregate (groups × buckets rows) → driver
    counts = (
        bucketed.groupBy(*pcols, "__rk_bucket")
        .agg(F.count("*").alias("__rk_cnt"))
        .collect()
    )
    by_group: dict = {}
    # None-safe ordering: partition columns may hold NULLs, and Python
    # can't compare None against non-None — NULL groups sort first
    for r in sorted(
        counts,
        key=lambda r: (
            [(r[c] is not None, r[c]) for c in pcols],
            r["__rk_bucket"],
        ),
    ):
        key = tuple(r[c] for c in pcols)
        by_group.setdefault(key, []).append((r["__rk_bucket"], r["__rk_cnt"]))
    off_rows = []
    for key, lst in by_group.items():
        running, total = 0, sum(c for _, c in lst)
        for b, c in lst:
            off_rows.append(tuple(key) + (b, running, total))
            running += c
    from pyspark.sql import types as T

    spark = df.sparkSession
    off_schema = T.StructType(
        list(bucketed.select(*pcols, "__rk_bucket").schema.fields)
        + [
            T.StructField("__rk_off", T.LongType()),
            T.StructField("__rk_n", T.LongType()),
        ]
    )
    from paimon_python_spark._localdf import local_df

    offsets = F.broadcast(
        local_df(spark, off_rows, off_schema, max_slices=1).alias("__rk_offs")
    )

    # eqNullSafe on the partition columns: a name-list join uses
    # null-UNSAFE equality and would silently drop NULL groups
    left = local.alias("__rk_loc")
    cond = F.col("__rk_loc.__rk_bucket") == F.col("__rk_offs.__rk_bucket")
    for c in pcols:
        cond = cond & F.col(f"__rk_loc.{c}").eqNullSafe(F.col(f"__rk_offs.{c}"))
    out = left.join(offsets, cond).select(
        "__rk_loc.*", "__rk_offs.__rk_off", "__rk_offs.__rk_n"
    )
    rn = F.col("__rk_off") + F.col("__rk_local")
    n = F.col("__rk_n")
    if row_number_col:
        out = out.withColumn(row_number_col, rn)
    if percent_rank_col:
        out = out.withColumn(
            percent_rank_col,
            F.when(n > 1, (rn - F.lit(1)).cast("double") / (n - F.lit(1)))
            .otherwise(F.lit(0.0)),
        )
    if cume_dist_col:
        out = out.withColumn(cume_dist_col, rn.cast("double") / n)
    if ntile is not None:
        out = out.withColumn(ntile_col, _ntile_expr(rn, n, ntile))
    return out.drop("__rk_bucket", "__rk_local", "__rk_off", "__rk_n")
