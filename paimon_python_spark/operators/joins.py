"""Join rewrites for conditions Spark has no native optimization for.

The plain interval join ``l JOIN r ON l.k = r.k AND r.ts BETWEEN
l.ts+lower AND l.ts+upper`` compiles to an equi-join on ``k`` with the
range as a POST-JOIN filter — per key, every l×r pair materializes
before the range prunes it. One heavy key (a bot user, a hot device)
makes that task quadratic. :func:`binned_interval_join` adds the time
dimension to the equi-key: bin the time axis at the window width, so a
row only meets rows in its own and the adjacent bin — per-task work
becomes O(pairs that are actually close in time), and the residual
filter restores exact semantics. This is the classic range-join
optimization (Databricks exposes it as a RANGE_JOIN hint; vanilla
Spark needs the rewrite spelled out).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on ``on`` AND
    ``left_ts + lower <= right_ts <= left_ts + upper`` (inclusive,
    integer timestamps), rewritten as an equi-join.

    Bin width = window width, so each left row's window spans ≤ 2 bins:
    the left side is exploded into those (≤2×, dedup'd), the right side
    gets its single bin, the join keys become ``on + [bin]``, and the
    exact range predicate runs as a residual filter. Results are
    IDENTICAL to the plain formulation (the gate checks
    ``events_interval_join_binned`` against the plain-join oracle);
    only the join's work distribution changes.

    Column names must be disjoint apart from ``on`` (rename first, as
    with any self-join)."""
    if upper < lower:
        raise ValueError(f"empty interval: lower={lower} > upper={upper}")
    w = upper - lower + 1
    lb = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(w))
    ub = F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(w))
    binned_l = left.withColumn(
        "__bin", F.explode(F.array_distinct(F.array(lb, ub)))
    )
    binned_r = right.withColumn("__bin", F.floor(F.col(right_ts) / F.lit(w)))
    return (
        binned_l.join(binned_r, [*on, "__bin"])
        .filter(
            (F.col(right_ts) >= F.col(left_ts) + F.lit(lower))
            & (F.col(right_ts) <= F.col(left_ts) + F.lit(upper))
        )
        .drop("__bin")
    )
