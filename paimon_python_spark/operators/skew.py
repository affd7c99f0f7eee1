"""Skew-handling utilities: salted joins and skew-free aggregation
shapes.

Spark's AQE re-plans skewed SORT-MERGE joins at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py), but AQE
cannot split a skewed key inside a streaming stage, a cached exchange,
or an aggregation whose heavy key concentrates on one task. These
helpers make the fix explicit and deterministic:

- :func:`with_salt` — a deterministic salt column (hash-derived, no
  RNG: replayable, engine-portable, stable under retries — a random
  salt breaks task-retry idempotence);
- :func:`salted_join` — replicate the SMALL side ``salt_n``× so the
  big side's heavy keys spread over ``salt_n`` tasks; semantically
  identical to the plain join (the oracle for ``join_salted_skew``
  IS the plain join);
- :func:`exact_distinct_per_key` — two-stage exact distinct whose
  first shuffle keys on ``(key, value)`` — high-cardinality by
  construction, so one heavy key cannot pin a task.

Scale rules of thumb: salt_n ≈ (heaviest key's row share) ×
(cluster tasks); salting costs a small-side blow-up of salt_n×, so
keep the replicated side broadcast-sized or bucket it.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    salt_n: int,
    cols: Optional[Sequence[str]] = None,
    out_col: str = "__salt",
) -> DataFrame:
    """Add a deterministic salt in ``[0, salt_n)`` derived from
    ``cols`` (default: every column). Deterministic ⇒ a retried task
    recomputes the same salt (a ``rand()`` salt can double-count rows
    across retries) and any engine can reproduce the assignment."""
    use = list(cols) if cols else list(df.columns)
    return df.withColumn(
        out_col,
        F.pmod(F.hash(*[F.col(c) for c in use]), F.lit(salt_n)).cast("int"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: List[str],
    salt_n: int = 16,
    how: str = "inner",
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Join a skew-keyed big side to a small side with explicit
    salting: the big side gets a deterministic salt from its non-key
    columns, the small side is replicated ``salt_n``× (one copy per
    salt value), and the join keys become ``on + [salt]`` — a heavy
    key's rows now land on ``salt_n`` tasks instead of one.

    Semantics are EXACTLY the plain ``big.join(small, on, how)`` for
    ``inner`` and ``left`` joins (each big row still matches each
    small row once — it meets the one replica carrying its own salt).
    Right/full joins would need null-salt handling on unmatched small
    rows; they are rejected.

    The replicated small side stays ``salt_n × |small|`` rows — keep
    that broadcast-sized (the explode is generated, never collected).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_src = salt_cols or [c for c in big.columns if c not in on]
    if not salt_src:
        raise ValueError("salted_join: need at least one non-key column to salt on")
    salted_big = with_salt(big, salt_n, cols=salt_src)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return salted_big.join(replicated, [*on, "__salt"], how).drop("__salt")


def exact_distinct_per_key(
    df: DataFrame, keys: List[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact count-distinct per key without a skew-prone shuffle: the
    first stage dedups on ``(keys, value)`` — that shuffle partitions
    on the *compound* key, which is high-cardinality even when one key
    holds most rows — and the second stage counts per key, where each
    key now contributes only its distinct values. The naive
    ``groupBy(keys).agg(countDistinct)`` ships every raw row of a
    heavy key to one task first.

    NULL handling matches ``countDistinct`` exactly: the distinct
    stage may keep one ``(key, NULL)`` row per key, but the second
    stage counts ``value_col`` itself (``count(col)`` skips NULLs),
    so NULL never counts as a distinct value and an all-NULL key
    still surfaces with ``out_col = 0``."""
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(value_col)).cast("long").alias(out_col))
    )
