"""Scoped-cache helper for operators that reuse an intermediate frame
across several plan branches (inverted indexes, LSH bucket explosions,
minhash signatures).

Spark recomputes a shared sub-plan once per consuming branch unless it
is persisted, but a lazily-returned DataFrame cannot unpersist its own
inputs (the caller's action happens later). The contract here:

- ``shared(df)`` persists AND eagerly materializes ``df`` (one
  ``count()``), so every downstream branch of the returned lazy result
  reads from cache instead of recomputing the lineage. The frame is
  recorded in a module-level registry.
- ``release_cached(spark)`` unpersists every registered frame. Call it
  after consuming an operator's result (the oracle harness, bench, and
  tests do). Long-lived sessions composing many dedup calls should call
  it between batches so executor storage doesn't accumulate.

The registry holds strong references only until release; double
registration of the same plan is idempotent (no "already cached"
warnings, because we only persist frames we just built).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def shared(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist ``df`` for multi-branch reuse and register it for
    :func:`release_cached`. ``eager`` materializes it immediately (one
    count job) so the caller's first action on the composed result hits
    cache in every branch rather than racing to populate it."""
    df = df.persist()
    _PERSISTED.append(df)
    if eager:
        df.count()
    return df


def register(df: DataFrame) -> DataFrame:
    """Record an already-persisted frame for :func:`release_cached`
    without re-persisting or re-materializing it."""
    _PERSISTED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every frame registered by :func:`shared`; returns how
    many were released. Safe to call repeatedly."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
