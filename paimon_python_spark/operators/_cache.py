"""Scoped-cache helper for operators that reuse an intermediate frame
across several plan branches (inverted indexes, LSH bucket explosions,
minhash signatures).

Spark recomputes a shared sub-plan once per consuming branch unless it
is persisted, but a lazily-returned DataFrame cannot unpersist its own
inputs (the caller's action happens later). The contract here:

- ``shared(df)`` persists ``df`` LAZILY: the caller's first action
  populates the cache and every later branch reads from it. (Eager
  materialization — ``eager=True`` — costs a whole extra pass over the
  lineage and is only worth it when two actions genuinely race to
  populate the same cache concurrently; r5 measured the unconditional
  eager count as a net regression on single-action pipelines.)
- ``release_cached()`` unpersists every frame registered in the
  CURRENT scope. Call it after consuming an operator's result (the
  oracle harness, bench, and tests do).
- ``cache_scope()`` opens a nested scope: frames registered inside it
  are released when the scope exits (or when ``release_cached`` is
  called inside it), WITHOUT touching an outer scope's live frames —
  two composed-but-unconsumed pipelines no longer release each other's
  caches.

Scopes are per-thread (``threading.local``): concurrent driver threads
composing operators don't see each other's registries at all.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame


class _Scopes(threading.local):
    def __init__(self):
        self.stack: list[list[DataFrame]] = [[]]


_SCOPES = _Scopes()


def _current() -> list[DataFrame]:
    return _SCOPES.stack[-1]


def shared(df: DataFrame, eager: bool = False) -> DataFrame:
    """Persist ``df`` for multi-branch reuse and register it in the
    current cache scope for :func:`release_cached`. Lazy by default —
    the first action populates the cache; pass ``eager=True`` only when
    concurrent actions would otherwise race to build it."""
    df = df.persist()
    _current().append(df)
    if eager:
        df.count()
    return df


def register(df: DataFrame) -> DataFrame:
    """Record an already-persisted frame in the current scope for
    :func:`release_cached` without re-persisting or re-materializing."""
    _current().append(df)
    return df


def release_cached() -> int:
    """Unpersist every frame registered in the CURRENT scope; returns
    how many were released. Safe to call repeatedly."""
    frames = _current()
    n = 0
    while frames:
        df = frames.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


@contextmanager
def cache_scope():
    """Context manager: frames registered inside are released on exit,
    leaving any outer scope's frames cached. Use around one logical
    pipeline when several run interleaved on the same session::

        with cache_scope():
            pairs = minhash_lsh_pairs(docs, ...)
            pairs.write.parquet(...)        # consume INSIDE the scope
        # exiting released only this pipeline's intermediates
    """
    _SCOPES.stack.append([])
    try:
        yield
    finally:
        release_cached()
        _SCOPES.stack.pop()
