"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["widen"]


def widen(df: DataFrame, max_parts: int | None = None) -> DataFrame:
    """Spread heavy per-row compute (shingling, signatures, binary
    decode in ``mapInPandas``) across the session's parallelism when
    the input arrives NARROW — a single small parquet file plans as
    one partition, so an Arrow-batched pipeline would run on 1 of 32
    cores, and a downstream ``orderBy`` would re-execute the whole
    single-lane pipeline a second time for range-boundary sampling
    (measured 2× on the sf0.1 minhash/containment and image-resize
    gates). At lake scale inputs arrive in hundreds of splits and this
    is a no-op; the partition-count check is plan metadata, no job.

    ``max_parts`` caps the fan-out for overhead-bound stages (light
    per-row compute where each extra python-runner task costs more
    than it parallelizes — the multimodal synths measured fastest at
    8); heavy stages (shingling) omit it and take full parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if max_parts is not None:
        target = min(target, max_parts)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < max(2, target // 2) else df
