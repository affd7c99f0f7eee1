"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["widen"]


_BYTES_PER_PART = 4 << 20  # 4 MiB of input per fanned-out partition


def widen(df: DataFrame, max_parts: int | None = None) -> DataFrame:
    """Spread heavy per-row compute (shingling, signatures, binary
    decode in ``mapInPandas``) across the session's parallelism when
    the input arrives NARROW — a single small parquet file plans as
    one partition, so an Arrow-batched pipeline would run on 1 of 32
    cores, and a downstream ``orderBy`` would re-execute the whole
    single-lane pipeline a second time for range-boundary sampling
    (measured 2× on the sf0.1 minhash/containment and image-resize
    gates). At lake scale inputs arrive in hundreds of splits and this
    is a no-op; both checks below are plan metadata, no job.

    The fan-out is BYTE-SCALED: ``min(defaultParallelism,
    bytes/4MiB+1)`` from the optimizer's size estimate, so a sub-MB
    frame fans to 2-3 partitions instead of 32 — at tiny inputs the
    per-task scheduling overhead of 32-way stages dominated the very
    compute the fan-out buys (measured 1.58s -> 1.25s on the sf0.1
    minhash gate), while at real scale the byte count saturates the
    parallelism cap and the behavior is unchanged.

    ``max_parts`` caps the fan-out for overhead-bound stages (light
    per-row compute where each extra python-runner task costs more
    than it parallelizes — the multimodal synths measured fastest at
    8); heavy stages (shingling) omit it and take full parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if max_parts is not None:
        # an explicit cap means the CALLER tuned the fan-out for its
        # per-row compute (e.g. image synthesis measured fastest at 8)
        # — input bytes don't predict that cost, so no byte scaling
        target = min(target, max_parts)
    else:
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            target = min(target, size // _BYTES_PER_PART + 1)
        except Exception:
            pass  # no estimate (e.g. non-JVM-backed plan): full fan-out
    target = max(2, target)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < max(2, target // 2) else df
