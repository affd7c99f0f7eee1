"""Multi-dimensional clustering keys: Z-order and Hilbert curves.

Paimon's dedicated compaction action accepts ``--order_strategy
order|zorder|hilbert --order_by a,b`` and rewrites an append table's
files clustered along that curve so per-file min/max stats skip files
for predicates on ANY of the ordered columns, not just the leading one
(paimon.apache.org "Dedicated compaction / sort compact"; the Python
reference has no compactor at all — compaction is delegated JVM-side).
This module implements the curve math Spark-side:

- normalization is **in-plan** (pure ``pyspark.sql.functions``
  expressions: linear min/max scaling for numerics/dates/timestamps,
  a big-endian 2-byte prefix for strings) so Catalyst folds it into
  the scan projection;
- the bit-interleave / Hilbert transpose is a vectorized **Arrow
  pandas_udf** over the already-normalized small ints — pure numpy
  bit twiddling, no per-row Python;
- file-level clustering then comes from ``repartitionByRange`` on the
  curve key: each output task (= one data file) owns a contiguous
  curve segment, so every ordered column's per-file value range is
  narrow. That property is what the manifest min/max skipper
  (paimon_lake stats pruning) exploits at read time.

Scale note: ``repartitionByRange`` samples the key to build range
bounds — one lightweight pass — then a single full shuffle, which is
the theoretical minimum for a global re-clustering of 100 TB. The
curve key is 64 bits regardless of column count (bits are divided
evenly across columns), so shuffle width never grows with dimensions.

The Hilbert transform is John Skilling's public-domain
"Programming the Hilbert curve" (AIP Conf. Proc. 707, 2004)
axes->transpose algorithm, vectorized over numpy arrays.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "add_zorder_key",
    "add_hilbert_key",
    "hilbert_indices",
    "zorder_indices",
]

_MAX_KEY_BITS = 63  # curve key lives in a Spark LongType


def _bits_per_col(n_cols: int) -> int:
    """Divide the 63 usable key bits evenly; 16 bits/column is plenty
    of resolution for file-granular clustering."""
    if n_cols < 1:
        raise ValueError("clustering needs at least one column")
    return max(1, min(16, _MAX_KEY_BITS // n_cols))


def _normalized_columns(
    df: DataFrame, cols: Sequence[str], bits: int
) -> Tuple[DataFrame, List[str]]:
    """Append ``__cl_norm{i}`` int columns scaled to ``[0, 2**bits)``.

    Numeric / date / timestamp columns use linear min/max scaling (one
    small agg job to fetch the bounds — negligible next to the rewrite
    this feeds); strings use their first-2-byte big-endian value, which
    preserves binary prefix order with zero extra passes; NULLs map to
    0 so they cluster together at the curve origin (matching how
    Paimon's z-order treats null as minimal)."""
    top = (1 << bits) - 1
    numeric_like: List[Tuple[str, Column]] = []
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            numeric_like.append((c, F.col(c).cast("double")))
        elif isinstance(dt, T.BooleanType):
            numeric_like.append((c, F.col(c).cast("double")))
        elif isinstance(dt, T.NumericType):
            numeric_like.append((c, F.col(c).cast("double")))
        elif isinstance(dt, T.StringType):
            pass
        else:
            raise ValueError(
                f"clustering column {c!r} has unsupported type {dt.simpleString()}"
            )
    bounds = {}
    if numeric_like:
        aggs = []
        for c, expr in numeric_like:
            aggs.append(F.min(expr).alias(f"mn_{c}"))
            aggs.append(F.max(expr).alias(f"mx_{c}"))
        row = df.agg(*aggs).first().asDict()
        bounds = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c, _ in numeric_like}

    out = df
    names = []
    numeric_exprs = dict(numeric_like)
    for i, c in enumerate(cols):
        name = f"__cl_norm{i}"
        names.append(name)
        if c in numeric_exprs:
            mn, mx = bounds[c]
            if mn is None or mx is None or mx == mn:
                scaled = F.lit(0)
            else:
                scaled = F.floor(
                    (numeric_exprs[c] - F.lit(float(mn)))
                    / F.lit(float(mx) - float(mn))
                    * F.lit(float(top))
                ).cast("long")
            out = out.withColumn(
                name,
                F.coalesce(
                    F.least(F.greatest(scaled, F.lit(0)), F.lit(top)), F.lit(0)
                ),
            )
        else:
            # big-endian 2-byte UTF-8 prefix: hex the encoded string,
            # right-pad to 4 nibbles, truncate, parse base 16 — binary
            # prefix order preserved, entirely JVM-side
            prefix16 = F.conv(
                F.substring(
                    F.rpad(F.hex(F.encode(F.coalesce(F.col(c), F.lit("")), "utf-8")), 4, "0"),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            shift = 16 - bits
            out = out.withColumn(
                name,
                (F.shiftright(prefix16, shift) if shift > 0 else prefix16),
            )
    return out, names


def zorder_indices(coords: np.ndarray, bits: int) -> np.ndarray:
    """Interleave the low ``bits`` bits of each coordinate column
    (``coords``: (n, d) ints) into a single Morton/Z value, column 0
    most significant within each bit group."""
    coords = np.ascontiguousarray(coords, dtype=np.uint64)
    n, d = coords.shape
    out = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for b in range(bits):
        for i in range(d):
            out |= ((coords[:, i] >> np.uint64(b)) & one) << np.uint64(
                b * d + (d - 1 - i)
            )
    return out


def hilbert_indices(coords: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert-curve index of each row of ``coords`` ((n, d) ints in
    ``[0, 2**bits)``): Skilling's axes->transpose (public domain,
    AIP Conf. Proc. 707, 2004) vectorized over numpy, then a plain
    bit interleave of the transposed coordinates."""
    X = np.ascontiguousarray(coords, dtype=np.uint64).copy()
    n, d = X.shape
    if d == 1:
        return X[:, 0].copy()
    one = np.uint64(1)
    M = one << np.uint64(bits - 1)
    # inverse-undo excess work
    Q = M
    while Q > one:
        P = Q - one
        for i in range(d):
            mask = (X[:, i] & Q) != 0
            X[mask, 0] ^= P
            t = (X[:, 0] ^ X[:, i]) & P
            inv = ~mask
            X[inv, 0] ^= t[inv]
            X[inv, i] ^= t[inv]
        Q >>= one
    # Gray encode
    for i in range(1, d):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    Q = M
    while Q > one:
        mask = (X[:, d - 1] & Q) != 0
        t[mask] ^= Q - one
        Q >>= one
    for i in range(d):
        X[:, i] ^= t
    return zorder_indices(X, bits)


def _curve_udf(d: int, bits: int, curve: str):
    import pandas as pd

    fn = hilbert_indices if curve == "hilbert" else zorder_indices

    def _key(*cols):
        coords = np.column_stack(
            [c.to_numpy(dtype=np.uint64, na_value=0) for c in cols]
        )
        return pd.Series(fn(coords, bits).astype(np.int64))

    # no type hints: postponed annotations in this module would reach
    # pandas_udf as unresolvable strings
    return F.pandas_udf(_key, "long")


def add_zorder_key(
    df: DataFrame, cols: Sequence[str], out_col: str = "__cluster_key"
) -> DataFrame:
    """Append a Z-order (Morton) key over ``cols``."""
    return _add_curve_key(df, cols, out_col, "zorder")


def add_hilbert_key(
    df: DataFrame, cols: Sequence[str], out_col: str = "__cluster_key"
) -> DataFrame:
    """Append a Hilbert-curve key over ``cols`` (better locality than
    Z-order: consecutive curve positions are always grid neighbors, so
    per-file bounding boxes are tighter on the trailing columns)."""
    return _add_curve_key(df, cols, out_col, "hilbert")


def _add_curve_key(
    df: DataFrame, cols: Sequence[str], out_col: str, curve: str
) -> DataFrame:
    cols = list(cols)
    bits = _bits_per_col(len(cols))
    normed, names = _normalized_columns(df, cols, bits)
    key = _curve_udf(len(cols), bits, curve)(*[F.col(n) for n in names])
    return normed.withColumn(out_col, key).drop(*names)
