"""Per-file bloom-filter indexes for equality-predicate file skipping.

Min/max stats can't prune point lookups on high-cardinality unsorted
columns (every file's [min, max] spans the probe). Paimon solves this
with file indexes (``file-index.bloom-filter.columns``); this is the
engine's equivalent: a small bloom bitmap per (file, column) stored in
the manifest entry's stats, consulted by ``Predicate.test_by_stats``
for ``equal`` / ``in`` — so at 100 TB a point lookup plans only the
files whose bloom admits the key, typically one per bucket.

Determinism/portability: md5 over a canonical string rendering, three
32-bit slices of the digest modulo the bit count. The bitmap is sized
at ~10 bits per distinct value (fp ≈ 2% at k=3), clamped to
[512, 65536] bits, and serialized as hex in manifest JSON (≤ 16 KB per
column per file — manifest-friendly).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional

_K = 3
_MIN_BITS = 512
_MAX_BITS = 65536


def canonical(value) -> Optional[str]:
    """One string rendering per logical value, shared by the writer and
    the probe, so int 5 and float 5.0 collide on purpose."""
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return str(int(value)) if value.is_integer() else repr(value)
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def _positions(canon: str, m_bits: int) -> list[int]:
    digest = hashlib.md5(canon.encode("utf-8")).hexdigest()
    return [int(digest[i * 8 : (i + 1) * 8], 16) % m_bits for i in range(_K)]


def size_bits(n_distinct: int) -> int:
    m = _MIN_BITS
    while m < 10 * max(1, n_distinct) and m < _MAX_BITS:
        m *= 2
    return m


def build_hex(values: Iterable) -> Optional[str]:
    """Bloom bitmap (hex) over the distinct non-null values; None when
    there is nothing to index."""
    canons = {c for c in (canonical(v) for v in values) if c is not None}
    if not canons:
        return None
    m = size_bits(len(canons))
    bits = 0
    for c in canons:
        for p in _positions(c, m):
            bits |= 1 << p
    return format(bits, f"0{m // 4}x")


def might_contain(hex_bitmap, value) -> bool:
    """False only when the value is definitely absent from the file.
    Accepts either the engine's hex bitmap or any probe object exposing
    ``might_contain`` (e.g. a spec-format ``fileindex_codec.SpecBloom``
    decoded from a JVM-written lake)."""
    if hasattr(hex_bitmap, "might_contain"):
        return hex_bitmap.might_contain(value)
    c = canonical(value)
    if c is None:
        return True  # nulls are tracked by null_count, not the bloom
    m = len(hex_bitmap) * 4
    bits = int(hex_bitmap, 16)
    return all(bits >> p & 1 for p in _positions(c, m))
