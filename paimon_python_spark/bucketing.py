"""Driver-side replica of Spark's ``pmod(hash(keys), n)`` bucket function.

The writer assigns buckets with ``F.hash`` (Murmur3_x86_32, seed 42 —
the same algorithm Spark uses for shuffle partitioning). Re-implementing
it here lets the scan planner compute WHICH bucket a point-lookup key
lands in without launching a job: an equality predicate on the full
primary key prunes the scan to 1/num_buckets of the files before Spark
ever sees a path. At 100 TB that turns a key lookup from "open every
bucket's runs" into "open one bucket's runs".

Verified against ``F.hash`` outputs in tests (any divergence would break
correctness silently, so the test matrix covers every supported type).
"""

from __future__ import annotations

import struct
from typing import Any, List

from pyspark.sql import types as T

_MASK = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    x &= _MASK
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed & _MASK, _mix_k1(value & _MASK)), 4)


def _hash_long(value: int, seed: int) -> int:
    value &= 0xFFFFFFFFFFFFFFFF
    low = value & _MASK
    high = (value >> 32) & _MASK
    h1 = _mix_h1(seed & _MASK, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    h1 = seed & _MASK
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        (word,) = struct.unpack_from("<i", data, i)
        h1 = _mix_h1(h1, _mix_k1(word & _MASK))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _fmix(h1, n)


def _to_signed32(x: int) -> int:
    x &= _MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def spark_hash(values: List[Any], dtypes: List[T.DataType], seed: int = 42) -> int:
    """Replicates ``F.hash(c1, c2, ...)``: fold each column's hash into
    the running value (NULL columns leave the hash unchanged)."""
    h = seed
    for v, dt in zip(values, dtypes):
        if v is None:
            continue
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            h = _hash_int(int(v), h)
        elif isinstance(dt, T.BooleanType):
            h = _hash_int(1 if v else 0, h)
        elif isinstance(dt, T.LongType):
            h = _hash_long(int(v), h)
        elif isinstance(dt, T.FloatType):
            f = float(v)
            if f == 0.0:
                f = 0.0  # -0.0 normalizes to 0.0 (Spark XxHash/Murmur do)
            (bits,) = struct.unpack("<i", struct.pack("<f", f))
            h = _hash_int(bits & _MASK, h)
        elif isinstance(dt, T.DoubleType):
            f = float(v)
            if f == 0.0:
                f = 0.0
            (bits,) = struct.unpack("<q", struct.pack("<d", f))
            h = _hash_long(bits, h)
        elif isinstance(dt, T.StringType):
            h = _hash_bytes(str(v).encode("utf-8"), h)
        elif isinstance(dt, T.BinaryType):
            h = _hash_bytes(bytes(v), h)
        elif isinstance(dt, T.DateType):
            import datetime

            epoch = datetime.date(1970, 1, 1)
            h = _hash_int((v - epoch).days, h)
        else:
            raise TypeError(f"bucket hash: unsupported key type {dt}")
    return _to_signed32(h)


def bucket_of(values: List[Any], dtypes: List[T.DataType], num_buckets: int) -> int:
    """``pmod(hash(values), num_buckets)`` — the writer's bucket id."""
    return spark_hash(values, dtypes) % num_buckets
