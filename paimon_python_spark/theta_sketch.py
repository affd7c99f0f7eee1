"""Theta sketch codec — Apache DataSketches compact-theta wire format.

Closes the last gap in the Paimon aggregation merge-engine function
surface: ``fields.<c>.aggregate-function = theta_sketch`` (paimon
"Aggregation" merge-engine docs; the reference SDK delegates the union
to its bundled JVM writer's FieldThetaSketchAgg, which calls Apache
DataSketches — pypaimon ships no Python implementation at all).

Everything here derives from public specifications:

- The serialization is the DataSketches *compact ordered* theta sketch
  layout (datasketches.apache.org, "Theta Sketch Framework" binary
  format; mirrored by datasketches-java CompactSketch / PreambleUtil):
  preamble longs 1 (empty) / 2 (exact) / 3 (estimating), serVer 3,
  family 3 (COMPACT), flags READ_ONLY|COMPACT|ORDERED (|EMPTY), seed
  hash, retained count, p, thetaLong, then the retained 63-bit hashes
  sorted ascending as little-endian uint64.
- Hashing is MurmurHash3 x64 128 (Austin Appleby, public domain; the
  same algorithm datasketches-java/-cpp ship) with the DataSketches
  default update seed 9001; the update hash is ``h1 >>> 1`` (63-bit),
  zero rejected. Long values hash as their 8-byte little-endian form
  (java ``update(long)``); byte/str values hash their raw/UTF-8 bytes
  (matching datasketches-python — java's ``update(String)`` hashes
  UTF-16 chars, a cross-language quirk the DataSketches docs call out).

Estimation semantics are the textbook KMV theta variant: keep the
``k = 2^lg_k`` smallest hashes, theta = the (k+1)-th smallest, estimate
= retained / (theta / 2^63). Sketches stay EXACT (theta = max, estimate
== true distinct) below k entries — the gate query exploits that for a
strict equality oracle. The wire format is spec-faithful so a JVM
DataSketches reader accepts these bytes, but the retained-set dynamics
above k are KMV, not a bit-identical replay of QuickSelectSketch's
rebuild thresholds; like every codec in this repo, JVM interop is
asserted structurally here and end-to-end by
tools/validate_against_real_lake.py the day a JVM lake is available.

Scale shape: executors pre-sketch shards (one vectorized numpy hash
pass per Arrow batch), the aggregation merge engine unions per key in
ONE post-aggregate pandas UDF call per merged key, and distinct-count
reads are metadata-sized — the same 100 TB ingest pattern as the
rbm32/rbm64 and hll_sketch fields beside it.
"""

from __future__ import annotations

import struct

import numpy as np

DEFAULT_UPDATE_SEED = 9001
DEFAULT_LG_K = 12  # DataSketches / Paimon ThetaSketch default (4096)
_MAX_THETA = np.uint64(0x7FFFFFFFFFFFFFFF)  # Long.MAX_VALUE

_SER_VER = 3
_FAMILY_COMPACT = 3
_FLAG_READ_ONLY = 0x02
_FLAG_EMPTY = 0x04
_FLAG_COMPACT = 0x08
_FLAG_ORDERED = 0x10
_FLAG_SINGLEITEM = 0x20

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)

_U64 = np.uint64
_MASK64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# MurmurHash3 x64 128 — vectorized over 8-byte (long) inputs
# ---------------------------------------------------------------------------


def _fmix_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _F1
    k = k ^ (k >> _U64(33))
    k = k * _F2
    return k ^ (k >> _U64(33))


def hash_longs(values: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """murmur3 x64-128 ``h1`` of each value's 8-byte LE form, as uint64.

    One long is shorter than the 16-byte block, so the whole input is
    the algorithm's tail (``len & 15 == 8``: bytes 0-7 fold into k1)."""
    with np.errstate(over="ignore"):
        k1 = values.astype(np.int64).view(np.uint64) * _C1
        k1 = (k1 << _U64(31)) | (k1 >> _U64(33))
        k1 = k1 * _C2
        h1 = np.full(values.shape, _U64(seed), dtype=np.uint64) ^ k1
        h2 = np.full(values.shape, _U64(seed), dtype=np.uint64)
        ln = _U64(8)
        h1 = h1 ^ ln
        h2 = h2 ^ ln
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix_vec(h1)
        h2 = _fmix_vec(h2)
        h1 = h1 + h2
    return h1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> tuple:
    """Scalar murmur3 x64-128 over arbitrary bytes → (h1, h2) uint64s.

    The from-the-spec reference implementation: the vectorized long
    path is property-tested against this, and string/bytes updates go
    through it directly (they're driver-side helper calls, never a
    per-row hot path)."""
    length = len(data)
    h1 = seed & _MASK64
    h2 = seed & _MASK64
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16:]
    k1 = 0
    k2 = 0
    tl = len(tail)
    for i in range(min(tl, 16) - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    for i in range(min(tl, 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if tl > 8:
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if tl > 0:
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def compute_seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """DataSketches Util.computeSeedHash: low 16 bits of murmur(seed as
    an 8-byte long, hashed with seed 0); zero is reserved/invalid."""
    h1, _ = murmur3_128(struct.pack("<q", seed), seed=0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to the reserved seed-hash 0")
    return sh


# ---------------------------------------------------------------------------
# Sketch build / union / estimate over 63-bit update hashes
# ---------------------------------------------------------------------------


def _update_hashes_from_longs(values, seed: int) -> np.ndarray:
    arr = np.asarray(values, dtype=np.int64)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    h = hash_longs(arr, seed) >> _U64(1)
    return h[h != 0]


def _update_hash_bytes(data: bytes, seed: int) -> int:
    h1, _ = murmur3_128(data, seed)
    return h1 >> 1


def _kmv_select(hashes: np.ndarray, theta: np.uint64, k: int):
    """Distinct hashes below theta; cut to the k smallest (new theta =
    the (k+1)-th order statistic) when more survive."""
    hashes = np.unique(hashes)  # sorts ascending
    hashes = hashes[hashes < theta]
    if hashes.size > k:
        theta = hashes[k]
        hashes = hashes[:k]
    return hashes, theta


def serialize_theta(
    hashes: np.ndarray,
    theta: np.uint64,
    *,
    seed: int = DEFAULT_UPDATE_SEED,
    empty: bool = False,
) -> bytes:
    """Compact ordered theta sketch bytes (spec layout, see module doc)."""
    seed_hash = compute_seed_hash(seed)
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if empty or (hashes.size == 0 and theta == _MAX_THETA):
        flags |= _FLAG_EMPTY
        return struct.pack(
            "<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, seed_hash
        )
    estimating = theta != _MAX_THETA
    pre_longs = 3 if estimating else 2
    head = struct.pack(
        "<BBBBBBH", pre_longs, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, seed_hash
    )
    head += struct.pack("<if", int(hashes.size), 1.0)
    if estimating:
        head += struct.pack("<q", int(np.int64(np.uint64(theta))))
    return head + np.sort(np.asarray(hashes, dtype=np.uint64)).tobytes()


def deserialize_theta(buf: bytes, *, seed: int = DEFAULT_UPDATE_SEED):
    """→ ``(hashes ascending uint64, thetaLong, empty)``; validates the
    preamble (serVer, family, seed hash) like the JVM reader does."""
    if len(buf) < 8:
        raise ValueError(f"theta sketch too short: {len(buf)} bytes")
    pre_longs, ser_ver, family, _, _, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", buf, 0
    )
    pre_longs &= 0x3F
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported theta serVer {ser_ver}")
    if family != _FAMILY_COMPACT:
        raise ValueError(f"not a compact theta sketch (family {family})")
    expect = compute_seed_hash(seed)
    if seed_hash != expect:
        raise ValueError(
            f"theta seed hash mismatch: sketch {seed_hash:#x} vs "
            f"seed {seed} → {expect:#x}"
        )
    if flags & _FLAG_EMPTY:
        return np.empty(0, dtype=np.uint64), _MAX_THETA, True
    if pre_longs == 1:
        # DataSketches SingleItemSketch: preLongs=1, SINGLEITEM flag
        # (no EMPTY), the one 63-bit hash at byte 8 — a JVM writer's
        # one-distinct-value compact form. Some historic serializers
        # omit the flag, so any non-EMPTY preLongs-1 sketch with a
        # hash long present reads as single-item rather than empty.
        if len(buf) >= 16:
            h = np.frombuffer(buf, dtype="<u8", count=1, offset=8).astype(
                np.uint64
            )
            return h, _MAX_THETA, False
        if flags & _FLAG_SINGLEITEM:
            raise ValueError(
                "single-item theta sketch truncated: no hash long"
            )
        return np.empty(0, dtype=np.uint64), _MAX_THETA, True
    retained = struct.unpack_from("<i", buf, 8)[0]
    if pre_longs >= 3:
        theta = np.uint64(struct.unpack_from("<q", buf, 16)[0] & _MASK64)
    else:
        theta = _MAX_THETA
    off = pre_longs * 8
    hashes = np.frombuffer(buf, dtype="<u8", count=retained, offset=off)
    return np.sort(hashes.astype(np.uint64)), theta, False


def sketch_of_longs(
    values,
    *,
    lg_k: int = DEFAULT_LG_K,
    seed: int = DEFAULT_UPDATE_SEED,
) -> bytes:
    """Build a compact sketch from int64 values (java ``update(long)``
    hashing) — the engine-side twin of Paimon's ``ThetaSketch.sketchOf``."""
    hashes = _update_hashes_from_longs(values, seed)
    empty = hashes.size == 0
    hashes, theta = _kmv_select(hashes, _MAX_THETA, 1 << lg_k)
    return serialize_theta(hashes, theta, seed=seed, empty=empty)


def sketch_of_items(
    items,
    *,
    lg_k: int = DEFAULT_LG_K,
    seed: int = DEFAULT_UPDATE_SEED,
) -> bytes:
    """Build from str/bytes items (UTF-8 for str, datasketches-python
    convention). Driver/helper path — longs take the vectorized route."""
    hs = []
    for it in items:
        if it is None:
            continue
        data = it.encode("utf-8") if isinstance(it, str) else bytes(it)
        h = _update_hash_bytes(data, seed)
        if h != 0:
            hs.append(h)
    hashes = np.asarray(hs, dtype=np.uint64)
    empty = hashes.size == 0
    hashes, theta = _kmv_select(hashes, _MAX_THETA, 1 << lg_k)
    return serialize_theta(hashes, theta, seed=seed, empty=empty)


def union_theta(
    sketches,
    *,
    lg_k: int = DEFAULT_LG_K,
    seed: int = DEFAULT_UPDATE_SEED,
) -> bytes:
    """Union compact sketches: min theta, concat survivors, KMV cut —
    the set-operation DataSketches' Union.getResult(ordered) returns."""
    parts = []
    theta = _MAX_THETA
    any_nonempty = False
    for buf in sketches:
        if buf is None:
            continue
        hashes, th, empty = deserialize_theta(bytes(buf), seed=seed)
        if not empty:
            any_nonempty = True
        theta = min(theta, th)
        if hashes.size:
            parts.append(hashes)
    merged = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )
    merged, theta = _kmv_select(merged, theta, 1 << lg_k)
    return serialize_theta(merged, theta, seed=seed, empty=not any_nonempty)


def estimate_theta(buf: bytes, *, seed: int = DEFAULT_UPDATE_SEED) -> float:
    """Distinct-count estimate: retained / (theta / 2^63); exact while
    the sketch never left exact mode (theta == Long.MAX_VALUE)."""
    hashes, theta, empty = deserialize_theta(bytes(buf), seed=seed)
    if empty:
        return 0.0
    if theta == _MAX_THETA:
        return float(hashes.size)
    return float(hashes.size) / (float(theta) / float(1 << 63))
