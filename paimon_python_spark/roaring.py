"""Roaring bitmap codec (32-bit + portable 64-bit) — the PUBLIC portable serialization
format (https://github.com/RoaringBitmap/RoaringFormatSpec), which is
what Apache Paimon's ``BitmapDeletionVector`` embeds in its deletion
vector index files (Java ``org.roaringbitmap.RoaringBitmap.serialize``,
wrapped by Paimon's ``RoaringBitmap32``).

Only what deletion vectors need: deserialize any spec-conformant stream
(array / bitmap / run containers, both cookie layouts) into a sorted
``numpy`` position array, and serialize sorted positions back out in
the no-run layout (always legal per the spec — run optimization is an
encoder's choice). Everything is numpy-vectorized; no per-position
Python loops.

Layout recap (all little-endian):

- cookie ``12346`` (no run containers): int32 cookie, int32 container
  count, then the descriptive header, then one int32 byte-offset per
  container, then container payloads.
- cookie ``12347`` (run containers possible): ``(count-1) << 16 | 12347``
  in one int32, then ``ceil(count/8)`` run-flag bytes (bit i set =
  container i is a run container), then the descriptive header; the
  offset header is present only when ``count >= 4``.
- descriptive header: per container, uint16 key (value >> 16) and
  uint16 cardinality-1.
- containers: array = cardinality × uint16; bitmap = 8 KiB bitset
  (1024 × uint64); run = uint16 n_runs then n_runs × (uint16 start,
  uint16 length-1).
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
_ARRAY_MAX = 4096
_NO_OFFSET_THRESHOLD = 4


def serialize_roaring32(values) -> bytes:
    """Serialize a sorted iterable of uint32 positions to the portable
    no-run-container layout."""
    ordered = sorted(set(int(v) for v in values))
    # validate BEFORE the uint32 conversion: numpy 1.x silently wraps
    # out-of-range ints, which would mark the wrong row deleted
    if ordered and (ordered[0] < 0 or ordered[-1] > 0xFFFFFFFF):
        raise ValueError("roaring32 positions must fit in uint32")
    # fast path: SMALL position sets (≤256) packed with pure struct —
    # the overwhelmingly common shape for bitmap file indexes, which
    # serialize one small bitmap PER DISTINCT VALUE (28k calls per file
    # measured); the numpy/np.unique general path costs ~60 µs of fixed
    # overhead per call that plain packing avoids. Every container here
    # is an array container (≤256 < _ARRAY_MAX), so the layout is the
    # byte-identical no-run form the general path emits.
    if ordered and len(ordered) <= 256:
        groups: list = []
        cur_key, start = ordered[0] >> 16, 0
        for i, v in enumerate(ordered):
            k = v >> 16
            if k != cur_key:
                groups.append((cur_key, ordered[start:i]))
                cur_key, start = k, i
        groups.append((cur_key, ordered[start:]))
        n = len(groups)
        out = bytearray(struct.pack("<ii", SERIAL_COOKIE_NO_RUN, n))
        payloads = []
        for k, grp in groups:
            out += struct.pack("<HH", k, len(grp) - 1)
            payloads.append(
                struct.pack(f"<{len(grp)}H", *(v & 0xFFFF for v in grp))
            )
        off = 8 + 8 * n  # cookie+count, desc header, offset header
        for p in payloads:
            out += struct.pack("<I", off)
            off += len(p)
        for p in payloads:
            out += p
        return bytes(out)
    vals = np.asarray(ordered, dtype=np.uint32)
    keys = (vals >> 16).astype(np.uint16)
    lows = (vals & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [vals.size]
    n = len(uniq_keys)
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUN, n)
    payloads = []
    for i in range(n):
        lo = lows[bounds[i] : bounds[i + 1]]
        card = lo.size
        out += struct.pack("<HH", int(uniq_keys[i]), card - 1)
        if card <= _ARRAY_MAX:
            payloads.append(lo.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype="<u8")
            word = lo.astype(np.uint32) >> 6
            bit = lo.astype(np.uint32) & 63
            np.bitwise_or.at(bits, word, np.uint64(1) << bit.astype(np.uint64))
            payloads.append(bits.tobytes())
    # offset header: byte position of each container from stream start
    off = len(out) + 4 * n
    for p in payloads:
        out += struct.pack("<I", off)
        off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def serialize_roaring64(values) -> bytes:
    """Serialize sorted uint64 values in the spec's portable 64-bit
    layout (RoaringFormatSpec "extension for 64-bit implementations"):
    uint64 LE bucket count, then per bucket a uint32 LE high key
    followed by that bucket's 32-bit portable stream."""
    ordered = sorted(set(int(v) for v in values))
    if ordered and (ordered[0] < 0 or ordered[-1] > 0xFFFFFFFFFFFFFFFF):
        raise ValueError("roaring64 positions must fit in uint64")
    vals = np.asarray(ordered, dtype=np.uint64)
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    lows = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [vals.size]
    out = bytearray(struct.pack("<Q", len(uniq)))
    for i in range(len(uniq)):
        out += struct.pack("<I", int(uniq[i]))
        out += serialize_roaring32(lows[bounds[i] : bounds[i + 1]])
    return bytes(out)


def deserialize_roaring64(data: bytes) -> np.ndarray:
    """Deserialize a portable 64-bit stream into a sorted uint64 array."""
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    parts = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, pos)
        lows, pos = deserialize_roaring32_sized(data, pos + 4)
        parts.append((np.uint64(high) << np.uint64(32)) + lows.astype(np.uint64))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


def deserialize_roaring32(data: bytes) -> np.ndarray:
    """Deserialize a portable-format stream into a sorted uint32 array."""
    return deserialize_roaring32_sized(data)[0]


def deserialize_roaring32_sized(data: bytes, offset: int = 0):
    """Deserialize one portable-format stream starting at ``offset``
    and ALSO return the end position — for payloads that concatenate
    several bitmaps back-to-back (the spec BSI index's slice array),
    where the caller must know where the next one starts."""
    buf = memoryview(data)[offset:]
    (cookie32,) = struct.unpack_from("<i", buf, 0)
    cookie = cookie32 & 0xFFFF
    pos = 4
    if cookie == SERIAL_COOKIE:
        n = ((cookie32 >> 16) & 0xFFFF) + 1
        n_flag_bytes = (n + 7) // 8
        flags = np.frombuffer(buf, dtype=np.uint8, count=n_flag_bytes, offset=pos)
        pos += n_flag_bytes
        is_run = ((flags[np.arange(n) // 8] >> (np.arange(n) % 8)) & 1).astype(bool)
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        is_run = np.zeros(n, dtype=bool)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap stream (cookie {cookie})")
    desc = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos).reshape(n, 2)
    keys = desc[:, 0].astype(np.uint32)
    cards = desc[:, 1].astype(np.int64) + 1
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential decode
    parts = []
    for i in range(n):
        card = int(cards[i])
        base = keys[i] << 16
        if is_run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos).reshape(
                n_runs, 2
            )
            pos += 4 * n_runs
            lengths = runs[:, 1].astype(np.int64) + 1
            total = int(lengths.sum())
            # expand [start, start+len) runs without a Python inner loop
            starts = np.repeat(runs[:, 0].astype(np.int64), lengths)
            offsets = np.arange(total) - np.repeat(
                np.cumsum(lengths) - lengths, lengths
            )
            lo = (starts + offsets).astype(np.uint32)
        elif card <= _ARRAY_MAX:
            lo = np.frombuffer(buf, dtype="<u2", count=card, offset=pos).astype(
                np.uint32
            )
            pos += 2 * card
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            lo = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(base + lo)
    if not parts:
        return np.empty(0, dtype=np.uint32), offset + pos
    return np.concatenate(parts), offset + pos
