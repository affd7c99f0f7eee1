"""Spec-format Paimon FILE INDEX reader/writer (bloom-filter, bitmap
and bsi types).

Real Paimon serializes per-file indexes in its own container format —
either embedded in the manifest entry's ``_EMBEDDED_FILE_INDEX`` slot
(below ``file-index.in-manifest-threshold``) or as a standalone
``*.index`` file listed in ``_EXTRA_FILES``. This module implements
that format from the PUBLIC spec
(paimon.apache.org/docs/master/concepts/spec/fileindex) so lakes
written by JVM Paimon prune on their own bloom indexes here, and
spec-built fixtures round-trip:

Container (all integers BIG-endian, names in Java ``writeUTF`` form —
2-byte length + UTF-8 bytes)::

    magic (8B long = 1493475289347502) | version (int, V1 = 1)
    head length (int)                  | column number (int)
    per column: name (UTF) | index number (int)
        per index: index type (UTF) | start pos (int) | length (int)
    redundant length (int, 0 in V1)    | redundant bytes
    BODY: concatenated index payloads (start pos is absolute)

Bloom-filter payload (index type ``bloom-filter``)::

    numHashFunctions (int BE) | bit-set bytes

Bitmap payload (index type ``bitmap``, V1 — BitmapFileIndex)::

    version (1 byte = 1) | row count (int) | value count (int)
    has null (1 byte) [| null offset (int)]
    per value: serialized value | offset (int)   ← the HEAD dictionary
    BODY: portable-format roaring bitmaps (offset-addressed; a
    NEGATIVE offset inlines a single row as -1 - rowId)

Values serialize DataOutput-style (fixed-width big-endian primitives;
strings/bytes as int length + raw bytes). The probe reads only the
head — exact membership, no roaring decode.

Probe semantics mirror the JVM classes the spec page describes
(``BloomFilter64`` + ``FastHash``): a 64-bit value hash — Thomas
Wang's 64-bit mix for numeric values, XXH64 for byte-typed values —
split into two 32-bit halves combined per hash function, bit layout
byte-addressed little-endian (``bytes[i >> 3] & 1 << (i & 7)``).

CONFIDENCE NOTE: the container layout and payload shape follow the
published spec page; the hash constants are implemented from the
publicly documented algorithms (Wang 64-bit mix; XXH64 seed 0) and
validated against spec-built fixtures in this repo — byte-level
validation against a genuinely JVM-written index is pending a real
lake (tools/validate_against_real_lake.py checks bloom-pruning parity
when one is reachable). Blooms only PRUNE, and only via this module's
own probe, so engine results stay exact regardless.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

MAGIC = 1493475289347502
VERSION_1 = 1
BLOOM_INDEX_TYPE = "bloom-filter"

#: seed for XXH64 over byte-typed values (publicly documented default
#: of the airlift-lineage XxHash64 implementations the JVM side uses)
XXH64_SEED = 0

_M64 = (1 << 64) - 1


def _wang64(key: int) -> int:
    """Thomas Wang's 64-bit mix hash — the spec page's 'specified
    number hash (H64)' for numeric values."""
    key &= _M64
    key = (~key + (key << 21)) & _M64
    key ^= key >> 24
    key = (key + (key << 3) + (key << 8)) & _M64
    key ^= key >> 14
    key = (key + (key << 2) + (key << 4)) & _M64
    key ^= key >> 28
    key = (key + (key << 31)) & _M64
    return key


# ---- XXH64 (public algorithm, Cyan4973/xxHash spec) ----

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = XXH64_SEED) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        i = 0
        for i in range(0, n - 31, 32):
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, a),
                _round(v2, b),
                _round(v3, c),
                _round(v4, d),
            )
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        i = 0
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def value_hash64(value, dtype: Optional[str] = None) -> Optional[int]:
    """FastHash dispatch: numeric → Wang mix over the long form;
    strings/bytes → XXH64 over the UTF-8/raw bytes. None for NULL
    (nulls never probe) and for any shape the dispatch cannot place —
    callers must NOT prune on None.

    ``dtype`` is the COLUMN's declared type kind (``"float"`` for a
    32-bit FLOAT column, anything else for the default widths): the
    JVM hashes FLOAT via ``Float.floatToIntBits`` (sign-extended to
    long) but DOUBLE via ``doubleToLongBits``, and a bare python float
    cannot distinguish the two — probing a FLOAT column's bloom with
    the double bit pattern would FALSE-NEGATIVE present values and
    prune files unsoundly. Decode sites attach the column type."""
    import datetime

    if value is None:
        return None
    if isinstance(value, bool):
        return _wang64(1 if value else 0)
    if isinstance(value, int):
        return _wang64(value)
    if isinstance(value, float):
        if dtype == "float":
            try:
                (bits,) = struct.unpack("<i", struct.pack("<f", value))
            except (OverflowError, struct.error):
                return None  # unrepresentable as float32: no prune
            return _wang64(bits)  # signed 32-bit sign-extends in _wang64
        return _wang64(struct.unpack("<q", struct.pack("<d", value))[0])
    if isinstance(value, datetime.date) and not isinstance(value, datetime.datetime):
        return _wang64((value - datetime.date(1970, 1, 1)).days)
    if isinstance(value, str):
        return xxh64(value.encode("utf-8"))
    if isinstance(value, (bytes, bytearray)):
        return xxh64(bytes(value))
    return None  # unhashable shape: caller must not prune


class SpecBloom:
    """Decoded ``bloom-filter`` payload: test-only probe with the
    JVM's two-half combination and byte-addressed bit layout.
    ``dtype`` is the column's type kind (``"float"`` switches the
    value hash to the 32-bit ``floatToIntBits`` form — see
    value_hash64); decode sites set it from the table schema."""

    __slots__ = ("num_hash", "bits", "dtype")

    def __init__(self, num_hash: int, bits: bytes, dtype: Optional[str] = None):
        self.num_hash = num_hash
        self.bits = bits
        self.dtype = dtype

    @classmethod
    def decode(cls, payload: bytes, dtype: Optional[str] = None) -> "SpecBloom":
        (k,) = struct.unpack_from(">i", payload, 0)
        return cls(k, payload[4:], dtype)

    def encode(self) -> bytes:
        return struct.pack(">i", self.num_hash) + self.bits

    def _positions(self, hash64: int):
        num_bits = len(self.bits) * 8
        h1 = hash64 & 0xFFFFFFFF
        if h1 >= 1 << 31:
            h1 -= 1 << 32  # signed int32, the JVM's (int) cast
        h2 = hash64 >> 32
        if h2 >= 1 << 31:
            h2 -= 1 << 32
        for i in range(1, self.num_hash + 1):
            combined = (h1 + i * h2) & 0xFFFFFFFF
            if combined >= 1 << 31:
                combined = ~(combined - (1 << 32)) & 0xFFFFFFFF
            yield combined % num_bits

    def add_hash(self, hash64: int) -> None:
        b = bytearray(self.bits)
        for pos in self._positions(hash64):
            b[pos >> 3] |= 1 << (pos & 7)
        self.bits = bytes(b)

    def test_hash(self, hash64: int) -> bool:
        return all(
            self.bits[pos >> 3] >> (pos & 7) & 1 for pos in self._positions(hash64)
        )

    def might_contain(self, value) -> bool:
        """False only when the value is provably absent — the probe
        contract Predicate.test_by_stats expects (shared with the
        engine's hex blooms via duck typing)."""
        h = value_hash64(value, self.dtype)
        if h is None:
            return True
        return self.test_hash(h)


def build_spec_bloom(
    values, items: Optional[int] = None, fpp: float = 0.1, dtype: Optional[str] = None
) -> SpecBloom:
    """Fixture/interop writer: size per the JVM formula (bits =
    -n·ln(fpp)/ln²2 rounded up to a whole number of longs, k =
    bits/n·ln2) and add every non-null value's hash (``dtype`` as in
    value_hash64 — pass "float" when indexing a 32-bit FLOAT column)."""
    import math

    vals = [v for v in values if v is not None]
    n = max(1, items if items is not None else len(vals))
    nb = int(-n * math.log(fpp) / (math.log(2) ** 2))
    num_bits = nb + (64 - nb % 64)
    k = max(1, round(num_bits / n * math.log(2)))
    bloom = SpecBloom(k, bytes(num_bits // 8), dtype)
    for v in vals:
        h = value_hash64(v, dtype)
        if h is not None:
            bloom.add_hash(h)
    return bloom


# ---- bitmap index (index type "bitmap") ----

BITMAP_INDEX_TYPE = "bitmap"


def _bitmap_value_bytes(value, kind: Optional[str]) -> Optional[bytes]:
    """DataOutput-form bytes of one value for the bitmap head's value
    dictionary (Java's per-type serializer: fixed-width big-endian
    primitives; strings/bytes as int length + raw bytes). None for
    shapes the kind can't place — callers must NOT prune on None."""
    import datetime

    try:
        if kind == "boolean":
            return struct.pack(">b", 1 if value else 0)
        if kind == "tinyint":
            return struct.pack(">b", int(value))
        if kind == "smallint":
            return struct.pack(">h", int(value))
        if kind in ("int", "date"):
            if isinstance(value, datetime.datetime):
                value = value.date()  # pandas hands dates as Timestamps
            if isinstance(value, datetime.date):
                value = (value - datetime.date(1970, 1, 1)).days
            return struct.pack(">i", int(value))
        if kind == "bigint":
            return struct.pack(">q", int(value))
        if kind == "float":
            return struct.pack(">f", float(value))
        if kind == "double":
            return struct.pack(">d", float(value))
        if kind == "timestamp":
            if isinstance(value, datetime.datetime):
                epoch = datetime.datetime(
                    1970, 1, 1, tzinfo=value.tzinfo
                )
                # integer arithmetic: float total_seconds()*1000 carries
                # up to ~1ms truncation error at current epoch millis —
                # fatal for an EXACT-membership index
                value = (value - epoch) // datetime.timedelta(
                    milliseconds=1
                )
            return struct.pack(">q", int(value))
        if kind == "string":
            raw = str(value).encode("utf-8")
            return struct.pack(">i", len(raw)) + raw
        if kind == "binary":
            raw = bytes(value)
            return struct.pack(">i", len(raw)) + raw
    except (ValueError, TypeError, OverflowError, struct.error):
        return None
    return None


def _bitmap_value_width(kind: Optional[str]):
    """Fixed byte width of a kind's serialized value, or None for
    length-prefixed kinds (string/binary)."""
    return {
        "boolean": 1,
        "tinyint": 1,
        "smallint": 2,
        "int": 4,
        "date": 4,
        "float": 4,
        "bigint": 8,
        "double": 8,
        "timestamp": 8,
    }.get(kind)


class SpecBitmap:
    """Decoded ``bitmap`` payload HEAD (spec fileindex page /
    BitmapFileIndex V1): version byte, row count, the non-null value
    dictionary (serialized value → body offset; a NEGATIVE offset means
    a single row at position ``-1 - offset``), and the null slot. The
    probe needs only the head — per-value roaring bitmaps in the body
    stay unread, and ``might_contain`` is EXACT (a value dictionary,
    not a probabilistic filter): False prunes soundly, no false
    positives either.

    Same confidence note as SpecBloom: layout follows the published
    spec page; byte-level validation against a genuinely JVM-written
    index is pending a real lake. V2+ payloads raise at decode and the
    planner treats the file as unprunable (correct, merely unskipped)."""

    __slots__ = ("row_count", "values", "has_null", "kind")

    def __init__(self, row_count: int, values: dict, has_null: bool, kind):
        self.row_count = row_count
        self.values = values  # {value bytes: offset int}
        self.has_null = has_null
        self.kind = kind

    @classmethod
    def decode(cls, payload: bytes, kind: Optional[str]) -> "SpecBitmap":
        version = payload[0]
        if version != 1:
            raise ValueError(f"unsupported bitmap index version {version}")
        row_count, n_vals = struct.unpack_from(">ii", payload, 1)
        pos = 9
        has_null = payload[pos] != 0
        pos += 1
        if has_null:
            pos += 4  # null bitmap offset — presence is all the probe needs
        width = _bitmap_value_width(kind)
        values: dict = {}
        for _ in range(n_vals):
            if width is not None:
                vb = payload[pos : pos + width]
                pos += width
            else:
                (ln,) = struct.unpack_from(">i", payload, pos)
                vb = payload[pos : pos + 4 + ln]
                pos += 4 + ln
            (off,) = struct.unpack_from(">i", payload, pos)
            pos += 4
            values[bytes(vb)] = off
        return cls(row_count, values, has_null, kind)

    def encode(self, null_offset: Optional[int] = None) -> bytes:
        head = bytearray()
        head.append(1)
        head += struct.pack(">ii", self.row_count, len(self.values))
        head.append(1 if self.has_null else 0)
        if self.has_null:
            head += struct.pack(">i", null_offset or 0)
        for vb, off in self.values.items():
            head += vb + struct.pack(">i", off)
        return bytes(head)

    def might_contain(self, value) -> bool:
        """EXACT membership: False means no row holds the value. Only
        None (NULL probe / unencodable shape) answers True
        conservatively without a lookup."""
        if value is None:
            return True
        vb = _bitmap_value_bytes(value, self.kind)
        if vb is None:
            return True
        return vb in self.values


def build_spec_bitmap(values, kind: Optional[str]) -> bytes:
    """Fixture/interop writer: the full V1 payload (head + roaring
    bodies) for a column's values in row order. Single-occurrence
    values take the negative-offset inline form (offset = -1 - row);
    multi-row values serialize a portable-format roaring bitmap of
    their row positions (the DV codec's RoaringFormatSpec writer)."""
    from paimon_python_spark.roaring import serialize_roaring32

    rows_by_value: dict = {}
    null_rows = []
    n_rows = 0
    for i, v in enumerate(values):
        n_rows = i + 1  # count in the loop: a generator input is
        # consumed here, so len(values) after it would read 0
        if v is None:
            null_rows.append(i)
            continue
        vb = _bitmap_value_bytes(v, kind)
        if vb is None:
            raise ValueError(f"bitmap index: cannot serialize {v!r} as {kind}")
        rows_by_value.setdefault(vb, []).append(i)
    body = bytearray()
    offsets: dict = {}
    for vb, rows in rows_by_value.items():
        if len(rows) == 1:
            offsets[vb] = -1 - rows[0]
        else:
            offsets[vb] = len(body)
            body += serialize_roaring32(rows)
    null_offset = None
    if null_rows:
        if len(null_rows) == 1:
            null_offset = -1 - null_rows[0]
        else:
            null_offset = len(body)
            body += serialize_roaring32(null_rows)
    meta = SpecBitmap(n_rows, offsets, bool(null_rows), kind)
    return meta.encode(null_offset) + bytes(body)


# ---- bit-sliced index (index type "bsi") ----

BSI_INDEX_TYPE = "bsi"


def bsi_map_value(value, kind: Optional[str]) -> Optional[int]:
    """The BSI value mapper: one long per value (the JVM side's
    per-type ``valueMapper``). BSI is a NUMERIC index — integral
    kinds, dates as epoch days, timestamps as epoch millis. None for
    NULL or any shape/kind the mapper can't place (callers must not
    prune on None)."""
    import datetime

    if value is None:
        return None
    try:
        if kind in ("tinyint", "smallint", "int", "bigint"):
            return int(value)
        if kind == "date":
            if isinstance(value, datetime.datetime):
                value = value.date()
            if isinstance(value, datetime.date):
                return (value - datetime.date(1970, 1, 1)).days
            return int(value)
        if kind == "timestamp":
            if isinstance(value, datetime.datetime):
                epoch = datetime.datetime(1970, 1, 1, tzinfo=value.tzinfo)
                return (value - epoch) // datetime.timedelta(milliseconds=1)
            return int(value)
    except (ValueError, TypeError, OverflowError):
        return None
    return None


class _BsiPart:
    """One sign half of a BSI payload (O'Neil bit-sliced index over
    roaring bitmaps): ``min``/``max`` of the stored magnitudes, the
    existence bitmap ``ebm`` (row positions holding any value in this
    part), and per-bit ``slices`` where ``slices[i]`` holds the rows
    whose offset ``value - min`` has bit ``i`` set."""

    __slots__ = ("min", "max", "ebm", "slices", "_words")

    def __init__(self, vmin: int, vmax: int, ebm, slices):
        self.min = vmin
        self.max = vmax
        self.ebm = ebm  # numpy uint32 row positions, sorted
        self.slices = slices  # list of numpy uint32 arrays
        self._words = None  # packed-bitset cache, built on first probe

    @classmethod
    def build(cls, rows_values) -> "_BsiPart":
        """From [(row, magnitude)] with magnitude >= 0."""
        import numpy as np

        rows = np.asarray([r for r, _ in rows_values], dtype=np.uint32)
        vals = [v for _, v in rows_values]
        vmin, vmax = min(vals), max(vals)
        span = vmax - vmin
        n_slices = span.bit_length()
        # vectorized slicing: one offsets array, one mask per bit (a
        # per-value Python loop would cost seconds on a 1M-row file)
        offsets = np.asarray(vals, dtype=np.uint64) - np.uint64(vmin)
        slices = []
        for i in range(n_slices):
            hit = rows[(offsets >> np.uint64(i)) & np.uint64(1) == 1]
            slices.append(np.sort(hit))
        return cls(vmin, vmax, np.sort(rows), slices)

    def encode(self) -> bytes:
        from paimon_python_spark.roaring import serialize_roaring32

        out = bytearray()
        out.append(1)  # part version
        out += struct.pack(">qq", self.min, self.max)
        out += serialize_roaring32(self.ebm)
        out += struct.pack(">i", len(self.slices))
        for s in self.slices:
            out += serialize_roaring32(s)
        return bytes(out)

    @classmethod
    def decode(cls, payload: bytes, pos: int):
        from paimon_python_spark.roaring import deserialize_roaring32_sized

        if payload[pos] != 1:
            raise ValueError(f"unsupported BSI part version {payload[pos]}")
        vmin, vmax = struct.unpack_from(">qq", payload, pos + 1)
        pos += 17
        ebm, pos = deserialize_roaring32_sized(payload, pos)
        (n_slices,) = struct.unpack_from(">i", payload, pos)
        pos += 4
        slices = []
        for _ in range(n_slices):
            s, pos = deserialize_roaring32_sized(payload, pos)
            slices.append(s)
        return cls(vmin, vmax, ebm, slices), pos

    def _packed(self):
        """Packed uint64 bitsets for the ebm and every slice, built
        once per part and reused across probes (an IN-list probes one
        decoded part many times). Word ops make the O'Neil walk
        O(rows/64) vectorized per slice — position-array set ops would
        cost seconds per probe on a 1M-row file at plan time."""
        import numpy as np

        if self._words is None:
            size = int(self.ebm[-1]) + 1 if self.ebm.size else 1
            n_words = (size + 63) // 64

            def pack(positions):
                w = np.zeros(n_words, dtype=np.uint64)
                if positions.size:
                    np.bitwise_or.at(
                        w,
                        positions >> 6,
                        np.uint64(1) << (positions & np.uint32(63)).astype(np.uint64),
                    )
                return w

            self._words = (pack(self.ebm), [pack(s) for s in self.slices])
        return self._words

    def eq_any(self, magnitude: int) -> bool:
        """Does ANY row in this part hold exactly ``magnitude``? The
        O'Neil EQ walk: start from the existence bitmap, intersect
        slice i when bit i of the offset is set, subtract it when
        clear."""
        import numpy as np

        if magnitude < self.min or magnitude > self.max:
            return False
        offset = magnitude - self.min
        if offset >> len(self.slices):
            return False  # needs more bits than any stored offset
        ebm_w, slice_w = self._packed()
        cand = ebm_w.copy()
        for i in range(len(self.slices) - 1, -1, -1):
            if offset >> i & 1:
                cand &= slice_w[i]
            else:
                cand &= ~slice_w[i]
            if not cand.any():
                return False
        return bool(cand.any())


class SpecBSI:
    """Decoded ``bsi`` payload (bit-sliced range index over roaring
    bitmaps): row count plus up to two sign parts — POSITIVE stores
    values >= 0, NEGATIVE stores ``-value`` for values < 0 (the JVM's
    BitSliceIndexBitmapFileIndex shape). The probe here is EXACT
    membership for equality/IN — like SpecBitmap, False prunes soundly
    with no false positives. Range predicates gain nothing at file
    granularity over the manifest min/max stats the planner already
    applies, so ``might_contain`` is the whole file-skip surface.

    Same confidence note as SpecBloom/SpecBitmap: implemented from the
    public fileindex spec page and the Apache Paimon source's
    documented shape; byte-level validation against a genuinely
    JVM-written index is pending a real lake
    (tools/validate_against_real_lake.py). Any decode failure —
    unknown version, torn bytes, layout drift — raises and the planner
    treats the file as unprunable (correct, merely unskipped)."""

    __slots__ = ("row_count", "positive", "negative", "kind")

    def __init__(self, row_count, positive, negative, kind):
        self.row_count = row_count
        self.positive = positive
        self.negative = negative
        self.kind = kind

    @classmethod
    def decode(cls, payload: bytes, kind: Optional[str]) -> "SpecBSI":
        if payload[0] != 1:
            raise ValueError(f"unsupported BSI index version {payload[0]}")
        (row_count,) = struct.unpack_from(">i", payload, 1)
        pos = 5
        positive = negative = None
        if payload[pos]:
            positive, pos = _BsiPart.decode(payload, pos + 1)
        else:
            pos += 1
        if payload[pos]:
            negative, pos = _BsiPart.decode(payload, pos + 1)
        return cls(row_count, positive, negative, kind)

    def encode(self) -> bytes:
        out = bytearray()
        out.append(1)
        out += struct.pack(">i", self.row_count)
        out.append(1 if self.positive is not None else 0)
        if self.positive is not None:
            out += self.positive.encode()
        out.append(1 if self.negative is not None else 0)
        if self.negative is not None:
            out += self.negative.encode()
        return bytes(out)

    def might_contain(self, value) -> bool:
        """EXACT membership via the O'Neil EQ walk — False means no
        row holds the value. None probes (NULL / unmappable shape)
        answer True conservatively."""
        m = bsi_map_value(value, self.kind)
        if m is None:
            return True
        if m >= 0:
            return self.positive is not None and self.positive.eq_any(m)
        return self.negative is not None and self.negative.eq_any(-m)


def build_spec_bsi(values, kind: Optional[str]) -> bytes:
    """Fixture/interop writer: the full BSI payload for a column's
    values in row order — rows split by sign into the two parts,
    magnitudes bit-sliced over the portable roaring codec."""
    pos_rows, neg_rows = [], []
    n_rows = 0
    for i, v in enumerate(values):
        n_rows = i + 1  # generator-safe row count (see build_spec_bitmap)
        m = bsi_map_value(v, kind)
        if m is None:
            if v is not None:
                raise ValueError(f"bsi index: cannot map {v!r} as {kind}")
            continue
        if m >= 0:
            pos_rows.append((i, m))
        else:
            neg_rows.append((i, -m))
    bsi = SpecBSI(
        n_rows,
        _BsiPart.build(pos_rows) if pos_rows else None,
        _BsiPart.build(neg_rows) if neg_rows else None,
        kind,
    )
    return bsi.encode()


# ---- container ----


def _read_utf(buf: bytes, pos: int):
    (ln,) = struct.unpack_from(">H", buf, pos)
    s = buf[pos + 2 : pos + 2 + ln].decode("utf-8")
    return s, pos + 2 + ln


def _write_utf(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def is_spec_file_index(data: bytes) -> bool:
    return len(data) >= 8 and struct.unpack_from(">q", data, 0)[0] == MAGIC


def read_file_index(data: bytes) -> Dict[str, Dict[str, bytes]]:
    """{column: {index type: payload bytes}} from a spec container.
    Raises ValueError on a non-spec or future-version payload."""
    if not is_spec_file_index(data):
        raise ValueError("not a spec file-index payload (bad magic)")
    (version,) = struct.unpack_from(">i", data, 8)
    if version != VERSION_1:
        raise ValueError(f"unsupported file-index version {version}")
    pos = 12 + 4  # skip head length
    (n_cols,) = struct.unpack_from(">i", data, 12 + 4)
    pos += 4
    out: Dict[str, Dict[str, bytes]] = {}
    for _ in range(n_cols):
        col, pos = _read_utf(data, pos)
        (n_idx,) = struct.unpack_from(">i", data, pos)
        pos += 4
        per_col = out.setdefault(col, {})
        for _ in range(n_idx):
            itype, pos = _read_utf(data, pos)
            start, length = struct.unpack_from(">ii", data, pos)
            pos += 8
            per_col[itype] = data[start : start + length]
    return out


def write_file_index(indexes: Dict[str, Dict[str, bytes]]) -> bytes:
    """Spec container for {column: {index type: payload bytes}} —
    used by fixtures and available for spec-interop writes."""
    head = bytearray()
    head += struct.pack(">i", len(indexes))
    # two passes: header size depends on itself via absolute offsets,
    # so lay out names first with placeholder offsets, then patch
    entries = []  # (patch_pos_in_head, payload)
    for col, per_col in indexes.items():
        head += _write_utf(col)
        head += struct.pack(">i", len(per_col))
        for itype, payload in per_col.items():
            head += _write_utf(itype)
            entries.append((len(head), payload))
            head += struct.pack(">ii", 0, 0)
    head += struct.pack(">i", 0)  # redundant length (V1: zero)
    prefix = struct.pack(">qii", MAGIC, VERSION_1, 16 + len(head))
    body_start = len(prefix) + len(head)
    body = bytearray()
    for patch_pos, payload in entries:
        struct.pack_into(
            ">ii", head, patch_pos, body_start + len(body), len(payload)
        )
        body += payload
    return bytes(prefix + head + body)
