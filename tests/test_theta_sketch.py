"""theta_sketch.py — DataSketches compact-theta codec unit tests.

Pins the public wire format (preamble layout, flags, seed hash,
ordered hashes), the murmur3 x64-128 hash (vectorized long path vs the
from-the-spec scalar reference, plus the canonical empty-input/seed-0
vector), and the KMV estimate semantics (exact below k, within the
lgK=12 error envelope above)."""

import struct

import numpy as np
import pytest

from paimon_python_spark import theta_sketch as ts


def test_murmur_canonical_empty_vector():
    # the one universally published murmur3 x64-128 vector
    assert ts.murmur3_128(b"", seed=0) == (0, 0)


def test_hash_longs_matches_scalar_reference():
    rng = np.random.default_rng(42)
    vals = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    vec = ts.hash_longs(vals)
    sca = np.array(
        [ts.murmur3_128(struct.pack("<q", int(v)))[0] for v in vals],
        dtype=np.uint64,
    )
    assert (vec == sca).all()


def test_scalar_tail_lengths_self_consistent():
    # every tail branch (1..16 bytes + a 2-block run) hashes without
    # collision across lengths and is deterministic
    seen = set()
    for n in list(range(0, 17)) + [32, 33, 41]:
        data = bytes(i % 251 for i in range(n))
        h = ts.murmur3_128(data)
        assert h == ts.murmur3_128(data)  # deterministic
        assert h not in seen
        seen.add(h)


def test_compact_serialization_layout_exact_mode():
    sk = ts.sketch_of_longs(np.arange(10))
    pre_longs, ser_ver, family, _, _, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", sk, 0
    )
    assert (pre_longs, ser_ver, family) == (2, 3, 3)
    assert flags & 0x02 and flags & 0x08 and flags & 0x10  # RO|COMPACT|ORDERED
    assert not flags & 0x04  # not EMPTY
    assert seed_hash == ts.compute_seed_hash()
    retained = struct.unpack_from("<i", sk, 8)[0]
    assert retained == 10
    hashes = np.frombuffer(sk, dtype="<u8", count=retained, offset=16)
    assert (np.diff(hashes.astype(np.uint64)) > 0).all()  # sorted, distinct


def test_compact_serialization_layout_estimating_mode():
    sk = ts.sketch_of_longs(np.arange(50_000))
    pre_longs = sk[0] & 0x3F
    assert pre_longs == 3
    hashes, theta, empty = ts.deserialize_theta(sk)
    assert not empty
    assert hashes.size == 4096  # k = 2^12 retained after the KMV cut
    assert theta < np.uint64(0x7FFFFFFFFFFFFFFF)
    assert (hashes < theta).all()


def test_empty_sketch_is_8_bytes_with_empty_flag():
    sk = ts.sketch_of_longs(np.array([], dtype=np.int64))
    assert len(sk) == 8
    assert sk[5] & 0x04  # EMPTY
    assert ts.estimate_theta(sk) == 0.0
    u = ts.union_theta([sk, sk, None])
    assert ts.estimate_theta(u) == 0.0
    assert u[5] & 0x04


def test_exact_mode_estimate_is_exact_and_union_dedups():
    a = ts.sketch_of_longs(np.arange(0, 600))
    b = ts.sketch_of_longs(np.arange(400, 1000))
    assert ts.estimate_theta(a) == 600.0
    assert ts.estimate_theta(ts.union_theta([a, b])) == 1000.0
    assert ts.estimate_theta(ts.union_theta([a, b, None, a])) == 1000.0


def test_estimation_mode_error_envelope():
    n = 200_000
    est = ts.estimate_theta(ts.sketch_of_longs(np.arange(n)))
    assert abs(est - n) / n < 0.05  # lgK=12 → RSE ~1.6%

    halves = ts.union_theta(
        [
            ts.sketch_of_longs(np.arange(0, 120_000)),
            ts.sketch_of_longs(np.arange(80_000, 200_000)),
        ]
    )
    est_u = ts.estimate_theta(halves)
    assert abs(est_u - n) / n < 0.05


def test_union_mixed_exact_and_estimating_uses_min_theta():
    big = ts.sketch_of_longs(np.arange(100_000))
    small = ts.sketch_of_longs(np.arange(100_000, 100_050))
    _, theta_big, _ = ts.deserialize_theta(big)
    _, theta_u, _ = ts.deserialize_theta(ts.union_theta([big, small]))
    assert theta_u <= theta_big


def test_sketch_of_items_strings_and_bytes():
    sk = ts.sketch_of_items(["a", "b", "c", None, "a", b"a"])
    # "a" as str (utf-8) and b"a" hash identically; None skipped
    assert ts.estimate_theta(sk) == 3.0
    assert ts.sketch_of_items([]) == ts.sketch_of_longs(np.array([], dtype=np.int64))


def test_jvm_single_item_sketch_layout_parses():
    """DataSketches SingleItemSketch: preLongs=1, SINGLEITEM flag
    (0x20, no EMPTY), the one hash at byte 8 — a JVM FieldThetaSketchAgg
    stores one-distinct-value keys this way; it must NOT read as empty."""
    h = int(ts.hash_longs(np.array([42], dtype=np.int64))[0]) >> 1
    flags = 0x02 | 0x08 | 0x10 | 0x20  # RO|COMPACT|ORDERED|SINGLEITEM
    buf = struct.pack("<BBBBBBH", 1, 3, 3, 0, 0, flags, ts.compute_seed_hash())
    buf += struct.pack("<Q", h)
    hashes, theta, empty = ts.deserialize_theta(buf)
    assert not empty
    assert list(hashes) == [h]
    assert ts.estimate_theta(buf) == 1.0
    # and it unions like any sketch
    u = ts.union_theta([buf, ts.sketch_of_longs(np.array([42, 43]))])
    assert ts.estimate_theta(u) == 2.0
    # flag-less historic variant (preLongs=1, not EMPTY, hash present)
    buf2 = struct.pack(
        "<BBBBBBH", 1, 3, 3, 0, 0, 0x02 | 0x08 | 0x10, ts.compute_seed_hash()
    ) + struct.pack("<Q", h)
    hashes2, _, empty2 = ts.deserialize_theta(buf2)
    assert not empty2 and list(hashes2) == [h]


def test_seed_hash_mismatch_rejected():
    sk = ts.sketch_of_longs(np.arange(5), seed=9001)
    with pytest.raises(ValueError, match="seed hash mismatch"):
        ts.deserialize_theta(sk, seed=12345)


def test_lg_k_controls_retained():
    sk = ts.sketch_of_longs(np.arange(10_000), lg_k=8)
    hashes, theta, _ = ts.deserialize_theta(sk)
    assert hashes.size == 256
    est = ts.estimate_theta(sk)
    assert abs(est - 10_000) / 10_000 < 0.25  # lgK=8 → RSE ~6%
