"""Spec-format file-index (fileindex_codec): container round trip,
hash vectors, and JVM-layout bloom pruning through the lake planner."""

import os

import pytest

from paimon_python_spark.fileindex_codec import (
    BLOOM_INDEX_TYPE,
    MAGIC,
    SpecBloom,
    build_spec_bloom,
    is_spec_file_index,
    read_file_index,
    value_hash64,
    write_file_index,
    xxh64,
)


def test_xxh64_reference_vectors():
    """Public xxHash reference vectors (XXH64, seed 0) — the byte-type
    hash the spec page names for bloom indexes."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999
    # all length branches: 4-7, 8-31, >=32 bytes
    assert xxh64(b"12345", 0) != xxh64(b"12346", 0)
    assert xxh64(b"0123456789abcdef", 0) != 0
    assert xxh64(b"x" * 100, 0) != xxh64(b"x" * 101, 0)
    assert xxh64(b"abc", 42) != xxh64(b"abc", 0)


def test_value_hash_dispatch():
    import datetime

    assert value_hash64(None) is None
    assert value_hash64(5) == value_hash64(5)
    assert value_hash64(5) != value_hash64(6)
    assert value_hash64("s") == xxh64(b"s")
    assert value_hash64(b"s") == xxh64(b"s")
    assert value_hash64(datetime.date(1970, 1, 2)) == value_hash64(1)
    assert value_hash64(1.5) != value_hash64(1)


def test_container_roundtrip_and_probe():
    bloom_k = build_spec_bloom(range(100), items=200)
    bloom_u = build_spec_bloom([f"u{i}" for i in range(50)], items=100)
    data = write_file_index(
        {
            "k": {BLOOM_INDEX_TYPE: bloom_k.encode()},
            "u": {BLOOM_INDEX_TYPE: bloom_u.encode()},
        }
    )
    assert is_spec_file_index(data)
    assert int.from_bytes(data[:8], "big") == MAGIC
    back = read_file_index(data)
    assert set(back) == {"k", "u"}
    pk = SpecBloom.decode(back["k"][BLOOM_INDEX_TYPE])
    pu = SpecBloom.decode(back["u"][BLOOM_INDEX_TYPE])
    assert all(pk.might_contain(i) for i in range(100))
    assert all(pu.might_contain(f"u{i}") for i in range(50))
    # false-positive rate sane: absent probes mostly refused
    misses = sum(not pk.might_contain(i) for i in range(10_000, 10_500))
    assert misses > 400
    assert pu.might_contain(None)  # NULLs never prune via blooms


def test_container_rejects_foreign():
    with pytest.raises(ValueError):
        read_file_index(b"\x00" * 32)
    assert not is_spec_file_index(b"sparkgraft-bloom-v1 json payload")


def _patch_lake_with_spec_indexes(p):
    """Rewrite an engine lake's manifests the way JVM Paimon lays out
    bloom file indexes: file A gets the spec container EMBEDDED in the
    manifest slot, file B gets a standalone ``*.index`` EXTRA file."""
    import pyarrow.parquet as pq

    from paimon_python_spark.avro_codec import read_avro_records, write_avro_records

    mdir = os.path.join(p, "manifest")
    patched = 0
    for name in sorted(os.listdir(mdir)):
        path = os.path.join(mdir, name)
        with open(path, "rb") as f:
            schema, recs = read_avro_records(f.read())
        if not recs or "_FILE" not in recs[0]:
            continue
        changed = False
        for r in recs:
            fmeta = r["_FILE"]
            dpath = os.path.join(p, "bucket-0", fmeta["_FILE_NAME"])
            if not os.path.exists(dpath):
                continue
            vals = pq.read_table(dpath, columns=["u"]).column("u").to_pylist()
            payload = write_file_index(
                {"u": {BLOOM_INDEX_TYPE: build_spec_bloom(vals, items=500).encode()}}
            )
            if patched % 2 == 0:
                fmeta["_EMBEDDED_FILE_INDEX"] = payload
            else:
                iname = fmeta["_FILE_NAME"] + ".index"
                with open(os.path.join(p, "bucket-0", iname), "wb") as f:
                    f.write(payload)
                fmeta["_EXTRA_FILES"] = [iname]
            patched += 1
            changed = True
        if changed:
            write_avro_records(path, schema, recs)
    return patched


def test_jvm_layout_bloom_prunes_lake_reads(tmp_path, spark):
    """A lake carrying SPEC-format bloom file indexes (one embedded in
    the manifest slot, one as a standalone ``*.index`` extra file —
    both JVM layouts) prunes equality probes through the ordinary
    planner, and results stay row-exact."""
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "spec_bloom_lake")
    create_lake_table(p, [("k", "INT NOT NULL"), ("u", "STRING")])
    # interleaved u values: min/max of both files span the key space
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}") for i in range(0, 400, 2)], "k int, u string"
        ).coalesce(1),
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}") for i in range(1, 400, 2)], "k int, u string"
        ).coalesce(1),
    )
    assert _patch_lake_with_spec_indexes(p) == 2
    entries = plan_paimon_files(p)
    assert len(entries) == 2
    assert sum(1 for e in entries if e.embedded_index) == 1
    assert sum(1 for e in entries if e.extra_files) == 1
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("u", "u137"))  # odd file
    planned = _pruned_entries(p, info, rb)
    assert len(planned) == 1, "spec bloom must prune the even-only file"
    out = rb.new_read().to_pandas()
    assert list(out.k) == [137]
    rb2 = t.new_read_builder()
    rb2.with_filter(rb2.new_predicate_builder().equal("u", "u138"))  # even file
    assert len(_pruned_entries(p, info, rb2)) == 1
    # range predicates ignore blooms; both files plan, rows exact
    rb3 = t.new_read_builder()
    rb3.with_filter(rb3.new_predicate_builder().between("u", "u100", "u103"))
    assert len(_pruned_entries(p, info, rb3)) == 2
    assert sorted(rb3.new_read().to_pandas().k) == [100, 101, 102, 103]


def test_float_column_blooms_typed():
    """FLOAT columns hash via floatToIntBits (32-bit, sign-extended),
    not the double bit pattern — probing a FLOAT bloom with the double
    form would false-negative present values and prune unsoundly."""
    from paimon_python_spark.fileindex_codec import value_hash64

    f_bloom = build_spec_bloom([1.5, 2.5, -3.25], items=50, dtype="float")
    assert f_bloom.might_contain(1.5) and f_bloom.might_contain(-3.25)
    assert not f_bloom.might_contain(99.75)
    # the two hash forms genuinely differ — the dtype tag is load-bearing
    assert value_hash64(1.5, "float") != value_hash64(1.5)
    d_bloom = build_spec_bloom([1.5], items=10)  # double form
    assert d_bloom.might_contain(1.5)


def test_spec_blooms_typed_attaches_float_kind(tmp_path, spark):
    """_spec_blooms_typed tags FloatType columns so their probes use
    the 32-bit hash; other columns keep the default dispatch."""
    from paimon_python_spark.paimon_lake import (
        _spec_blooms_typed,
        create_lake_table,
        read_paimon_schema,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "typed_bloom_lake")
    create_lake_table(p, [("x", "FLOAT"), ("y", "DOUBLE"), ("s", "STRING")])
    info = read_paimon_schema(p)
    payload = write_file_index(
        {
            "x": {BLOOM_INDEX_TYPE: build_spec_bloom([1.5], items=10, dtype="float").encode()},
            "y": {BLOOM_INDEX_TYPE: build_spec_bloom([2.5], items=10).encode()},
        }
    )
    blooms = _spec_blooms_typed(info, payload)
    assert blooms["x"].dtype == "float" and blooms["y"].dtype is None
    assert blooms["x"].might_contain(1.5)
    assert blooms["y"].might_contain(2.5)


def test_spec_format_bloom_write_roundtrip(tmp_path, spark):
    """Opt-in file-index.format=spec: the engine writes JVM-parsable
    spec containers into the embedded slot (typed hashes — FLOAT via
    floatToIntBits) and its own planner prunes on them end-to-end;
    the default engine-tagged JSON path is untouched."""
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "spec_write_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("u", "STRING"), ("f", "FLOAT")],
        options={
            "file.format": "avro",  # group writer path
            "file-index.bloom-filter.columns": "u,f",
            "file-index.format": "spec",
        },
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}", float(i) + 0.5) for i in range(0, 200, 2)],
            "k int, u string, f float",
        ).coalesce(1),
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}", float(i) + 0.5) for i in range(1, 200, 2)],
            "k int, u string, f float",
        ).coalesce(1),
    )
    entries = plan_paimon_files(p)
    assert len(entries) == 2
    assert all(e.embedded_index and is_spec_file_index(e.embedded_index) for e in entries)
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("u", "u137"))  # odd file
    assert len(_pruned_entries(p, info, rb)) == 1
    assert list(rb.new_read().to_pandas().k) == [137]
    # FLOAT probe: typed 32-bit hash both at write and probe time
    rb2 = t.new_read_builder()
    rb2.with_filter(rb2.new_predicate_builder().equal("f", 42.5))  # even file
    assert len(_pruned_entries(p, info, rb2)) == 1
    assert list(rb2.new_read().to_pandas().k) == [42]


def test_bitmap_payload_roundtrip_and_probe():
    """Spec bitmap payload (BitmapFileIndex V1): per-type value
    dictionary round-trips, probes are EXACT membership, single
    occurrences take the negative-offset inline form, multi-row values
    carry portable roaring bitmaps, V2+ refuses at decode."""
    import datetime
    import struct

    import pytest as _pytest

    from paimon_python_spark import fileindex_codec as fic
    from paimon_python_spark.roaring import deserialize_roaring32

    cases = [
        ("int", [1, 5, 5, None, 9], [5, 1, 9], [2, 7]),
        ("bigint", [10**12, -3], [10**12, -3], [7]),
        ("string", ["a", "bb", "a", None], ["a", "bb"], ["c", ""]),
        ("double", [1.5, -2.25, 1.5], [1.5, -2.25], [3.14]),
        ("float", [1.5, 2.5], [1.5, 2.5], [3.5]),
        ("boolean", [True, False], [True, False], []),
        (
            "date",
            [datetime.date(2020, 1, 1)],
            [datetime.date(2020, 1, 1)],
            [datetime.date(1999, 1, 1)],
        ),
        (  # pandas hands DATE columns as Timestamps (writer path)
            "date",
            [__import__("pandas").Timestamp("2020-01-01")],
            [datetime.date(2020, 1, 1)],
            [datetime.date(1999, 1, 1)],
        ),
        ("binary", [b"\x00\x01", b"zz"], [b"zz"], [b"no"]),
        ("smallint", [1, 2], [2], [3]),
        ("tinyint", [1, 2], [2], [3]),
    ]
    for kind, vals, present, absent in cases:
        bm = fic.SpecBitmap.decode(fic.build_spec_bitmap(vals, kind), kind)
        assert bm.row_count == len(vals)
        for v in present:
            assert bm.might_contain(v), (kind, v)
        for v in absent:
            assert not bm.might_contain(v), (kind, v)
        assert bm.might_contain(None)  # NULL probes never prune

    payload = fic.build_spec_bitmap([7, 8, 7, 9, 7], "int")
    bm = fic.SpecBitmap.decode(payload, "int")
    head_len = len(bm.encode(None))
    off = bm.values[fic._bitmap_value_bytes(7, "int")]
    assert list(deserialize_roaring32(payload[head_len + off:])) == [0, 2, 4]
    assert bm.values[fic._bitmap_value_bytes(8, "int")] == -1 - 1

    with _pytest.raises(ValueError, match="version"):
        fic.SpecBitmap.decode(b"\x02" + b"\x00" * 20, "int")

    # container carries bloom + bitmap side by side
    blob = fic.write_file_index(
        {
            "c": {
                fic.BLOOM_INDEX_TYPE: fic.build_spec_bloom([1, 2]).encode(),
                fic.BITMAP_INDEX_TYPE: fic.build_spec_bitmap([1, 2], "int"),
            }
        }
    )
    doc = fic.read_file_index(blob)
    assert set(doc["c"]) == {fic.BLOOM_INDEX_TYPE, fic.BITMAP_INDEX_TYPE}


def test_bitmap_index_prunes_lake_reads(tmp_path, spark):
    """file-index.bitmap.columns on an engine-written lake: each file
    carries the spec bitmap payload (spec container — JVM-parsable),
    equality reads prune to exactly the files holding the value, and
    the EXACT dictionary prunes even where a bloom could false-positive
    (value between the file's min/max but absent)."""
    from paimon_python_spark import fileindex_codec as fic
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "bitmap_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("u", "STRING")],
        options={"file-index.bitmap.columns": "u"},
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}") for i in range(0, 400, 2)], "k int, u string"
        ).coalesce(1),
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}") for i in range(1, 400, 2)], "k int, u string"
        ).coalesce(1),
    )
    entries = plan_paimon_files(p)
    assert len(entries) == 2
    # ~2.4 KB payloads exceed the 500 B in-manifest default, so the
    # spec container lands as a standalone .index extra (JVM shape)
    assert all(
        (e.embedded_index and fic.is_spec_file_index(e.embedded_index))
        or any(str(n).endswith(".index") for n in (e.extra_files or []))
        for e in entries
    ), "bitmap columns force the spec container (embedded or standalone)"
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("u", "u137"))
    assert len(_pruned_entries(p, info, rb)) == 1
    assert list(rb.new_read().to_pandas().k) == [137]
    # EXACT pruning: a value inside both files' min/max ranges but
    # present in NEITHER plans zero files
    rb2 = t.new_read_builder()
    rb2.with_filter(rb2.new_predicate_builder().equal("u", "u137x"))
    assert len(_pruned_entries(p, info, rb2)) == 0
    assert rb2.new_read().to_pandas().empty
    # range predicates ignore the dictionary; rows stay exact
    rb3 = t.new_read_builder()
    rb3.with_filter(rb3.new_predicate_builder().between("u", "u100", "u103"))
    assert sorted(rb3.new_read().to_pandas().k) == [100, 101, 102, 103]


def test_bsi_payload_roundtrip_and_probe():
    """Spec BSI payload (BitSliceIndexBitmapFileIndex V1): sign-split
    bit-sliced roaring slices, EXACT membership via the O'Neil EQ walk
    across positive/negative/absent values, per-kind value mapping
    (date → epoch days, timestamp → epoch millis), generator-safe row
    counts, V2+ refuses at decode."""
    import datetime
    import random

    from paimon_python_spark import fileindex_codec as fic

    random.seed(11)
    vals = [random.randint(-300, 300) for _ in range(1500)] + [None] * 9
    bsi = fic.SpecBSI.decode(fic.build_spec_bsi(vals, "int"), "int")
    assert bsi.row_count == 1509
    present = {v for v in vals if v is not None}
    for v in range(-350, 351):
        assert bsi.might_contain(v) == (v in present), v
    assert bsi.might_contain(None) is True  # NULL probe: conservative

    # sign edges: zero, all-negative part, absent positive part
    b2 = fic.SpecBSI.decode(fic.build_spec_bsi([-42, -7, 0], "int"), "int")
    assert b2.might_contain(0) and b2.might_contain(-42) and b2.might_contain(-7)
    assert not b2.might_contain(-41) and not b2.might_contain(7)
    b3 = fic.SpecBSI.decode(fic.build_spec_bsi([-5, -5], "int"), "int")
    assert b3.positive is None and not b3.might_contain(5)

    # constant column → zero slices, eq only on the constant
    b4 = fic.SpecBSI.decode(fic.build_spec_bsi([9, 9, 9], "bigint"), "bigint")
    assert b4.might_contain(9) and not b4.might_contain(8) and not b4.might_contain(10)

    # typed kinds
    d = datetime.date(2024, 3, 1)
    b5 = fic.SpecBSI.decode(fic.build_spec_bsi([d], "date"), "date")
    assert b5.might_contain(d) and not b5.might_contain(datetime.date(2024, 3, 2))
    t = datetime.datetime(2024, 3, 1, 12, 0, 0, 123000)
    b6 = fic.SpecBSI.decode(fic.build_spec_bsi([t], "timestamp"), "timestamp")
    assert b6.might_contain(t)
    assert not b6.might_contain(t + datetime.timedelta(milliseconds=1))

    # generator input still records the true row count
    b7 = fic.SpecBSI.decode(
        fic.build_spec_bsi((v for v in [1, None, 3]), "int"), "int"
    )
    assert b7.row_count == 3 and b7.might_contain(3)

    # all-NULL file: empty parts, everything provably absent
    b8 = fic.SpecBSI.decode(fic.build_spec_bsi([None, None], "int"), "int")
    assert not b8.might_contain(0) and b8.row_count == 2

    # future version refuses (planner then treats the file unprunable)
    import pytest

    with pytest.raises(ValueError):
        fic.SpecBSI.decode(b"\x02" + b"\x00" * 16, "int")

    # unmappable kind probes conservatively
    b9 = fic.SpecBSI.decode(fic.build_spec_bsi([1, 2], "int"), None)
    assert b9.might_contain("x") is True


def test_bsi_index_prunes_lake_reads(tmp_path, spark):
    """file-index.bsi.columns on an engine-written lake: each file
    carries a spec-container BSI payload, equality reads prune to
    exactly the files holding the value, and the EXACT bit-sliced walk
    prunes a value inside a file's min/max but absent — where manifest
    stats alone cannot."""
    from paimon_python_spark import fileindex_codec as fic
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "bsi_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("amt", "BIGINT")],
        options={"file-index.bsi.columns": "amt"},
    )
    # file 1: even amounts 0..798; file 2: odd amounts 1..799 — every
    # probe value sits inside BOTH files' [min, max]
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, i * 2) for i in range(400)], "k int, amt bigint"
        ).coalesce(1),
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i + 400, i * 2 + 1) for i in range(400)], "k int, amt bigint"
        ).coalesce(1),
    )
    entries = plan_paimon_files(p)
    assert len(entries) == 2

    def _raw(e):
        if e.embedded_index:
            return e.embedded_index
        (xn,) = [n for n in (e.extra_files or []) if str(n).endswith(".index")]
        import os

        with open(
            os.path.join(p, os.path.dirname(e.rel_path([], [])), xn), "rb"
        ) as f:
            return f.read()

    payloads = []
    for e in entries:
        raw = _raw(e)
        assert fic.is_spec_file_index(raw), (
            "bsi columns force the spec container (embedded or standalone)"
        )
        payloads.append(fic.read_file_index(raw)["amt"])
    assert all(fic.BSI_INDEX_TYPE in d for d in payloads)
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("amt", 274))
    assert len(_pruned_entries(p, info, rb)) == 1
    assert list(rb.new_read().to_pandas().k) == [137]
    # EXACT: odd file only for an odd value
    rb2 = t.new_read_builder()
    rb2.with_filter(rb2.new_predicate_builder().equal("amt", 275))
    assert len(_pruned_entries(p, info, rb2)) == 1
    assert list(rb2.new_read().to_pandas().k) == [537]
    # IN with only-absent values plans zero files even though every
    # literal is inside both min/max ranges (800 < nothing here; use
    # in-range absent: BSI stores every parity, so probe out-of-set
    # values by exceeding max while staying in stats range is not
    # possible — instead check an IN that hits one parity)
    rb3 = t.new_read_builder()
    rb3.with_filter(rb3.new_predicate_builder().is_in("amt", [12, 34]))
    assert len(_pruned_entries(p, info, rb3)) == 1
    assert sorted(rb3.new_read().to_pandas().k) == [6, 17]
    # range predicates fall back to stats; rows stay exact
    rb4 = t.new_read_builder()
    rb4.with_filter(rb4.new_predicate_builder().between("amt", 100, 103))
    assert sorted(rb4.new_read().to_pandas().k) == [50, 51, 450, 451]


def test_bsi_index_prunes_absent_values_in_gaps(tmp_path, spark):
    """The case stats + bloom can miss: a value strictly inside a
    file's [min, max] that NO row holds — BSI's exact walk plans zero
    files (a bloom could false-positive here)."""
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "bsi_gap_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "INT")],
        options={"file-index.bsi.columns": "v"},
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, i * 10) for i in range(100)], "k int, v int"
        ).coalesce(1),
    )
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("v", 505))  # in (500, 510)
    assert len(_pruned_entries(p, info, rb)) == 0
    assert rb.new_read().to_pandas().empty


def test_index_in_manifest_threshold_parse():
    """Memory-size parsing for file-index.in-manifest-threshold: JVM
    MemorySize forms (unit suffixes, spacing, case), bare bytes, and
    the 500 B default on absence or garbage."""
    from paimon_python_spark.paimon_lake import _index_in_manifest_threshold

    class _I:
        def __init__(self, **opts):
            self.options = opts

    assert _index_in_manifest_threshold(_I()) == 500
    t = "file-index.in-manifest-threshold"
    assert _index_in_manifest_threshold(_I(**{t: "200 B"})) == 200
    assert _index_in_manifest_threshold(_I(**{t: "200"})) == 200
    assert _index_in_manifest_threshold(_I(**{t: "2 KB"})) == 2048
    assert _index_in_manifest_threshold(_I(**{t: "1kb"})) == 1024
    assert _index_in_manifest_threshold(_I(**{t: "3 MB"})) == 3 * 1024**2
    assert _index_in_manifest_threshold(_I(**{t: "1 gb"})) == 1024**3
    assert _index_in_manifest_threshold(_I(**{t: "weird"})) == 500
    assert _index_in_manifest_threshold(_I(**{t: "5 parsecs"})) == 500


def test_standalone_index_files_above_threshold(tmp_path, spark):
    """file-index.in-manifest-threshold: a spec index payload above it
    is written as a standalone <data-stem>.index file beside the data
    file and listed in _EXTRA_FILES (the JVM shape — manifests stay
    KB-scale however big the index grows); the planner prunes through
    it exactly as it does through embedded payloads, and orphan
    cleanup pins it for as long as its data file is referenced."""
    import os

    from paimon_python_spark import fileindex_codec as fic
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        remove_lake_orphan_files,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "standalone_idx_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("u", "STRING")],
        options={
            "file-index.bitmap.columns": "u",
            "file-index.in-manifest-threshold": "1 B",
        },
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}") for i in range(0, 300, 2)], "k int, u string"
        ).coalesce(1),
    )
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, f"u{i:03d}") for i in range(1, 300, 2)], "k int, u string"
        ).coalesce(1),
    )
    entries = plan_paimon_files(p)
    assert len(entries) == 2
    info = read_paimon_schema(p)
    part_types = []
    for e in entries:
        assert e.embedded_index is None, "above threshold: nothing embeds"
        assert e.extra_files and e.extra_files[0].endswith(".index")
        xp = os.path.join(
            p,
            os.path.dirname(e.rel_path([], part_types)),
            e.extra_files[0],
        )
        assert os.path.exists(xp)
        with open(xp, "rb") as f:
            assert fic.is_spec_file_index(f.read())
    # pruning still exact through the standalone file
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("u", "u131"))
    assert len(_pruned_entries(p, info, rb)) == 1
    assert list(rb.new_read().to_pandas().k) == [131]
    rb2 = t.new_read_builder()
    rb2.with_filter(rb2.new_predicate_builder().equal("u", "u131x"))
    assert len(_pruned_entries(p, info, rb2)) == 0
    # orphan cleanup pins referenced .index extras, removes strays
    stray = os.path.join(p, "bucket-0", "stray-deadbeef.index")
    with open(stray, "wb") as f:
        f.write(b"junk")
    os.utime(stray, (1, 1))  # well past any grace period
    for e in entries:  # age the real files too: cleanup must still keep them
        xp = os.path.join(
            p, os.path.dirname(e.rel_path([], part_types)), e.extra_files[0]
        )
        os.utime(xp, (1, 1))
    res = remove_lake_orphan_files(p, older_than_seconds=0.0)
    assert not os.path.exists(stray), res
    for e in entries:
        xp = os.path.join(
            p, os.path.dirname(e.rel_path([], part_types)), e.extra_files[0]
        )
        assert os.path.exists(xp), "referenced index extra must survive"
    # reads still good after cleanup
    rb3 = t.new_read_builder()
    rb3.with_filter(rb3.new_predicate_builder().equal("u", "u131"))
    assert list(rb3.new_read().to_pandas().k) == [131]


def test_small_index_payload_stays_embedded(tmp_path, spark):
    """At the 500 B default, a tiny spec payload embeds in the
    manifest entry — no standalone file appears."""
    import glob
    import os

    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "embedded_idx_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "INT")],
        options={"file-index.bsi.columns": "v"},
    )
    write_lake_append(
        p,
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int").coalesce(1),
    )
    (e,) = plan_paimon_files(p)
    assert e.embedded_index is not None and not e.extra_files
    assert not glob.glob(os.path.join(p, "**", "*.index"), recursive=True)


def test_front_door_write_standalone_index(tmp_path, spark):
    """df.write.format("paimon_lake") on an index-declaring lake with a
    low in-manifest threshold: the executor task writes the standalone
    .index beside its data file; reads through the front door prune on
    it (batch read stays hash-identical to the builder path)."""
    import os

    from paimon_python_spark.lake_datasource import register_lake
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    register_lake(spark)
    p = str(tmp_path / "fd_standalone_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("u", "STRING")],
        options={
            "file-index.bitmap.columns": "u",
            "file-index.in-manifest-threshold": "1 B",
        },
    )
    df = spark.createDataFrame(
        [(i, f"u{i:03d}") for i in range(200)], "k int, u string"
    ).coalesce(1)
    df.write.format("paimon_lake").option("path", p).mode("append").save()
    entries = plan_paimon_files(p)
    assert entries and all(
        e.embedded_index is None and e.extra_files for e in entries
    )
    for e in entries:
        xp = os.path.join(
            p, os.path.dirname(e.rel_path([], [])), e.extra_files[0]
        )
        assert os.path.exists(xp)
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("u", "u042"))
    assert len(_pruned_entries(p, info, rb)) == 1
    assert list(rb.new_read().to_pandas().k) == [42]
    back = (
        spark.read.format("paimon_lake").option("path", p).load()
        .filter("u = 'u042'")
    )
    assert [r.k for r in back.collect()] == [42]


def test_bloom_fpp_items_options(tmp_path, spark):
    """Per-column spec bloom sizing options (real Paimon's
    file-index.bloom-filter.<col>.fpp / .items): a tighter fpp and a
    larger items estimate produce a larger bit set for the same data;
    probes stay correct; garbage option values fall back to defaults."""
    from paimon_python_spark import fileindex_codec as fic
    from paimon_python_spark.paimon_import import plan_paimon_files
    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)

    def _bloom_len(opts, tag):
        p = str(tmp_path / f"bl_{tag}")
        create_lake_table(
            p,
            [("k", "INT NOT NULL"), ("u", "STRING")],
            options={
                "file-index.bloom-filter.columns": "u",
                "file-index.format": "spec",
                "file-index.in-manifest-threshold": "1 MB",
                **opts,
            },
        )
        write_lake_append(
            p,
            spark.createDataFrame(
                [(i, f"u{i:04d}") for i in range(500)], "k int, u string"
            ).coalesce(1),
        )
        (e,) = plan_paimon_files(p)
        doc = fic.read_file_index(e.embedded_index)
        bloom = fic.SpecBloom.decode(doc["u"][fic.BLOOM_INDEX_TYPE])
        # correctness regardless of sizing
        assert bloom.might_contain("u0123")
        return len(bloom.bits)

    base = _bloom_len({}, "base")
    tight = _bloom_len({"file-index.bloom-filter.u.fpp": "0.001"}, "tight")
    big = _bloom_len({"file-index.bloom-filter.u.items": "100000"}, "big")
    junk = _bloom_len(
        {
            "file-index.bloom-filter.u.fpp": "zero",
            "file-index.bloom-filter.u.items": "-3",
        },
        "junk",
    )
    assert tight > base, (tight, base)
    assert big > base, (big, base)
    assert junk == base, (junk, base)


def test_exact_index_probes_under_writing_schema(tmp_path, spark):
    """Index payloads are keyed and TYPED by the schema that wrote the
    file. After an int→bigint widening, probing with the CURRENT kind
    would encode 8-byte dictionary keys against a 4-byte dictionary —
    silently disabling the index at best, wrongly pruning at worst;
    after a rename SWAP, probing by current name would consult the
    wrong column's dictionary and prune files that match. The planner
    maps predicate fields to the file schema by FIELD ID and types the
    probes from it."""
    from paimon_python_spark.paimon_import import add_paimon_fixture_schema
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _pruned_entries,
        create_lake_table,
        read_paimon_schema,
        write_lake_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)

    # --- int → bigint widening ---
    p = str(tmp_path / "widen_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "INT")],
        options={
            "file-index.bitmap.columns": "v",
            "file-index.in-manifest-threshold": "1 MB",
        },
    )
    # even values only: every odd value is an in-range gap
    write_lake_append(
        p,
        spark.createDataFrame(
            [(i, 100 + 2 * i) for i in range(50)], "k int, v int"
        ).coalesce(1),
    )
    add_paimon_fixture_schema(
        p,
        [(0, "k", "INT NOT NULL"), (1, "v", "BIGINT")],
        options={
            "file-index.bitmap.columns": "v",
            "file-index.in-manifest-threshold": "1 MB",
        },
    )
    info = read_paimon_schema(p)
    t = PaimonLakeTable(p)
    rb = t.new_read_builder()
    rb.with_filter(rb.new_predicate_builder().equal("v", 150))  # present
    assert len(_pruned_entries(p, info, rb)) == 1
    assert list(rb.new_read().to_pandas().k) == [25]
    # in-range GAP value: only the exact index can prune this to zero —
    # proves the bitmap is ACTIVE (typed right) after the widening
    rb2 = t.new_read_builder()
    rb2.with_filter(rb2.new_predicate_builder().equal("v", 151))
    assert len(_pruned_entries(p, info, rb2)) == 0

    # --- rename swap: a <-> b ---
    p2 = str(tmp_path / "swap_lake")
    create_lake_table(
        p2,
        [("a", "INT"), ("b", "INT")],
        options={
            "file-index.bitmap.columns": "a,b",
            "file-index.in-manifest-threshold": "1 MB",
        },
    )
    # a holds 1000-range evens, b holds 2000-range evens
    write_lake_append(
        p2,
        spark.createDataFrame(
            [(1000 + 2 * i, 2000 + 2 * i) for i in range(50)], "a int, b int"
        ).coalesce(1),
    )
    add_paimon_fixture_schema(
        p2,
        [(0, "b", "INT"), (1, "a", "INT")],  # ids keep, names swap
        options={
            "file-index.bitmap.columns": "a,b",
            "file-index.in-manifest-threshold": "1 MB",
        },
    )
    info2 = read_paimon_schema(p2)
    t2 = PaimonLakeTable(p2)
    # current "b" is field id 0 = the old "a" data (1000-range)
    rb3 = t2.new_read_builder()
    rb3.with_filter(rb3.new_predicate_builder().equal("b", 1010))
    assert len(_pruned_entries(p2, info2, rb3)) == 1, (
        "swap: current-name probe must consult the OLD column's index"
    )
    rb4 = t2.new_read_builder()
    rb4.with_filter(rb4.new_predicate_builder().equal("b", 2010))  # old b's data
    assert len(_pruned_entries(p2, info2, rb4)) == 0, (
        "swap: value from the OTHER column must prune (exact dictionary)"
    )
