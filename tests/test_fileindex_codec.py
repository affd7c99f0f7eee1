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
    assert all(
        e.embedded_index and fic.is_spec_file_index(e.embedded_index)
        for e in entries
    ), "bitmap columns force the spec container"
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
