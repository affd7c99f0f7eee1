"""Write/read round-trip suite — modeled on the reference's
pypaimon/py4j/tests/test_write_and_read.py (SURVEY §5): all write APIs ×
all read APIs, overwrite semantics, schema-mismatch errors, projection
incl. empty & reordered, parallel multi-commit reads."""

import pandas as pd
import pyarrow as pa
import pytest

from paimon_python_spark import Catalog, Schema

SIMPLE = pa.schema([("f0", pa.int32()), ("f1", pa.string())])


def _write(table, df, overwrite=None, do_overwrite=False):
    wb = table.new_batch_write_builder()
    if do_overwrite:
        wb.overwrite(overwrite)
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def test_write_read_all_apis(catalog):
    catalog.create_table("default.t", Schema(SIMPLE), False)
    t = catalog.get_table("default.t")
    df = pd.DataFrame({"f0": [1, 2, 3], "f1": ["a", "b", "c"]})

    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(df)
    w.write_arrow(pa.table({"f0": pa.array([4], pa.int32()), "f1": pa.array(["d"])}))
    w.write_arrow_batch(
        pa.RecordBatch.from_pydict(
            {"f0": pa.array([5], pa.int32()), "f1": pa.array(["e"])}
        )
    )
    c.commit(w.prepare_commit())
    w.close()
    c.close()

    rb = t.new_read_builder()
    splits = rb.new_scan().plan().splits()
    read = rb.new_read()

    expected = pd.DataFrame(
        {"f0": pd.array([1, 2, 3, 4, 5], dtype="int32"), "f1": list("abcde")}
    )
    result_pd = read.to_pandas(splits).sort_values("f0").reset_index(drop=True)
    pd.testing.assert_frame_equal(result_pd, expected, check_dtype=False)

    arrow = read.to_arrow(splits)
    assert arrow.num_rows == 5
    assert [f.name for f in arrow.schema] == ["f0", "f1"]

    batches = list(read.to_arrow_batch_reader(splits, batch_size=2))
    assert sum(b.num_rows for b in batches) == 5

    rows = list(read.to_record_generator(splits))
    assert {r["f1"] for r in rows} == set("abcde")

    sdf = read.to_df(splits)
    assert sdf.count() == 5

    con = read.to_duckdb(splits, table_name="duckdb_table")
    assert con.execute("SELECT count(*) FROM duckdb_table WHERE f0 < 4").fetchone()[0] == 3

    # to_ray: optional dependency exactly as in the reference
    # (java_implementation.py:255-258) — with ray installed it returns a
    # ray Dataset of the same rows; without, the import error surfaces
    try:
        import ray  # noqa: F401

        ds = read.to_ray(splits)
        assert ds.count() == 5
    except ImportError:
        import pytest

        with pytest.raises(ImportError):
            read.to_ray(splits)


def test_multi_commit_parallel_read(catalog):
    catalog.create_table("default.t", Schema(SIMPLE), False)
    t = catalog.get_table("default.t")
    for i in range(4):
        _write(t, pd.DataFrame({"f0": [i], "f1": [chr(ord("a") + i)]}))
    rb = t.new_read_builder()
    splits = rb.new_scan().plan().splits()
    assert len(splits) == 4
    result = rb.new_read().to_pandas(splits)
    # append reads come back in commit order (ConcatRecordReader parity)
    assert list(result["f0"]) == [0, 1, 2, 3]


def test_empty_table_read(catalog):
    catalog.create_table("default.t", Schema(SIMPLE), False)
    t = catalog.get_table("default.t")
    rb = t.new_read_builder()
    assert rb.new_scan().plan().splits() == []
    assert rb.new_read().to_pandas().empty
    assert rb.new_read().to_df().count() == 0


def test_write_wrong_width_rejected(catalog):
    catalog.create_table("default.t", Schema(SIMPLE), False)
    t = catalog.get_table("default.t")
    w = t.new_batch_write_builder().new_write()
    with pytest.raises(ValueError, match="Input schema isn't consistent with table schema"):
        w.write_arrow(pa.table({"f0": pa.array([1], pa.int64()), "f1": pa.array(["a"])}))


def test_nullability_ignored(catalog):
    # test_write_and_read.py:412-456: non-null table column accepts a
    # nullable input column (types only are checked)
    schema = Schema(pa.schema([pa.field("f0", pa.int32(), False), ("f1", pa.string())]))
    catalog.create_table("default.t", schema, False)
    t = catalog.get_table("default.t")
    w = t.new_batch_write_builder().new_write()
    w.write_arrow(
        pa.table({"f0": pa.array([1, 2], pa.int32()), "f1": pa.array(["a", None])})
    )
    wb = t.new_batch_write_builder()
    c = wb.new_commit()
    c.commit(w.prepare_commit())
    assert len(t.new_read_builder().new_read().to_pandas()) == 2


def test_overwrite_semantics(catalog):
    # F6 (test_write_and_read.py:311-383)
    schema = Schema(
        SIMPLE,
        partition_keys=["f0"],
        options={"dynamic-partition-overwrite": "false"},
    )
    catalog.create_table("default.t", schema, False)
    t = catalog.get_table("default.t")

    _write(t, pd.DataFrame({"f0": [1, 2], "f1": ["apple", "banana"]}))
    df = t.new_read_builder().new_read().to_pandas().sort_values("f0")
    assert list(df["f1"]) == ["apple", "banana"]

    _write(t, pd.DataFrame({"f0": [1], "f1": ["watermelon"]}), {"f0": "1"}, True)
    df = t.new_read_builder().new_read().to_pandas().sort_values("f0")
    assert list(df["f1"]) == ["watermelon", "banana"]

    _write(t, pd.DataFrame({"f0": [3], "f1": ["Neo"]}), None, True)
    df = t.new_read_builder().new_read().to_pandas()
    assert list(df["f1"]) == ["Neo"]


def test_dynamic_partition_overwrite(catalog):
    schema = Schema(SIMPLE, partition_keys=["f0"])  # default: dynamic
    catalog.create_table("default.t", schema, False)
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"f0": [1, 2], "f1": ["apple", "banana"]}))
    # overwrite(None) + dynamic=true → only partition 1 (present in new
    # data) is replaced; partition 2 survives
    _write(t, pd.DataFrame({"f0": [1], "f1": ["watermelon"]}), None, True)
    df = t.new_read_builder().new_read().to_pandas().sort_values("f0")
    assert list(df["f1"]) == ["watermelon", "banana"]


def test_projection(catalog):
    # F7 (test_write_and_read.py:458-518)
    schema = Schema(
        pa.schema(
            [("f0", pa.int64()), ("f1", pa.string()), ("f2", pa.bool_()), ("f3", pa.string())]
        )
    )
    catalog.create_table("default.t", schema, False)
    t = catalog.get_table("default.t")
    _write(
        t,
        pd.DataFrame(
            {
                "f0": [1, 2, 3],
                "f1": ["a", "b", "c"],
                "f2": [True, True, False],
                "f3": ["A", "B", "C"],
            }
        ),
    )
    rb = t.new_read_builder().with_projection([])
    assert rb.new_read().to_pandas(rb.new_scan().plan().splits()).empty

    rb = t.new_read_builder().with_projection(["f3", "f2"])
    result = rb.new_read().to_pandas(rb.new_scan().plan().splits())
    assert list(result.columns) == ["f3", "f2"]
    assert list(result["f3"]) == ["A", "B", "C"]

    assert rb.read_type() == ["f3", "f2"]

    with pytest.raises(ValueError):
        t.new_read_builder().with_projection(["nope"])


def test_split_metadata(catalog):
    # test_object_metadata.py:48-73
    catalog.create_table("default.t", Schema(SIMPLE), False)
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"f0": [1, 2, 3], "f1": ["a", "b", "c"]}))
    splits = t.new_read_builder().new_scan().plan().splits()
    assert len(splits) == 1
    s = splits[0]
    assert s.row_count() == 3
    assert s.file_size() > 0
    assert len(s.file_paths()) == 1
    assert s.file_paths()[0].endswith(".parquet")


def test_cannot_write_dynamic_bucket(catalog):
    schema = Schema(SIMPLE, primary_keys=["f0"])
    catalog.create_table("default.t", schema, False)
    t = catalog.get_table("default.t")
    with pytest.raises(TypeError) as e:
        t.new_batch_write_builder()
    assert str(e.value) == "Doesn't support writing dynamic bucket or cross partition table."


def test_catalog_errors(catalog):
    from paimon_python_spark.catalog import (
        DatabaseNotExistException,
        TableAlreadyExistException,
        TableNotExistException,
    )

    with pytest.raises(TableNotExistException):
        catalog.get_table("default.nope")
    with pytest.raises(DatabaseNotExistException):
        catalog.create_table("nodb.t", Schema(SIMPLE), False)
    catalog.create_table("default.t", Schema(SIMPLE), False)
    with pytest.raises(TableAlreadyExistException):
        catalog.create_table("default.t", Schema(SIMPLE), False)
    catalog.create_table("default.t", Schema(SIMPLE), True)  # ignore_if_exists


def test_time_travel_with_snapshot(catalog):
    """with_snapshot(n) reads the table as of commit n; PK tables merge
    only the files live at that snapshot."""
    catalog.create_table("default.tt", Schema(SIMPLE), False)
    t = catalog.get_table("default.tt")
    _write(t, pd.DataFrame({"f0": [1, 2], "f1": ["a", "b"]}))
    _write(t, pd.DataFrame({"f0": [3], "f1": ["c"]}))

    rb = t.new_read_builder().with_snapshot(1)
    out = rb.new_read().to_pandas(rb.new_scan().plan().splits())
    assert sorted(out["f0"].tolist()) == [1, 2]

    rb2 = t.new_read_builder()
    out2 = rb2.new_read().to_pandas()
    assert sorted(out2["f0"].tolist()) == [1, 2, 3]

    catalog.create_table(
        "default.tt_pk",
        Schema(SIMPLE, primary_keys=["f0"], options={"bucket": "1"}),
        False,
    )
    tp = catalog.get_table("default.tt_pk")
    _write(tp, pd.DataFrame({"f0": [1, 2], "f1": ["a", "b"]}))
    _write(tp, pd.DataFrame({"f0": [2], "f1": ["B"]}))
    rb3 = tp.new_read_builder().with_snapshot(1)
    out3 = rb3.new_read().to_pandas(rb3.new_scan().plan().splits())
    assert out3.sort_values("f0")["f1"].tolist() == ["a", "b"]
    out4 = tp.new_read_builder().new_read().to_pandas()
    assert out4.sort_values("f0")["f1"].tolist() == ["a", "B"]


def test_write_sort_columns_tightens_stats(catalog, spark):
    """write.sort-columns clusters rows so per-file min/max prune: with
    interleaved writes of the same key ranges, sorted files must yield
    fewer planned splits for a range predicate than unsorted ones."""
    import pyspark.sql.functions as F

    schema_pa = pa.schema([("k", pa.int64()), ("v", pa.string())])
    catalog.create_table(
        "default.sorted", Schema(schema_pa, options={"write.sort-columns": "k"}), False
    )
    t = catalog.get_table("default.sorted")
    # one commit, many partitions: each task sorts its slice
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    ).repartition(8)
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_dataframe(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()

    pb = t.new_read_builder().new_predicate_builder()
    rb = t.new_read_builder().with_filter(pb.equal("k", 1234))
    out = rb.new_read().to_pandas(rb.new_scan().plan().splits())
    assert out["k"].tolist() == [1234]
    # stats exist and are tight enough that a point probe doesn't open
    # every file
    all_splits = t.new_read_builder().new_scan().plan().splits()
    probe_splits = rb.new_scan().plan().splits()
    # range clustering makes file stats disjoint: a point probe plans
    # exactly one of the many files
    assert len(all_splits) > 1
    assert len(probe_splits) == 1


def test_zorder_clustering_prunes_both_dims(catalog, spark):
    """write.zorder-columns: after z-order clustering on (x, y), a
    selective range predicate on EITHER column prunes files — the
    property plain linear sorting only gives its leading column."""
    import pyspark.sql.functions as F

    schema_pa = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    catalog.create_table(
        "default.zorder",
        Schema(schema_pa, options={"write.zorder-columns": "x,y"}),
        False,
    )
    t = catalog.get_table("default.zorder")
    # 64x64 grid: x and y each uniform in [0, 64)
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_dataframe(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()

    all_splits = t.new_read_builder().new_scan().plan().splits()
    assert len(all_splits) > 2
    pb = t.new_read_builder().new_predicate_builder()
    for col in ("x", "y"):
        rb = t.new_read_builder().with_filter(pb.between(col, 0, 7))
        pruned = rb.new_scan().plan().splits()
        assert len(pruned) < len(all_splits), f"no pruning on {col}"
        out = rb.new_read().to_pandas(pruned)
        assert out[col].between(0, 7).all()
        assert len(out) == 8 * 64


def test_long_string_stats_truncated_but_sound(catalog):
    import json
    import os

    from paimon_python_spark import Schema
    import pyarrow as pa
    import pandas as pd

    catalog.create_table(
        "default.t_longstats",
        Schema(pa.schema([("k", pa.int64()), ("body", pa.string())])),
        False,
    )
    t = catalog.get_table("default.t_longstats")
    long_a = "a" * 500
    long_z = "z" * 500
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(pd.DataFrame({"k": [1, 2], "body": [long_a, long_z]}))
    c.commit(w.prepare_commit())
    w.close()
    c.close()

    # manifest stats are bounded in size...
    mdir = os.path.join(t.table_path, "manifest")
    entries = []
    for fn in os.listdir(mdir):
        with open(os.path.join(mdir, fn)) as f:
            data = json.load(f)
        entries.extend(e for e in data["entries"] if e.get("file"))
    st = entries[0]["file"]["stats"]["body"]
    assert len(st["min"]) <= 64 and len(st["max"]) <= 65
    assert st["min"] <= long_a  # sound lower bound
    assert st["max"] >= long_z  # sound upper bound

    # ...and pruning on the truncated stats still answers correctly
    pb = t.new_read_builder().new_predicate_builder()
    rb = t.new_read_builder().with_filter(pb.equal("body", long_z))
    assert rb.new_read().to_pandas()["k"].tolist() == [2]
    rb2 = t.new_read_builder().with_filter(pb.greater_than("body", "zz"))
    assert rb2.new_read().to_pandas()["k"].tolist() == [2]


def test_cannot_write_cross_partition_pk(catalog):
    """PK not containing the partition key → CROSS_PARTITION bucket
    mode; rejected at builder creation like the reference
    (java_utils.py:56-61)."""
    schema = Schema(
        pa.schema([("id", pa.int32()), ("dt", pa.string()), ("v", pa.string())]),
        partition_keys=["dt"],
        primary_keys=["id"],  # does not contain 'dt'
        options={"bucket": "2"},
    )
    catalog.create_table("default.crosspart", schema, False)
    t = catalog.get_table("default.crosspart")
    with pytest.raises(TypeError) as e:
        t.new_batch_write_builder()
    assert str(e.value) == "Doesn't support writing dynamic bucket or cross partition table."


def test_compat_options_accepted(catalog):
    """Reference accepts 'max-workers' (catalog) and 'sort-engine'
    (table) options (java_implementation.py:314-320); they are physical
    no-ops here (Spark owns parallelism and sorting) but must be
    accepted for config-file compatibility."""
    from paimon_python_spark import Catalog

    cat = Catalog.create({"warehouse": catalog.warehouse, "max-workers": "4"})
    schema = Schema(
        SIMPLE,
        primary_keys=["f0"],
        options={"bucket": "1", "sort-engine": "loser-tree"},
    )
    cat.create_database("default", True)
    cat.create_table("default.compat_opts", schema, False)
    t = cat.get_table("default.compat_opts")
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(pd.DataFrame({"f0": [1, 2], "f1": ["a", "b"]}))
    c.commit(w.prepare_commit())
    w.close()
    c.close()
    out = t.new_read_builder().new_read().to_pandas()
    assert len(out) == 2


def test_nested_projection_struct(catalog):
    """Nested projection (reference read_builder.py:36-38): a path into
    a struct prunes the struct to the named subfields; mixed flat +
    nested entries and multi-path merges both work."""
    schema = Schema(
        pa.schema(
            [
                ("id", pa.int64()),
                ("s", pa.struct([("x", pa.int64()), ("y", pa.string()), ("z", pa.float64())])),
                ("tag", pa.string()),
            ]
        ),
        options={"extended-types": "true"},
    )
    catalog.create_table("default.nested", schema, False)
    t = catalog.get_table("default.nested")
    w = t.new_batch_write_builder()
    wr, c = w.new_write(), w.new_commit()
    wr.write_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "s": pa.array(
                    [{"x": 10, "y": "a", "z": 1.5}, {"x": 20, "y": "b", "z": 2.5}],
                    pa.struct([("x", pa.int64()), ("y", pa.string()), ("z", pa.float64())]),
                ),
                "tag": pa.array(["t1", "t2"]),
            }
        )
    )
    c.commit(wr.prepare_commit())
    wr.close()
    c.close()

    # single nested path: struct pruned to one subfield
    rb = t.new_read_builder().with_projection([["s", "x"]])
    out = rb.new_read().to_df()
    assert out.columns == ["s"]
    assert out.schema["s"].dataType.fieldNames() == ["x"]
    assert sorted(r["s"]["x"] for r in out.collect()) == [10, 20]
    assert rb.read_type() == ["s"]

    # mixed flat + two paths into the same struct (merged, path order)
    rb = t.new_read_builder().with_projection(["id", ["s", "y"], ["s", "x"]])
    out = rb.new_read().to_df()
    assert out.columns == ["id", "s"]
    assert out.schema["s"].dataType.fieldNames() == ["y", "x"]
    rows = {r["id"]: (r["s"]["y"], r["s"]["x"]) for r in out.collect()}
    assert rows == {1: ("a", 10), 2: ("b", 20)}

    # whole-struct entry still takes every subfield; arrow path agrees
    rb = t.new_read_builder().with_projection(["s", "id"])
    arrow = rb.new_read().to_arrow()
    assert arrow.column_names == ["s", "id"]
    # nested path through the arrow adapter too
    rb = t.new_read_builder().with_projection([["s", "z"], "tag"])
    arrow = rb.new_read().to_arrow()
    assert arrow.column_names == ["s", "tag"]
    assert arrow.schema.field("s").type.num_fields == 1

    # bad paths rejected
    with pytest.raises(ValueError):
        t.new_read_builder().with_projection([["s", "nope"]])
    with pytest.raises(ValueError):
        t.new_read_builder().with_projection([["id", "x"]])


def test_snapshot_publish_is_compare_and_swap(catalog):
    from paimon_python_spark.metadata import (
        MetadataStore,
        Snapshot,
        SnapshotConflictError,
    )

    catalog.create_table("default.cas", Schema(SIMPLE), False)
    t = catalog.get_table("default.cas")
    store = MetadataStore(t.table_path)
    snap = Snapshot(
        id=1, schema_id=0, commit_kind="APPEND", manifests=[],
        total_record_count=0, delta_record_count=0, time_millis=0,
    )
    store.write_snapshot(snap)
    with pytest.raises(SnapshotConflictError):
        store.write_snapshot(snap)
    # the winner's snapshot is intact and LATEST points at it
    assert store.latest_snapshot_id() == 1


def test_commit_retries_past_concurrent_snapshot(catalog):
    """Optimistic concurrency: a commit that loses the id race must
    recompute against the winner's snapshot and publish the NEXT id,
    preserving both commits' rows."""
    from paimon_python_spark.metadata import MetadataStore

    catalog.create_table("default.race", Schema(SIMPLE), False)
    t = catalog.get_table("default.race")

    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(pd.DataFrame({"f0": pd.array([1], dtype="int32"), "f1": ["a"]}))
    msgs = w.prepare_commit()

    # interleave: a second writer commits AFTER this writer prepared but
    # BEFORE it commits — exactly the race the retry loop must survive
    wb2 = t.new_batch_write_builder()
    w2, c2 = wb2.new_write(), wb2.new_commit()
    w2.write_pandas(pd.DataFrame({"f0": pd.array([2], dtype="int32"), "f1": ["b"]}))
    # sabotage the first committer's view: freeze a stale latest_snapshot
    # (None) so its first publish targets id 1 and collides
    stale = {"n": 0}
    real_latest = c._commit_once.__self__.store.latest_snapshot
    store = c.store

    def flaky_latest():
        stale["n"] += 1
        if stale["n"] == 1:
            return None  # stale read: pretend no snapshot exists yet
        return real_latest()

    c2.commit(w2.prepare_commit())  # winner takes snapshot-1
    w2.close(); c2.close()

    store.latest_snapshot = flaky_latest
    # also stale the scan fallback once so the collision actually happens
    real_scan = store.max_snapshot_id_scan
    scan_calls = {"n": 0}

    def flaky_scan():
        scan_calls["n"] += 1
        if scan_calls["n"] == 1:
            return None
        return real_scan()

    store.max_snapshot_id_scan = flaky_scan
    c.commit(msgs)  # loses the race for id 1, retries, lands id 2
    w.close(); c.close()

    got = sorted(t.new_read_builder().new_read().to_pandas()["f1"])
    assert got == ["a", "b"]
    assert MetadataStore(t.table_path).latest_snapshot_id() == 2


def test_read_type_as_arrow(catalog):
    """Reference parity (test_object_metadata.py:36-47):
    read_type().as_arrow() yields the projected pyarrow schema while
    the object still compares as the name list."""
    import pyarrow as pa

    from paimon_python_spark import Schema

    pa_schema = pa.schema([("f0", pa.int32()), ("f1", pa.string())])
    catalog.create_table("default.rt_meta", Schema(pa_schema), False)
    t = catalog.get_table("default.rt_meta")
    rb = t.new_read_builder().with_projection(["f1"])
    rt = rb.read_type()
    assert rt == ["f1"]
    arrow = rt.as_arrow()
    assert arrow.names == ["f1"]
    assert arrow.field("f1").type == pa.string()


def test_many_concurrent_committers_one_lake(tmp_path, spark):
    """Real contention on the CAS snapshot commit: 4 threads x 3
    commits each race into one PK lake. Every commit must land (the
    O_EXCL snapshot create makes losers retry against the new head,
    never overwrite), snapshot ids must be a gapless 1..12, and the
    merged state must reflect every thread's last write per key — the
    1000-executor story is many committers, not one."""
    import threading

    from paimon_python_spark.paimon_import import (
        latest_paimon_snapshot_id,
        read_paimon_snapshot,
    )
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        create_lake_table,
        write_lake_pk_append,
    )

    p = str(tmp_path / "contended_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("owner", "STRING"), ("gen", "INT")],
        primary_keys=["k"],
        options={"bucket": "2"},
    )
    errors = []

    def work(tid: int):
        try:
            for gen in range(3):
                rows = [(tid * 10 + j, f"t{tid}", gen) for j in range(3)]
                write_lake_pk_append(
                    p,
                    spark.createDataFrame(
                        rows, "k int, owner string, gen int"
                    ),
                )
        except Exception as exc:  # noqa: BLE001 — surface in the main thread
            errors.append(f"t{tid}: {type(exc).__name__}: {exc}")

    threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), (
        "committer threads still running after 600s — machine overload, "
        "not a commit-protocol failure"
    )
    assert not errors, errors
    # gapless snapshot chain — losers retried, nobody overwrote
    latest = latest_paimon_snapshot_id(p)
    assert latest == 12
    for sid in range(1, latest + 1):
        read_paimon_snapshot(p, sid)  # every id exists and parses
    got = {
        r.k: (r.owner, r.gen)
        for r in PaimonLakeTable(p).new_read_builder().new_read().to_df().collect()
    }
    assert got == {
        t * 10 + j: (f"t{t}", 2) for t in range(4) for j in range(3)
    }


def test_engine_pk_write_width_capped_on_wide_sessions(spark):
    """An unpartitioned PK table has at most `bucket` groups: a session
    configured with a huge shuffle width must not fan a small commit
    into hundreds of near-empty write tasks (r13, width cap at 8x nb).
    Observed via the status tracker: no stage of the write job may run
    wider than the cap. Below the cap the keyless repartition (AQE
    coalescing) is preserved — asserted by plan shape."""
    import shutil
    import tempfile
    import time

    import pandas as pd

    from paimon_python_spark import Catalog, Schema

    sc = spark.sparkContext
    old = spark.conf.get("spark.sql.shuffle.partitions")
    wh = tempfile.mkdtemp(prefix="widthcap_")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "500")
        cat = Catalog.create({"warehouse": wh})
        cat.create_database("db", False)
        src = spark.range(2000).selectExpr("id AS k", "id * 2 AS v")
        cat.create_table(
            "db.t",
            Schema(src.schema, primary_keys=["k"], options={"bucket": "4"}),
            False,
        )
        t = cat.get_table("db.t")
        sc.setJobGroup("widthcap", "capped pk write")
        try:
            wb = t.new_batch_write_builder()
            w, c = wb.new_write(), wb.new_commit()
            w.write_dataframe(src)
            c.commit(w.prepare_commit())
            w.close()
            c.close()
        finally:
            sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        widths = set()
        deadline = time.time() + 10
        while time.time() < deadline:
            widths = {
                tracker.getStageInfo(sid).numTasks
                for jid in tracker.getJobIdsForGroup("widthcap")
                for sid in (tracker.getJobInfo(jid).stageIds if tracker.getJobInfo(jid) else [])
                if tracker.getStageInfo(sid) is not None
            }
            if widths:
                break
            time.sleep(0.2)
        assert widths, "no write job observed"
        assert max(widths) <= 32, (
            f"write stage ran {max(widths)} tasks — the 8x-bucket cap "
            f"(32) did not engage under shuffle.partitions=500: {widths}"
        )
        out = t.new_read_builder().new_read().to_pandas()
        assert len(out) == 2000
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        shutil.rmtree(wh, ignore_errors=True)
