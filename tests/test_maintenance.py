"""Snapshot expiration: kept snapshots stay fully readable; files live
nowhere in the kept range are physically reclaimed."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from paimon_python_spark import Schema
from paimon_python_spark.maintenance import expire_snapshots

SIMPLE = pa.schema([("f0", pa.int32()), ("f1", pa.string())])


def _write(table, df, overwrite=False):
    wb = table.new_batch_write_builder()
    if overwrite:
        wb.overwrite(None)
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def _count_data_files(table):
    n = 0
    for root, _, files in os.walk(os.path.join(table.table_path, "data")):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def test_expire_reclaims_overwritten_files(catalog):
    catalog.create_table("default.exp", Schema(SIMPLE), False)
    t = catalog.get_table("default.exp")
    _write(t, pd.DataFrame({"f0": [1, 2], "f1": ["a", "b"]}))
    _write(t, pd.DataFrame({"f0": [3], "f1": ["c"]}))
    # whole-table overwrite makes snapshots 1-2's files dead
    _write(t, pd.DataFrame({"f0": [9], "f1": ["z"]}), overwrite=True)
    files_before = _count_data_files(t)

    stats = expire_snapshots(t, keep_last_n=1)
    assert stats["snapshots_deleted"] == 2
    assert stats["data_files_deleted"] >= 2
    assert _count_data_files(t) < files_before

    out = t.new_read_builder().new_read().to_pandas()
    assert out["f0"].tolist() == [9]
    # expired snapshot is no longer a valid time-travel target
    rb = t.new_read_builder().with_snapshot(1)
    with pytest.raises(FileNotFoundError):
        rb.new_scan().plan()


def test_expire_keeps_live_append_files(catalog):
    """Pure appends: old snapshots expire but every file is still live
    in the latest snapshot — nothing must be deleted."""
    catalog.create_table("default.exp2", Schema(SIMPLE), False)
    t = catalog.get_table("default.exp2")
    for i in range(3):
        _write(t, pd.DataFrame({"f0": [i], "f1": [str(i)]}))
    stats = expire_snapshots(t, keep_last_n=1)
    assert stats["snapshots_deleted"] == 2
    assert stats["data_files_deleted"] == 0
    out = t.new_read_builder().new_read().to_pandas()
    assert sorted(out["f0"].tolist()) == [0, 1, 2]


def test_expire_noop_when_nothing_to_expire(catalog):
    catalog.create_table("default.exp3", Schema(SIMPLE), False)
    t = catalog.get_table("default.exp3")
    _write(t, pd.DataFrame({"f0": [1], "f1": ["a"]}))
    stats = expire_snapshots(t, keep_last_n=5)
    assert stats == {
        "snapshots_deleted": 0,
        "manifests_deleted": 0,
        "data_files_deleted": 0,
    }


def test_expire_after_compaction_reclaims_runs(catalog):
    from paimon_python_spark.compaction import compact_table

    catalog.create_table(
        "default.exp4",
        Schema(SIMPLE, primary_keys=["f0"], options={"bucket": "1"}),
        False,
    )
    t = catalog.get_table("default.exp4")
    _write(t, pd.DataFrame({"f0": [1, 2], "f1": ["a", "b"]}))
    _write(t, pd.DataFrame({"f0": [2, 3], "f1": ["B", "c"]}))
    compact_table(t)
    files_before = _count_data_files(t)
    stats = expire_snapshots(t, keep_last_n=1)
    assert stats["data_files_deleted"] >= 2  # the pre-compaction runs
    assert _count_data_files(t) < files_before
    out = t.new_read_builder().new_read().to_pandas().sort_values("f0")
    assert out["f1"].tolist() == ["a", "B", "c"]


def test_tags_create_list_read_delete(catalog):
    from paimon_python_spark import create_tag, delete_tag, list_tags

    catalog.create_table(
        "default.t_tags", Schema(pa.schema([("f0", pa.int64())])), False
    )
    t = catalog.get_table("default.t_tags")
    _write(t, pd.DataFrame({"f0": [1, 2]}))
    assert create_tag(t, "v1") == 1
    _write(t, pd.DataFrame({"f0": [3]}))
    assert t.create_tag("v2") == 2

    assert list_tags(t) == {"v1": 1, "v2": 2}
    assert [(r.tag_name, r.snapshot_id) for r in t.tags().collect()] == [
        ("v1", 1),
        ("v2", 2),
    ]

    # tag-pinned read sees the old state
    rb = t.new_read_builder().with_tag("v1")
    assert sorted(rb.new_read().to_pandas()["f0"]) == [1, 2]
    assert sorted(t.new_read_builder().new_read().to_pandas()["f0"]) == [1, 2, 3]

    with pytest.raises(ValueError, match="already exists"):
        create_tag(t, "v1")
    with pytest.raises(ValueError, match="unknown tag"):
        t.new_read_builder().with_tag("nope")
    with pytest.raises(ValueError, match="invalid tag name"):
        create_tag(t, "../escape")

    assert delete_tag(t, "v1") is True
    assert delete_tag(t, "v1") is False
    assert list_tags(t) == {"v2": 2}


def test_tagged_snapshot_survives_expiration(catalog):
    from paimon_python_spark import create_tag, delete_tag

    catalog.create_table(
        "default.t_tagexp",
        Schema(pa.schema([("k", pa.int64())])),
        False,
    )
    t = catalog.get_table("default.t_tagexp")
    _write(t, pd.DataFrame({"k": [1]}), overwrite=True)
    create_tag(t, "pinned", 1)
    _write(t, pd.DataFrame({"k": [2]}), overwrite=True)  # drops snap-1 files
    _write(t, pd.DataFrame({"k": [3]}), overwrite=True)

    stats = expire_snapshots(t, keep_last_n=1)
    assert stats["snapshots_deleted"] == 1  # snap 2 expired; snap 1 pinned

    # the tagged snapshot remains fully readable after expiration
    rb = t.new_read_builder().with_tag("pinned")
    assert rb.new_read().to_pandas()["k"].tolist() == [1]
    assert t.new_read_builder().new_read().to_pandas()["k"].tolist() == [3]
    # untagged old snapshot is gone as a time-travel target
    with pytest.raises(Exception):
        t.new_read_builder().with_snapshot(2).new_read().to_pandas()

    # untag -> the next expiration reclaims it
    delete_tag(t, "pinned")
    stats2 = expire_snapshots(t, keep_last_n=1)
    assert stats2["snapshots_deleted"] == 1
    assert stats2["data_files_deleted"] >= 1


def test_rollback_to_snapshot_and_tag(catalog):
    from paimon_python_spark import create_tag, rollback_to

    catalog.create_table(
        "default.t_rb", Schema(pa.schema([("k", pa.int64())])), False
    )
    t = catalog.get_table("default.t_rb")
    _write(t, pd.DataFrame({"k": [1]}))
    create_tag(t, "good", 1)
    _write(t, pd.DataFrame({"k": [2]}))
    _write(t, pd.DataFrame({"k": [3]}))
    assert sorted(t.new_read_builder().new_read().to_pandas()["k"]) == [1, 2, 3]

    new_id = rollback_to(t, tag="good")
    assert new_id == 4
    assert sorted(t.new_read_builder().new_read().to_pandas()["k"]) == [1]
    # time travel to the pre-rollback state still works (linear history)
    rb = t.new_read_builder().with_snapshot(3)
    assert sorted(rb.new_read().to_pandas()["k"]) == [1, 2, 3]
    # writes continue on top of the revert
    _write(t, pd.DataFrame({"k": [7]}))
    assert sorted(t.new_read_builder().new_read().to_pandas()["k"]) == [1, 7]

    with pytest.raises(ValueError, match="exactly one"):
        rollback_to(t)
    with pytest.raises(ValueError, match="exactly one"):
        rollback_to(t, snapshot_id=1, tag="good")


def test_rename_table(catalog):
    from paimon_python_spark.catalog import (
        TableAlreadyExistException,
        TableNotExistException,
    )

    catalog.create_table(
        "default.t_ren", Schema(pa.schema([("k", pa.int64())])), False
    )
    t = catalog.get_table("default.t_ren")
    _write(t, pd.DataFrame({"k": [5]}))
    catalog.rename_table("default.t_ren", "default.t_ren2")
    t2 = catalog.get_table("default.t_ren2")
    assert t2.new_read_builder().new_read().to_pandas()["k"].tolist() == [5]
    with pytest.raises(TableNotExistException):
        catalog.get_table("default.t_ren")
    with pytest.raises(TableNotExistException):
        catalog.rename_table("default.t_ren", "default.x")
    catalog.create_table(
        "default.t_ren3", Schema(pa.schema([("k", pa.int64())])), False
    )
    with pytest.raises(TableAlreadyExistException):
        catalog.rename_table("default.t_ren3", "default.t_ren2")


# ---- sort compaction ----


def _unsorted_commits(catalog, name="default.sc", n_commits=3):
    import pandas as pd
    import pyarrow as pa

    from paimon_python_spark import Schema

    rng = list(range(300))
    df0 = pd.DataFrame({"k": rng, "v": [i % 7 for i in rng]})
    catalog.create_table(name, Schema(pa.Schema.from_pandas(df0)), False)
    t = catalog.get_table(name)
    for c in range(n_commits):
        # interleaved values: every file's min/max spans the whole domain
        chunk = df0[df0.k % n_commits == c]
        wb = t.new_batch_write_builder()
        w, cm = wb.new_write(), wb.new_commit()
        w.write_pandas(chunk)
        cm.commit(w.prepare_commit())
        w.close()
        cm.close()
    return t, df0


def _planned_files(t, pred):
    rb = t.new_read_builder().with_filter(pred)
    return sum(len(s.file_paths()) for s in rb.new_scan().plan().splits())


def test_sort_compact_restores_stats_pruning(catalog):
    from paimon_python_spark import sort_compact_table

    t, df0 = _unsorted_commits(catalog)
    pb = t.new_read_builder().new_predicate_builder()
    pred = pb.between("k", 10, 20)
    before = _planned_files(t, pred)
    assert before == 3  # every unsorted file overlaps the range

    sid = sort_compact_table(t, ["k"])
    assert sid is not None
    after = _planned_files(t, pred)
    assert after < before  # disjoint ranges: most files now skipped

    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out.k) == list(df0.k)
    assert list(out.v) == list(df0.v)


def test_sort_compact_zorder_keeps_data(catalog):
    from paimon_python_spark import sort_compact_table

    t, df0 = _unsorted_commits(catalog, name="default.scz")
    sid = sort_compact_table(t, ["k", "v"], zorder=True)
    assert sid is not None
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out.k) == list(df0.k)


def test_sort_compact_rejects_pk_and_unknown_columns(catalog):
    import pandas as pd
    import pyarrow as pa
    import pytest

    from paimon_python_spark import Schema, sort_compact_table

    df = pd.DataFrame({"k": [1], "v": ["a"]})
    catalog.create_table(
        "default.pkt",
        Schema(pa.Schema.from_pandas(df), primary_keys=["k"], options={"bucket": "1"}),
        False,
    )
    with pytest.raises(ValueError):
        sort_compact_table(catalog.get_table("default.pkt"), ["k"])

    catalog.create_table("default.ap", Schema(pa.Schema.from_pandas(df)), False)
    with pytest.raises(ValueError):
        sort_compact_table(catalog.get_table("default.ap"), ["nope"])


def _commit_df(t, frame):
    import pandas as pd  # noqa: F401

    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(frame)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def test_rescale_bucket_rewrites_and_preserves_state(catalog):
    import pandas as pd
    import pyarrow as pa

    from paimon_python_spark import Schema, rescale_bucket

    df = pd.DataFrame({"k": list(range(20)), "v": [f"v{i}" for i in range(20)]})
    catalog.create_table(
        "default.rs",
        Schema(pa.Schema.from_pandas(df), primary_keys=["k"], options={"bucket": "2"}),
        False,
    )
    t = catalog.get_table("default.rs")
    _commit_df(t, df)
    _commit_df(t, pd.DataFrame({"k": [3, 7], "v": ["V3", "V7"]}))  # upserts
    pb = t.new_read_builder().new_predicate_builder()
    t.delete_where(pb.equal("k", 5))

    sid = rescale_bucket(t, 5)
    assert sid is not None

    # merged state unchanged, now spread over 5 buckets
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    expect = {i: f"v{i}" for i in range(20)}
    expect[3], expect[7] = "V3", "V7"
    del expect[5]
    assert dict(zip(out.k, out.v)) == expect
    buckets = {r.bucket for r in t.files().collect()}
    assert buckets == set(range(5))

    # later writes use the new count; merge stays correct across the mix
    _commit_df(t, pd.DataFrame({"k": [3], "v": ["V3b"]}))
    out2 = t.new_read_builder().new_read().to_pandas()
    assert dict(zip(out2.k, out2.v))[3] == "V3b"

    # reloading from the catalog sees the evolved schema option
    assert catalog.get_table("default.rs").schema.num_buckets() == 5
    # no-op and error paths
    assert rescale_bucket(t, 5) is None


def test_rescale_bucket_rejects_append_tables(catalog):
    import pandas as pd
    import pyarrow as pa
    import pytest

    from paimon_python_spark import Schema, rescale_bucket

    df = pd.DataFrame({"k": [1]})
    catalog.create_table("default.rsap", Schema(pa.Schema.from_pandas(df)), False)
    with pytest.raises(ValueError):
        rescale_bucket(catalog.get_table("default.rsap"), 4)


def test_remove_orphan_files(catalog):
    import os

    import pandas as pd
    import pyarrow as pa

    from paimon_python_spark import Schema, remove_orphan_files

    df = pd.DataFrame({"k": [1, 2, 3]})
    catalog.create_table("default.orph", Schema(pa.Schema.from_pandas(df)), False)
    t = catalog.get_table("default.orph")
    _commit_df(t, df)

    # plant an orphan (uncommitted debris) and an in-grace-period file
    data_dir = os.path.join(t.table_path, "data")
    old = os.path.join(data_dir, "part-orphan-old.parquet")
    new = os.path.join(data_dir, "part-orphan-new.parquet")
    for p in (old, new):
        with open(p, "wb") as f:
            f.write(b"debris")
    os.utime(old, (0, 0))  # ancient mtime

    stats = remove_orphan_files(t, older_than_seconds=3600)
    assert stats["orphans_deleted"] == 1
    assert not os.path.exists(old)
    assert os.path.exists(new)  # grace period protects fresh files

    # committed data untouched
    out = t.new_read_builder().new_read().to_pandas()
    assert sorted(out.k) == [1, 2, 3]


def test_compact_manifests_resets_chain_and_preserves_reads(catalog):
    """Manifest compaction: N commits -> N manifests; after compaction
    the latest snapshot references ONE manifest, reads are identical
    (including PK merge + commit order), incremental readers skip the
    COMPACT snapshot, and time travel to pre-compaction snapshots still
    works."""
    import pandas as pd
    import pyarrow as pa

    from paimon_python_spark import Schema, compact_manifests
    from paimon_python_spark.metadata import MetadataStore
    from paimon_python_spark.streaming import read_incremental

    schema = Schema(
        pa.schema([("k", pa.int64()), ("v", pa.string())]),
        primary_keys=["k"],
        options={"bucket": "2"},
    )
    catalog.create_table("default.mc", schema, False)
    t = catalog.get_table("default.mc")
    for i in range(3):
        wb = t.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        w.write_pandas(pd.DataFrame({"k": [1, 2, 10 + i], "v": [f"a{i}", f"b{i}", "x"]}))
        c.commit(w.prepare_commit())
        w.close()
        c.close()

    store = MetadataStore(t.table_path)
    before = store.latest_snapshot()
    assert len(before.manifests) == 3
    expected = t.new_read_builder().new_read().to_pandas().sort_values("k")

    sid = compact_manifests(t)
    assert sid == before.id + 1
    after = store.latest_snapshot()
    assert len(after.manifests) == 1
    assert after.total_record_count == before.total_record_count

    got = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert got.values.tolist() == expected.values.tolist()

    # second call is a no-op
    assert compact_manifests(t) is None

    # incremental read across the COMPACT snapshot sees no rows
    assert read_incremental(t, before.id, sid).count() == 0

    # time travel to the pre-compaction snapshot still resolves
    tt = (
        t.new_read_builder()
        .with_snapshot(before.id)
        .new_read()
        .to_pandas()
        .sort_values("k")
    )
    assert tt.values.tolist() == expected.values.tolist()

    # a fresh commit appends a single delta on top of the base
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(pd.DataFrame({"k": [99], "v": ["new"]}))
    c.commit(w.prepare_commit())
    w.close()
    c.close()
    assert len(store.latest_snapshot().manifests) == 2
    assert 99 in set(t.new_read_builder().new_read().to_pandas()["k"])


def test_auto_tag_creation_and_retention(spark, warehouse):
    import json
    import os

    from pyspark.sql import functions as F

    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _auto_create_lake_tag,
        create_lake_table,
        write_lake_append,
    )
    from paimon_python_spark.paimon_import import read_paimon_schema

    path = os.path.join(warehouse, "auto_tag_t")
    create_lake_table(
        path,
        [("k", "BIGINT NOT NULL")],
        options={
            "tag.automatic-creation": "process-time",
            "tag.creation-period": "daily",
        },
    )
    write_lake_append(path, spark.range(5).select(F.col("id").alias("k")))
    write_lake_append(path, spark.range(5, 8).select(F.col("id").alias("k")))
    tags = {
        r.tag_name: r.snapshot_id
        for r in PaimonLakeTable(path).tags().collect()
    }
    # same-period commits share one tag pinned at the FIRST commit
    # (two tags only if the run straddles a UTC midnight)
    assert len(tags) in (1, 2)
    assert tags[min(tags)] == 1
    # the tag is a full snapshot copy readable via with_tag
    rb = PaimonLakeTable(path).new_read_builder().with_tag(min(tags))
    assert rb.new_read().to_df().count() == 5

    # period + retention logic, driven directly with pinned clocks
    info = read_paimon_schema(path)
    info.options["tag.creation-period"] = "hourly"
    info.options["tag.num-retained-max"] = "2"
    day_ms = 1700000000000  # 2023-11-14 22:13:20 UTC
    for i, sid in enumerate((10, 11, 12)):
        snap = {"id": sid, "timeMillis": day_ms + i * 3600_000}
        _auto_create_lake_tag(path, info, snap)
    hourly = sorted(
        n for n in os.listdir(os.path.join(path, "tag"))
        if " " in n  # hourly names carry the hour suffix
    )
    assert len(hourly) == 2  # retention reaped the oldest hourly tag
    with open(os.path.join(path, "tag", hourly[-1])) as f:
        assert json.load(f)["id"] == 12
    # the daily tag from the real commits is NOT counted by hourly retention
    assert any(" " not in n for n in os.listdir(os.path.join(path, "tag")))

    # COMMIT time never raises (the snapshot is durable by then,
    # ADVICE r11): watermark mode with no watermark, real Paimon's
    # 'none' default, and foreign unknown modes all skip silently
    before = set(os.listdir(os.path.join(path, "tag")))
    info.options["tag.automatic-creation"] = "watermark"
    _auto_create_lake_tag(path, info, {"id": 1, "timeMillis": day_ms})
    info.options["tag.automatic-creation"] = "none"
    _auto_create_lake_tag(path, info, {"id": 1, "timeMillis": day_ms})
    info.options["tag.automatic-creation"] = "some-foreign-mode"
    _auto_create_lake_tag(path, info, {"id": 1, "timeMillis": day_ms})
    assert set(os.listdir(os.path.join(path, "tag"))) == before

    # watermark mode DOES tag when the snapshot carries a watermark
    info.options["tag.automatic-creation"] = "watermark"
    _auto_create_lake_tag(
        path, info, {"id": 13, "timeMillis": day_ms, "watermark": day_ms + 4 * 3600_000}
    )
    assert len(set(os.listdir(os.path.join(path, "tag"))) - before) == 1

    # CREATE time is where bad modes refuse
    import pytest as _pytest

    from paimon_python_spark.paimon_lake import create_lake_table

    with _pytest.raises(ValueError, match="tag.automatic-creation"):
        create_lake_table(
            os.path.join(os.path.dirname(path), "bad_tag_mode"),
            [("k", "BIGINT")],
            options={"tag.automatic-creation": "every-commit"},
        )


def test_engine_auto_tag_creation_and_retention(spark, catalog):
    from pyspark.sql import functions as F

    from paimon_python_spark import Schema
    from paimon_python_spark.metadata import MetadataStore
    from paimon_python_spark.tags import auto_create_tag, list_tags

    df = spark.range(5).select(F.col("id").alias("k"))
    catalog.create_table(
        "default.auto_tag_e",
        Schema(
            df.schema,
            options={
                "tag.automatic-creation": "process-time",
                "tag.creation-period": "daily",
            },
        ),
        False,
    )
    t = catalog.get_table("default.auto_tag_e")
    for lo, hi in ((0, 5), (5, 8)):
        wb = t.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        w.write_dataframe(
            spark.range(lo, hi).select(F.col("id").alias("k"))
        )
        c.commit(w.prepare_commit())
        w.close()
        c.close()
    tags = list_tags(t)
    assert len(tags) in (1, 2) and tags[min(tags)] == 1

    # retention over pinned clocks, hourly
    t.schema.options["tag.creation-period"] = "hourly"
    t.schema.options["tag.num-retained-max"] = "2"

    class _Snap:
        def __init__(self, sid, ms):
            self.id, self.time_millis = sid, ms

    base = 1700000000000
    for i, sid in enumerate((10, 11, 12)):
        auto_create_tag(t, _Snap(sid, base + i * 3600_000))
    hourly = {n: s for n, s in list_tags(t).items() if " " in n}
    assert len(hourly) == 2 and max(hourly.values()) == 12
    # the daily tag survived hourly retention
    assert any(" " not in n for n in list_tags(t))
    store = MetadataStore(t.table_path)
    assert store.latest_snapshot_id() == 2  # tags never move snapshots


def test_watermark_auto_tag_lake(spark, tmp_path):
    """tag.automatic-creation=watermark on a REAL lake: the commit's
    watermark (explicit or derived from tag.watermark-column's batch
    max) names the period tag; watermarks fold monotonically and never
    regress; no watermark → no tag."""
    import json
    import os

    from pyspark.sql import functions as F

    from paimon_python_spark.paimon_import import read_paimon_snapshot
    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        write_lake_append,
    )

    path = str(tmp_path / "wm_lake")
    create_lake_table(
        path,
        [("k", "BIGINT"), ("ts", "TIMESTAMP(6)")],
        options={
            "tag.automatic-creation": "watermark",
            "tag.creation-period": "daily",
            "tag.watermark-column": "ts",
        },
    )
    day1 = "2026-03-01 10:00:00"
    day2 = "2026-03-02 03:30:00"
    df1 = spark.range(3).select(
        F.col("id").alias("k"), F.lit(day1).cast("timestamp").alias("ts")
    )
    s1 = write_lake_append(path, df1)
    tags = sorted(os.listdir(os.path.join(path, "tag")))
    assert tags == ["tag-2026-03-01"]
    with open(os.path.join(path, "tag", tags[0])) as f:
        assert json.load(f)["id"] == s1

    # batch straddling into day2: watermark = max(ts) → day2 tag
    df2 = spark.range(3, 5).select(
        F.col("id").alias("k"), F.lit(day2).cast("timestamp").alias("ts")
    )
    s2 = write_lake_append(path, df2)
    tags = sorted(os.listdir(os.path.join(path, "tag")))
    assert tags == ["tag-2026-03-01", "tag-2026-03-02"]
    snap2 = read_paimon_snapshot(path, s2)
    wm2 = int(snap2["watermark"])
    assert wm2 > 0

    # LATE batch (older ts): the snapshot watermark must NOT regress,
    # and no new tag appears
    df3 = spark.range(5, 6).select(
        F.col("id").alias("k"), F.lit(day1).cast("timestamp").alias("ts")
    )
    s3 = write_lake_append(path, df3)
    assert int(read_paimon_snapshot(path, s3)["watermark"]) == wm2
    assert sorted(os.listdir(os.path.join(path, "tag"))) == tags

    # explicit watermark= beats the column derivation
    s4 = write_lake_append(
        path,
        spark.range(6, 7).select(
            F.col("id").alias("k"), F.lit(day1).cast("timestamp").alias("ts")
        ),
        watermark="2026-03-05T00:00:00",
    )
    assert "tag-2026-03-05" in os.listdir(os.path.join(path, "tag"))
    assert int(read_paimon_snapshot(path, s4)["watermark"]) > wm2


def test_watermark_auto_tag_engine(spark, catalog):
    """Engine twin: with_watermark() on the commit, or derivation from
    tag.watermark-column via the harvested file stats (zero extra IO);
    snapshot watermark folds monotonically."""
    from pyspark.sql import functions as F

    from paimon_python_spark import Schema
    from paimon_python_spark.metadata import MetadataStore
    from paimon_python_spark.tags import list_tags

    df = spark.range(3).select(
        F.col("id").alias("k"),
        F.lit("2026-03-01 10:00:00").cast("timestamp").alias("ts"),
    )
    catalog.create_table(
        "default.wm_tag_e",
        Schema(
            df.schema,
            options={
                "tag.automatic-creation": "watermark",
                "tag.creation-period": "daily",
                "tag.watermark-column": "ts",
            },
        ),
        False,
    )
    t = catalog.get_table("default.wm_tag_e")

    def commit(frame, watermark=None):
        wb = t.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        if watermark is not None:
            c.with_watermark(watermark)
        w.write_dataframe(frame)
        c.commit(w.prepare_commit())
        w.close()

    commit(df)
    assert sorted(list_tags(t)) == ["2026-03-01"]
    store = MetadataStore(t.table_path)
    wm1 = store.latest_snapshot().watermark
    assert wm1 is not None

    # later event time advances the watermark and tags the new day
    commit(
        spark.range(3, 5).select(
            F.col("id").alias("k"),
            F.lit("2026-03-02 01:00:00").cast("timestamp").alias("ts"),
        )
    )
    assert sorted(list_tags(t)) == ["2026-03-01", "2026-03-02"]
    wm2 = store.latest_snapshot().watermark
    assert wm2 > wm1

    # late data never regresses the fold
    commit(df.select("k", "ts"))
    assert store.latest_snapshot().watermark == wm2

    # explicit with_watermark wins over the column stats
    commit(df, watermark="2026-03-07T00:00:00")
    assert "2026-03-07" in list_tags(t)
