"""Table statistics (ANALYZE) — spec statistic file + $statistics.

Covers the surface the JVM writers expose via ANALYZE TABLE (the
reference SDK has none): the statistic JSON file shape, the ANALYZE
snapshot's ``statistics`` field (null on ordinary commits), the
backwards walk that resolves the newest stats, exact vs approx NDV,
and both front doors ($statistics through format("paimon_lake")).
"""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def lake(spark, warehouse):
    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        write_lake_pk_append,
    )

    path = os.path.join(warehouse, "stats_t")
    create_lake_table(
        path,
        [
            ("k", "BIGINT NOT NULL"),
            ("seg", "STRING"),
            ("bal", "DOUBLE"),
        ],
        primary_keys=["k"],
        options={"bucket": "2"},
    )
    src = spark.range(200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("seg-"), (F.col("id") % 7).cast("string"))
        ).alias("seg"),
        (F.col("id") * 1.25).alias("bal"),
    )
    write_lake_pk_append(path, src)
    # upsert half the keys so merged-state != stored rows
    write_lake_pk_append(
        path,
        src.filter(F.col("k") % 2 == 0).withColumn(
            "bal", F.col("bal") + 1000
        ),
    )
    return path


def test_analyze_writes_spec_stats_file(spark, lake):
    from paimon_python_spark.lake_statistics import (
        analyze_lake,
        read_lake_statistics,
    )
    from paimon_python_spark.paimon_import import read_paimon_snapshot

    sid = analyze_lake(lake, exact=True)
    assert sid == 3
    snap = read_paimon_snapshot(lake, sid)
    assert snap["commitKind"] == "ANALYZE"
    assert snap["deltaRecordCount"] == 0
    name = snap["statistics"]
    assert name and name.startswith("stats-")
    with open(os.path.join(lake, "statistics", name)) as f:
        on_disk = json.load(f)
    stats = read_lake_statistics(lake)
    assert stats == on_disk
    # stats describe the MERGED state at the analyzed snapshot
    assert stats["snapshotId"] == 2
    assert stats["mergedRecordCount"] == 200
    ks = stats["colStats"]["k"]
    assert ks == {
        "colId": 0,
        "distinctCount": 200,
        "min": 0,
        "max": 199,
        "nullCount": 0,
        "avgLen": 8,
        "maxLen": 8,
    }
    seg = stats["colStats"]["seg"]
    assert seg["distinctCount"] == 7
    assert seg["nullCount"] == 20
    assert seg["min"] == "seg-0" and seg["max"] == "seg-6"
    assert seg["maxLen"] == 5
    assert abs(seg["avgLen"] - 5.0) < 1e-9
    # merged values: evens were upserted to +1000
    bal = stats["colStats"]["bal"]
    assert bal["min"] == 1.25  # k=1 kept its original bal
    assert bal["max"] == 1000 + 198 * 1.25


def test_ordinary_commits_leave_statistics_null_and_walk_back(spark, lake):
    from paimon_python_spark.lake_statistics import (
        analyze_lake,
        read_lake_statistics,
    )
    from paimon_python_spark.paimon_import import read_paimon_snapshot
    from paimon_python_spark.paimon_lake import write_lake_pk_append

    assert read_lake_statistics(lake) is None  # never analyzed
    analyze_lake(lake, exact=True)
    write_lake_pk_append(
        lake,
        spark.range(5).select(
            F.col("id").alias("k"),
            F.lit("new").alias("seg"),
            F.lit(0.0).alias("bal"),
        ),
    )
    assert read_paimon_snapshot(lake, 4).get("statistics") is None
    # walk-back from the append still finds the ANALYZE's stats
    stats = read_lake_statistics(lake)
    assert stats is not None and stats["snapshotId"] == 2
    # time-travel BELOW the analyze snapshot: nothing to resolve
    assert read_lake_statistics(lake, snapshot_id=2) is None


def test_column_subset_and_approx(spark, lake):
    from paimon_python_spark.lake_statistics import (
        analyze_lake,
        read_lake_statistics,
    )

    with pytest.raises(ValueError, match="unknown columns"):
        analyze_lake(lake, columns=["nope"])
    analyze_lake(lake, columns=["k"], exact=False)
    stats = read_lake_statistics(lake)
    assert set(stats["colStats"]) == {"k"}
    ndv = stats["colStats"]["k"]["distinctCount"]
    # HLL estimate: within the default rsd of the true 200
    assert 180 <= ndv <= 220


def test_analyze_empty_table(spark, warehouse):
    from paimon_python_spark.lake_statistics import (
        analyze_lake,
        read_lake_statistics,
    )
    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        write_lake_append,
    )

    from paimon_python_spark.paimon_lake import delete_lake_rows
    from paimon_python_spark.predicate import PredicateBuilder

    path = os.path.join(warehouse, "empty_t")
    create_lake_table(
        path,
        [("k", "BIGINT NOT NULL"), ("v", "STRING")],
        options={"deletion-vectors.enabled": "true"},
    )
    write_lake_append(
        path, spark.range(3).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    )
    # empty MERGED state: every row deletion-vectored away
    pb = PredicateBuilder(
        spark.range(1).selectExpr("id AS k", "CAST(id AS STRING) AS v").schema
    )
    delete_lake_rows(path, pb.greater_or_equal("k", 0))
    analyze_lake(path, exact=True)
    stats = read_lake_statistics(path)
    assert stats["mergedRecordCount"] == 0
    ks = stats["colStats"]["k"]
    assert ks["nullCount"] == 0 and ks["min"] is None and ks["max"] is None
    assert ks["distinctCount"] == 0


def test_engine_analyze_twin(spark, catalog):
    from paimon_python_spark import Schema
    from paimon_python_spark.lake_statistics import read_table_statistics

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("seg"),
        (F.col("id") * 2.5).alias("bal"),
    )
    catalog.create_table(
        "default.an_t",
        Schema(df.schema, primary_keys=["k"], options={"bucket": "2"}),
        False,
    )
    t = catalog.get_table("default.an_t")
    for batch in (df, df.filter("k % 2 = 0").withColumn("bal", F.col("bal") + 7)):
        wb = t.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        w.write_dataframe(batch)
        c.commit(w.prepare_commit())
        w.close()
        c.close()
    assert read_table_statistics(t.table_path) is None
    sid = t.analyze(exact=True)
    assert sid == 3
    from paimon_python_spark.metadata import MetadataStore

    store = MetadataStore(t.table_path)
    snap = store.read_snapshot(3)
    assert snap.commit_kind == "ANALYZE" and snap.statistics
    assert snap.manifests == store.read_snapshot(2).manifests
    stats = read_table_statistics(t.table_path)
    assert stats["snapshotId"] == 2 and stats["mergedRecordCount"] == 100
    assert stats["colStats"]["k"]["distinctCount"] == 100
    assert stats["colStats"]["bal"]["max"] == 98 * 2.5 + 7  # k=98 upserted
    assert stats["colStats"]["seg"]["maxLen"] == 1
    # the system-table row and the engine front door agree
    row = t.statistics().collect()[0]
    assert row["mergedRecordCount"] == 100
    from paimon_python_spark.datasource import register

    register(spark)
    fd = (
        spark.read.format("paimon_spark")
        .option("path", t.table_path + "$statistics")
        .load()
        .collect()
    )
    assert [r.asDict() for r in fd] == [row.asDict()]
    # incremental readers see nothing from the ANALYZE snapshot
    from paimon_python_spark.streaming.incremental import read_incremental

    assert read_incremental(t, 2, 3).count() == 0


def test_orphan_cleanup_pins_referenced_stats_and_reaps_dead_ones(spark, lake):
    from paimon_python_spark.lake_statistics import (
        analyze_lake,
        read_lake_statistics,
    )
    from paimon_python_spark.paimon_import import read_paimon_snapshot
    from paimon_python_spark.paimon_lake import remove_lake_orphan_files

    analyze_lake(lake, exact=True)
    live = read_paimon_snapshot(lake, 3)["statistics"]
    # plant a dead stats file (a CAS-loser / expired-ANALYZE leftover)
    dead = os.path.join(lake, "statistics", "stats-deadbeef-0")
    with open(dead, "w") as f:
        f.write("{}")
    os.utime(dead, (1, 1))
    old = os.path.join(lake, "statistics", live)
    os.utime(old, (1, 1))  # well past any grace period
    out = remove_lake_orphan_files(lake, older_than_seconds=60)
    assert out["stats_files"] == 1
    assert not os.path.exists(dead)
    assert os.path.exists(old)  # referenced: pinned regardless of age
    assert read_lake_statistics(lake)["mergedRecordCount"] == 200


def test_engine_orphan_cleanup_reaps_dead_stats(spark, catalog):
    from paimon_python_spark import Schema
    from paimon_python_spark.lake_statistics import read_table_statistics
    from paimon_python_spark.maintenance import remove_orphan_files

    df = spark.range(10).select(F.col("id").alias("k"))
    catalog.create_table("default.an_orph", Schema(df.schema), False)
    t = catalog.get_table("default.an_orph")
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_dataframe(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()
    t.analyze(exact=True)
    from paimon_python_spark.metadata import MetadataStore

    live = MetadataStore(t.table_path).read_snapshot(2).statistics
    dead = os.path.join(t.table_path, "statistics", "stats-deadbeef-0")
    with open(dead, "w") as f:
        f.write("{}")
    os.utime(dead, (1, 1))
    os.utime(os.path.join(t.table_path, "statistics", live), (1, 1))
    out = remove_orphan_files(t, older_than_seconds=60)
    assert out["orphans_deleted"] == 1 and not os.path.exists(dead)
    assert read_table_statistics(t.table_path)["mergedRecordCount"] == 10


def test_statistics_system_table_and_front_door(spark, lake):
    from paimon_python_spark.lake_datasource import register_lake
    from paimon_python_spark.lake_statistics import analyze_lake
    from paimon_python_spark.paimon_lake import PaimonLakeTable

    t = PaimonLakeTable(lake)
    assert t.statistics().count() == 0  # never analyzed: empty
    analyze_lake(lake, exact=True)
    row = t.statistics().collect()[0]
    assert row["snapshot_id"] == 2 and row["mergedRecordCount"] == 200
    cs = json.loads(row["colstat"])
    assert cs["k"]["distinctCount"] == 200
    register_lake(spark)
    fd = (
        spark.read.format("paimon_lake")
        .option("path", lake + "$statistics")
        .load()
        .collect()
    )
    assert [r.asDict() for r in fd] == [row.asDict()]


def test_json_scalar_nonfinite_and_schema_pairing():
    """ADVICE r11: non-finite floats must serialize as null (strict JSON
    parsers reject Infinity tokens), and bad tag options raise at
    Schema-construction time, not commit time."""
    import math

    import pytest

    from paimon_python_spark.lake_statistics import _json_scalar
    from paimon_python_spark.schema import Schema
    from pyspark.sql import types as T

    assert _json_scalar(float("inf")) is None
    assert _json_scalar(float("-inf")) is None
    assert _json_scalar(float("nan")) is None
    assert _json_scalar(1.5) == 1.5

    st = T.StructType([T.StructField("k", T.LongType())])
    with pytest.raises(ValueError, match="tag.automatic-creation"):
        Schema(st, options={"tag.automatic-creation": "bogus"})
    with pytest.raises(ValueError, match="tag.creation-period"):
        Schema(st, options={
            "tag.automatic-creation": "process-time",
            "tag.creation-period": "weekly",
        })
    # valid declarations construct fine
    Schema(st, options={"tag.automatic-creation": "watermark"})
    Schema(st, options={"tag.automatic-creation": "none"})


def test_empty_tag_file_crash_recovery(tmp_path):
    """ADVICE r11: the old O_EXCL-then-write pattern could leave a
    permanently empty tag file after a crash. The hardlink-CAS publish
    never exposes a partial file: the name appears only with content."""
    import json
    import os

    from paimon_python_spark.tags import _publish_tag_exclusive

    p = str(tmp_path / "tag-2026-01-01")
    assert _publish_tag_exclusive(p, json.dumps({"id": 1}))
    with open(p) as f:
        assert json.load(f)["id"] == 1
    # second publisher loses idempotently, content untouched
    assert not _publish_tag_exclusive(p, json.dumps({"id": 2}))
    with open(p) as f:
        assert json.load(f)["id"] == 1
    # no temp litter
    assert os.listdir(tmp_path) == ["tag-2026-01-01"]
