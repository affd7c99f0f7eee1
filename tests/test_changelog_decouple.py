"""Changelog lifecycle decoupling (Paimon's ``changelog.num-retained.
min/max`` + ``changelog.time-retained``): snapshot expiry rewrites an
expiring snapshot that carries a changelog as
``<table>/changelog/changelog-<id>`` (the Changelog JSON is the
snapshot JSON, as in real Paimon), its changelog manifests/files
survive, and streaming/incremental readers replay history PAST snapshot
expiry. A second expiry policy then bounds the changelog dir itself."""

import json
import os

import pytest

from paimon_python_spark.paimon_lake import (
    create_lake_table,
    expire_lake_changelogs,
    expire_lake_snapshots,
    read_lake_incremental,
    remove_lake_orphan_files,
    write_lake_pk_append,
)
from paimon_python_spark.session import set_spark


def _mk_lake(tmp_path, spark, name, extra_opts=None):
    set_spark(spark)
    p = str(tmp_path / name)
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "STRING")],
        primary_keys=["k"],
        options={
            "bucket": "1",
            "changelog-producer": "input",
            **(extra_opts or {}),
        },
    )
    for i in range(3):
        write_lake_pk_append(
            p, spark.createDataFrame([(i, f"v{i}")], "k int, v string")
        )
    return p


def test_decoupled_changelog_survives_snapshot_expiry(tmp_path, spark):
    p = _mk_lake(tmp_path, spark, "dcl", {"changelog.num-retained.min": "10"})
    res = expire_lake_snapshots(p, keep_last_n=1)
    assert res["snapshots_deleted"] == 2
    # the expired snapshots' changelogs were rewritten as Changelog
    # entries, with hints
    assert os.path.exists(os.path.join(p, "changelog", "changelog-1"))
    assert os.path.exists(os.path.join(p, "changelog", "changelog-2"))
    with open(os.path.join(p, "changelog", "EARLIEST")) as f:
        assert f.read() == "1"
    # full history replays from the changelog dir
    rows = (
        read_lake_incremental(p, 0, 3, use_changelog=True)
        .select("k", "v", "_row_kind")
        .collect()
    )
    assert sorted((r["k"], r["v"], r["_row_kind"]) for r in rows) == [
        (0, "v0", "+I"),
        (1, "v1", "+I"),
        (2, "v2", "+I"),
    ]
    # a delta read of the expired range must refuse loudly
    with pytest.raises(ValueError, match="use_changelog=True"):
        read_lake_incremental(p, 0, 3).collect()
    # orphan cleanup must not reap the decoupled files
    remove_lake_orphan_files(p, older_than_seconds=0.0)
    assert os.path.exists(os.path.join(p, "changelog", "changelog-1"))
    rows2 = read_lake_incremental(p, 0, 3, use_changelog=True).collect()
    assert len(rows2) == 3


def test_changelog_dir_expiry_policy(tmp_path, spark):
    p = _mk_lake(tmp_path, spark, "dcl2", {"changelog.num-retained.min": "10"})
    expire_lake_snapshots(p, keep_last_n=1)
    out = expire_lake_changelogs(p, keep_last_n=1)
    assert out["changelogs_deleted"] == 1
    assert out["changelog_files_deleted"] >= 1
    assert not os.path.exists(os.path.join(p, "changelog", "changelog-1"))
    assert os.path.exists(os.path.join(p, "changelog", "changelog-2"))
    # the surviving window still replays...
    assert read_lake_incremental(p, 1, 3, use_changelog=True).count() == 2
    # ...the reaped one is gone for good
    with pytest.raises(FileNotFoundError, match="expired"):
        read_lake_incremental(p, 0, 3, use_changelog=True).count()
    # option-driven policy: num-retained.min keeps the rest
    assert expire_lake_changelogs(p)["changelogs_deleted"] == 0


def test_undecoupled_expiry_deletes_changelog_files(tmp_path, spark):
    """Without changelog retention options, an expired snapshot takes
    its changelog files with it (previously they leaked to orphan
    cleanup)."""
    p = _mk_lake(tmp_path, spark, "dcl3")
    import glob

    n_before = len(glob.glob(os.path.join(p, "bucket-*", "changelog-*")))
    assert n_before == 3
    expire_lake_snapshots(p, keep_last_n=1)
    assert not os.path.isdir(os.path.join(p, "changelog"))
    n_after = len(glob.glob(os.path.join(p, "bucket-*", "changelog-*")))
    assert n_after == 1  # only the kept snapshot's changelog remains


def test_streaming_source_bootstraps_from_decoupled_changelog(tmp_path, spark):
    """A fresh PK changelog stream over a lake whose early snapshots
    expired must replay the decoupled changelog entries instead of
    refusing — the decoupling exists exactly for this consumer."""
    import tempfile

    from paimon_python_spark.lake_datasource import register_lake

    register_lake(spark)
    p = _mk_lake(tmp_path, spark, "dcl_stream", {"changelog.num-retained.min": "10"})
    expire_lake_snapshots(p, keep_last_n=1)
    stream = (
        spark.readStream.format("paimon_lake")
        .option("path", p)
        .option("changelog", "true")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dcl_stream_out")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dcl_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "SELECT k, v, _row_kind FROM dcl_stream_out ORDER BY k"
    ).collect()
    assert [(r["k"], r["v"], r["_row_kind"]) for r in out] == [
        (0, "v0", "+I"),
        (1, "v1", "+I"),
        (2, "v2", "+I"),
    ]


def test_time_based_changelog_expiry(tmp_path, spark):
    import time

    p = _mk_lake(
        tmp_path,
        spark,
        "dcl4",
        {
            "changelog.num-retained.min": "1",
            "changelog.time-retained": "1 h",
        },
    )
    expire_lake_snapshots(p, keep_last_n=1)
    # fresh: within the hour nothing goes
    assert expire_lake_changelogs(p)["changelogs_deleted"] == 0
    # two hours later both are stale; min guard keeps the newest
    out = expire_lake_changelogs(p, now_ms=time.time() * 1000 + 7_200_000)
    assert out["changelogs_deleted"] == 1
