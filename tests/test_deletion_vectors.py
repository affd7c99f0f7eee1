"""Deletion-vector mode: merge-on-read without the read-time shuffle.

Superseded row versions are marked at commit time in a per-file position
index (deletion_vectors.py); reads apply the index with a broadcast
anti-join. Mirrors the reference's merge semantics
(pypaimon/pynative/reader/sort_merge_reader.py:198-259 — same visible
state, different physical strategy)."""

import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from paimon_python_spark import Catalog, Schema


def _commit(t, frame, spark=None, kind_col=None):
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    if kind_col is None:
        w.write_pandas(frame)
    else:
        w.write_dataframe(spark.createDataFrame(frame), row_kind_col=kind_col)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def _dv_table(catalog, name="default.t", extra=None, partition_keys=None):
    df = pd.DataFrame({"k": [1, 2, 3, 4, 5, 6], "v": list("abcdef")})
    opts = {"bucket": "2", "deletion-vectors.enabled": "true"}
    opts.update(extra or {})
    catalog.create_table(
        name,
        Schema(
            pa.Schema.from_pandas(df),
            primary_keys=["k"],
            partition_keys=partition_keys or [],
            options=opts,
        ),
        False,
    )
    t = catalog.get_table(name)
    _commit(t, df)
    return t, df


def test_dv_upsert_and_delete(catalog, spark):
    t, _ = _dv_table(catalog)
    _commit(t, pd.DataFrame({"k": [2, 4], "v": ["B", "D"]}))
    _commit(t, pd.DataFrame({"k": [5], "v": ["x"], "_rk": [3]}), spark, "_rk")

    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out.k) == [1, 2, 3, 4, 6]
    assert list(out.v) == ["a", "B", "c", "D", "f"]


def test_dv_read_plan_has_no_shuffle_or_window(catalog):
    t, _ = _dv_table(catalog)
    _commit(t, pd.DataFrame({"k": [1], "v": ["A"]}))
    df = t.new_read_builder().new_read().to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    # the only exchange allowed is the broadcast of the tiny index
    assert "BroadcastHashJoin" in plan


def test_dv_time_travel_sees_per_snapshot_state(catalog):
    t, _ = _dv_table(catalog)
    _commit(t, pd.DataFrame({"k": [2], "v": ["B"]}))
    _commit(t, pd.DataFrame({"k": [2], "v": ["B2"]}))

    for sid, expected in ((1, "b"), (2, "B"), (3, "B2")):
        rb = t.new_read_builder().with_snapshot(sid)
        out = (
            rb.new_read()
            .to_df(rb.new_scan().plan().splits())
            .toPandas()
            .sort_values("k")
        )
        assert list(out[out.k == 2].v) == [expected]


def test_dv_compaction_rewrites_and_prunes_index(catalog):
    from paimon_python_spark.compaction import compact_table
    from paimon_python_spark.metadata import MetadataStore

    t, _ = _dv_table(catalog)
    _commit(t, pd.DataFrame({"k": [2, 4], "v": ["B", "D"]}))
    sid = compact_table(t, small_file_threshold=2)
    assert sid is not None
    snap = MetadataStore(t.table_path).read_snapshot(sid)
    # every marked file was rewritten, so the compacted snapshot carries
    # no index at all
    assert snap.dv_index is None
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out.v) == ["a", "B", "c", "D", "e", "f"]


def test_dv_rollback_restores_index(catalog):
    from paimon_python_spark import rollback_to

    t, _ = _dv_table(catalog)
    _commit(t, pd.DataFrame({"k": [2], "v": ["B"]}))  # snapshot 2, has DV
    _commit(t, pd.DataFrame({"k": [2], "v": ["B2"]}))  # snapshot 3
    rollback_to(t, snapshot_id=2)
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out[out.k == 2].v) == ["B"]


def test_dv_partitioned_table(catalog):
    df = pd.DataFrame(
        {"p": ["x", "x", "y", "y"], "k": [1, 2, 3, 4], "v": list("abcd")}
    )
    catalog.create_table(
        "default.pt",
        Schema(
            pa.Schema.from_pandas(df),
            partition_keys=["p"],
            primary_keys=["p", "k"],
            options={"bucket": "2", "deletion-vectors.enabled": "true"},
        ),
        False,
    )
    t = catalog.get_table("default.pt")
    _commit(t, df)
    _commit(t, pd.DataFrame({"p": ["y"], "k": [3], "v": ["C"]}))
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out.v) == ["a", "b", "C", "d"]


@pytest.mark.parametrize(
    "schema_kwargs,options",
    [
        ({}, {"deletion-vectors.enabled": "true"}),  # no primary keys
        (
            {"primary_keys": ["k"]},
            {
                "bucket": "1",
                "deletion-vectors.enabled": "true",
                "merge-engine": "aggregation",
            },
        ),
        (
            {"primary_keys": ["k"]},
            {
                "bucket": "1",
                "deletion-vectors.enabled": "true",
                "file.format": "orc",
            },
        ),
    ],
)
def test_dv_invalid_option_combinations(catalog, schema_kwargs, options):
    df = pd.DataFrame({"k": [1], "v": ["a"]})
    catalog.create_table(
        "default.bad",
        Schema(pa.Schema.from_pandas(df), options=options, **schema_kwargs),
        False,
    )
    t = catalog.get_table("default.bad")
    with pytest.raises(ValueError):
        t.new_batch_write_builder()


def test_dv_index_is_distributed_at_100k_positions(catalog, spark):
    """The index never materializes on the driver: 100k+ stale
    positions are computed, stored (parquet index dataset), and applied
    without a single collect — the read plan's DV side is a parquet
    scan, not a LocalTableScan of driver rows."""
    import numpy as np

    n = 120_000
    df = pd.DataFrame({"k": np.arange(n, dtype="int64"), "v": np.arange(n)})
    catalog.create_table(
        "default.big",
        Schema(
            pa.Schema.from_pandas(df),
            primary_keys=["k"],
            options={"bucket": "4", "deletion-vectors.enabled": "true"},
        ),
        False,
    )
    t = catalog.get_table("default.big")
    _commit(t, df)
    _commit(t, df.assign(v=df.v + 1))  # every key superseded once

    from paimon_python_spark.metadata import MetadataStore

    store = MetadataStore(t.table_path)
    snap = store.latest_snapshot()
    assert snap.dv_index and not snap.dv_index.endswith(".json")

    from paimon_python_spark.deletion_vectors import read_dv_df

    marked = (
        read_dv_df(spark, t.table_path, snap)
        .select(F.explode("positions"))
        .count()
    )
    assert marked == n

    out = t.new_read_builder().new_read().to_df()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan  # no createDataFrame of DV rows
    assert out.count() == n
    assert out.agg({"v": "sum"}).collect()[0][0] == df.v.sum() + n


def test_dv_over_threshold_degrades_to_shuffled_anti_join(catalog):
    """Past deletion-vectors.index-broadcast-bytes the index is joined
    without a broadcast (shuffled anti-join) — same rows, no driver- or
    broadcast-sized ceiling on the index."""
    t, _ = _dv_table(
        catalog,
        name="default.nb",
        extra={"deletion-vectors.index-broadcast-bytes": "1"},
    )
    _commit(t, pd.DataFrame({"k": [2, 4], "v": ["B", "D"]}))
    out_df = t.new_read_builder().new_read().to_df()
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    out = out_df.toPandas().sort_values("k")
    assert list(out.v) == ["a", "B", "c", "D", "e", "f"]


def test_dv_value_predicate_skips_files(catalog):
    """In DV mode the merge is resolved at commit, so value-column stats
    can prune files (scan.py); without DVs the planner must keep all
    runs of a bucket."""
    df1 = pd.DataFrame({"k": [1, 2, 3], "v": [10, 11, 12]})
    df2 = pd.DataFrame({"k": [4, 5, 6], "v": [100, 101, 102]})
    for name, opts in (
        ("default.dvp", {"bucket": "1", "deletion-vectors.enabled": "true"}),
        ("default.plain", {"bucket": "1"}),
    ):
        catalog.create_table(
            name,
            Schema(pa.Schema.from_pandas(df1), primary_keys=["k"], options=opts),
            False,
        )
        t = catalog.get_table(name)
        _commit(t, df1)
        _commit(t, df2)

    def planned(t, lo, hi):
        pb = t.new_read_builder().new_predicate_builder()
        rb = t.new_read_builder().with_filter(pb.between("v", lo, hi))
        return sum(len(s.file_paths()) for s in rb.new_scan().plan().splits())

    dv_t = catalog.get_table("default.dvp")
    plain_t = catalog.get_table("default.plain")
    assert planned(dv_t, 50, 200) == 1  # first run's stats exclude it
    assert planned(plain_t, 50, 200) == 2  # value stats can't prune runs

    pb = dv_t.new_read_builder().new_predicate_builder()
    rb = dv_t.new_read_builder().with_filter(pb.between("v", 50, 200))
    out = rb.new_read().to_df(rb.new_scan().plan().splits()).toPandas()
    assert sorted(out.v) == [100, 101, 102]


# ---- spec-format roaring codec (real-lake DV read path) ----


def test_roaring_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from paimon_python_spark.roaring import (
        deserialize_roaring32,
        serialize_roaring32,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=0xFFFFFFFF),
            max_size=300,
        )
    )
    def check(vals):
        got = deserialize_roaring32(serialize_roaring32(vals))
        assert list(got) == sorted(set(vals))

    check()


def test_roaring_dense_container_boundary():
    """4096 is the array/bitmap container switch point — both sides of
    the boundary and a full 65536 container must roundtrip."""
    from paimon_python_spark.roaring import (
        deserialize_roaring32,
        serialize_roaring32,
    )

    for vals in (
        list(range(4096)),
        list(range(4097)),
        list(range(65536)),
        [v * 2 for v in range(5000)],  # dense-ish bitmap, gaps
    ):
        assert list(deserialize_roaring32(serialize_roaring32(vals))) == vals
