"""Branches: isolated snapshot chains over a shared immutable file pool
(branches.py). Branch = O(1) metadata; fast-forward = manifest-list swap."""

import pandas as pd
import pyarrow as pa
import pytest

from paimon_python_spark import (
    Schema,
    as_branch,
    create_branch,
    create_tag,
    delete_branch,
    fast_forward,
    list_branches,
)


def _commit(t, frame):
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(frame)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def _make(catalog, name="default.t", pk=False):
    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    kwargs = {"primary_keys": ["k"], "options": {"bucket": "2"}} if pk else {}
    catalog.create_table(name, Schema(pa.Schema.from_pandas(df), **kwargs), False)
    t = catalog.get_table(name)
    _commit(t, df)
    return t


def _read(t):
    return t.new_read_builder().new_read().to_pandas().sort_values("k")


def test_branch_write_isolated_from_main(catalog):
    t = _make(catalog)
    create_branch(t, "dev")
    b = as_branch(t, "dev")
    _commit(b, pd.DataFrame({"k": [4], "v": ["d"]}))

    assert list(_read(b).k) == [1, 2, 3, 4]
    assert list(_read(t).k) == [1, 2, 3]  # main untouched
    assert list_branches(t) == ["dev"]


def test_branch_from_snapshot_and_tag(catalog):
    t = _make(catalog)
    _commit(t, pd.DataFrame({"k": [4], "v": ["d"]}))  # snapshot 2
    create_tag(t, "v1", snapshot_id=1)
    create_branch(t, "from_snap", snapshot_id=1)
    create_branch(t, "from_tag", tag="v1")
    assert list(_read(as_branch(t, "from_snap")).k) == [1, 2, 3]
    assert list(_read(as_branch(t, "from_tag")).k) == [1, 2, 3]


def test_fast_forward_publishes_branch(catalog):
    t = _make(catalog)
    create_branch(t, "dev")
    b = as_branch(t, "dev")
    _commit(b, pd.DataFrame({"k": [4], "v": ["d"]}))
    _commit(b, pd.DataFrame({"k": [5], "v": ["e"]}))

    new_id = fast_forward(t, "dev")
    assert new_id == 2  # main had 1 snapshot
    assert list(_read(t).k) == [1, 2, 3, 4, 5]
    # main's history before the fast-forward is still addressable
    rb = t.new_read_builder().with_snapshot(1)
    assert len(rb.new_read().to_df(rb.new_scan().plan().splits()).collect()) == 3


def test_branch_pk_merge_and_dv(catalog):
    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    catalog.create_table(
        "default.pkdv",
        Schema(
            pa.Schema.from_pandas(df),
            primary_keys=["k"],
            options={"bucket": "2", "deletion-vectors.enabled": "true"},
        ),
        False,
    )
    t = catalog.get_table("default.pkdv")
    _commit(t, df)
    create_branch(t, "exp")
    b = as_branch(t, "exp")
    _commit(b, pd.DataFrame({"k": [2], "v": ["B"]}))  # branch upsert w/ DV

    assert list(_read(b).v) == ["a", "B", "c"]
    assert list(_read(t).v) == ["a", "b", "c"]
    fast_forward(t, "exp")
    assert list(_read(t).v) == ["a", "B", "c"]  # DV index travels


def test_branch_errors_and_delete(catalog):
    t = _make(catalog, name="default.e")
    create_branch(t, "dev")
    with pytest.raises(ValueError):
        create_branch(t, "dev")  # duplicate
    with pytest.raises(ValueError):
        as_branch(t, "nope")
    with pytest.raises(ValueError):
        create_branch(t, "bad/name")

    delete_branch(t, "dev")
    assert list_branches(t) == []
    # deleting the branch must not touch shared data
    assert list(_read(t).k) == [1, 2, 3]
