"""Audit-log system table (read.py:audit_log_df): every stored row with
its RowKind string — the batch view of the reference's changelog model
(pypaimon/pynative/common/row/row_kind.py:22-57)."""

import pandas as pd
import pyarrow as pa

from paimon_python_spark import Schema, branch_info, create_branch


def _commit(t, frame):
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(frame)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def test_audit_log_append_table_all_inserts(catalog):
    df = pd.DataFrame({"k": [1, 2, 3]})
    catalog.create_table("default.ap", Schema(pa.Schema.from_pandas(df)), False)
    t = catalog.get_table("default.ap")
    _commit(t, df)
    log = t.audit_log().toPandas().sort_values("k")
    assert list(log.rowkind) == ["+I", "+I", "+I"]
    assert list(log.columns) == ["rowkind", "k"]


def test_audit_log_pk_table_kinds_and_history(catalog):
    df = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    catalog.create_table(
        "default.pk",
        Schema(pa.Schema.from_pandas(df), primary_keys=["k"], options={"bucket": "1"}),
        False,
    )
    t = catalog.get_table("default.pk")
    _commit(t, df)
    _commit(t, pd.DataFrame({"k": [2], "v": ["B"]}))  # upsert → +I
    pb = t.new_read_builder().new_predicate_builder()
    t.delete_where(pb.equal("k", 1))  # tombstone → -D

    log = t.audit_log().toPandas()
    got = sorted(zip(log.rowkind, log.k, log.v))
    assert got == [("+I", 1, "a"), ("+I", 2, "B"), ("+I", 2, "b"), ("-D", 1, "a")]

    # merged read still hides pre-images; snapshot-pinned audit log
    # excludes later commits
    merged = t.new_read_builder().new_read().to_pandas()
    assert sorted(zip(merged.k, merged.v)) == [(2, "B")]
    early = t.audit_log(snapshot_id=1).toPandas()
    assert sorted(zip(early.rowkind, early.k)) == [("+I", 1), ("+I", 2)]


def test_branches_system_table(catalog):
    df = pd.DataFrame({"k": [1]})
    catalog.create_table("default.bst", Schema(pa.Schema.from_pandas(df)), False)
    t = catalog.get_table("default.bst")
    _commit(t, df)
    _commit(t, df)
    create_branch(t, "dev")  # from latest (snapshot 2)
    create_branch(t, "old", snapshot_id=1)
    assert branch_info(t) == [("dev", 2), ("old", 1)]
    rows = {(r.branch_name, r.created_from_snapshot) for r in t.branches().collect()}
    assert rows == {("dev", 2), ("old", 1)}
