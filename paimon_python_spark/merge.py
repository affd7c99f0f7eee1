"""MERGE INTO: conditional upsert/delete/insert against a PK table.

Paimon exposes MERGE through its Spark SQL connector; the reference's
Python surface has only blind batch writes (pypaimon/api/
table_write.py:27-48). This is the engine-native equivalent: one
bounded read of the target's merged state, one join against the
source, and ONE atomic commit containing the resulting changelog rows
(+U / +I / -D), which merge-on-read then applies.

Scale shape: the join is keyed on the table's primary key, so it
shuffles source + target once on the same key the write layout
buckets by; no driver materialization anywhere. If the source is
small, mark it broadcast-able yourself (``F.broadcast(source)``)
before calling.

Conditions and update expressions are SQL strings over two aliases:
``src`` (the source rows) and ``tgt`` (the current target state) —
e.g. ``matched_update={"bal": "tgt.bal + src.delta"}``,
``matched_delete_condition="src.op = 'D'"``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, functions as F

from paimon_python_spark.write import (
    ROWKIND_DELETE,
    ROWKIND_INSERT,
    ROWKIND_UPDATE_AFTER,
)

_RK = "_merge_row_kind"


def _merge_changelog(
    target: DataFrame,
    source: DataFrame,
    keys: List[str],
    cols: List[str],
    matched_update: Optional[Dict[str, str]],
    matched_update_condition: Optional[str],
    matched_delete_condition: Optional[str],
    insert_not_matched: bool,
) -> DataFrame:
    """The MERGE join + action selection, shared by the engine-table
    and real-lake variants: returns the (+U / +I / -D) changelog rows
    with the kind in ``_RK``."""
    tgt = target.alias("tgt")
    src = source.alias("src")
    cond = [F.expr(f"src.{k} <=> tgt.{k}") for k in keys]
    joined = src.join(tgt, on=cond, how="left")
    matched = joined.filter(F.expr(f"tgt.{keys[0]}").isNotNull())

    actions = []
    if matched_delete_condition is not None:
        actions.append(
            matched.filter(F.expr(matched_delete_condition)).select(
                *[F.expr(f"tgt.{c}").alias(c) for c in cols],
                F.lit(ROWKIND_DELETE).alias(_RK),
            )
        )
    upd_cond = matched_update_condition or "true"
    if matched_delete_condition is not None:
        upd_cond = f"({upd_cond}) AND NOT ({matched_delete_condition})"
    if matched_update:
        actions.append(
            matched.filter(F.expr(upd_cond)).select(
                *[
                    F.expr(matched_update.get(c, f"tgt.{c}")).alias(c)
                    for c in cols
                ],
                F.lit(ROWKIND_UPDATE_AFTER).alias(_RK),
            )
        )
    if insert_not_matched:
        actions.append(
            joined.filter(F.expr(f"tgt.{keys[0]}").isNull()).select(
                *[F.expr(f"src.{c}").alias(c) for c in cols],
                F.lit(ROWKIND_INSERT).alias(_RK),
            )
        )
    if not actions:
        raise ValueError("merge_into: no actions configured")

    out = actions[0]
    for a in actions[1:]:
        out = out.unionByName(a)
    return out


def merge_into_lake(
    table_path: str,
    source: DataFrame,
    on: Optional[List[str]] = None,
    matched_update: Optional[Dict[str, str]] = None,
    matched_update_condition: Optional[str] = None,
    matched_delete_condition: Optional[str] = None,
    insert_not_matched: bool = True,
) -> int:
    """MERGE INTO a REAL fixed-bucket PK Paimon lake: one bounded read
    of the lake's merged state, one key-shuffled join against the
    source, and ONE spec APPEND commit of the resulting changelog rows
    (+U / +I / -D as level-0 key-value records) that every Paimon
    reader's merge resolves. Same condition/expression surface as
    :func:`merge_into`. Returns the new snapshot id."""
    from paimon_python_spark.paimon_import import read_paimon_schema
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        write_lake_pk_append,
    )

    info = read_paimon_schema(table_path)
    if not info.primary_keys:
        raise ValueError("merge_into_lake requires a primary-key lake")
    keys = list(on or info.primary_keys)
    cols = [f.name for f in info.spark_schema.fields]
    if matched_update:
        unknown = set(matched_update) - set(cols)
        if unknown:
            raise ValueError(
                f"merge_into_lake: unknown update columns {sorted(unknown)}"
            )
        if set(matched_update) & set(keys):
            raise ValueError("merge_into_lake: cannot update join-key columns")
    target = PaimonLakeTable(table_path).new_read_builder().new_read().to_df()
    out = _merge_changelog(
        target,
        source,
        keys,
        cols,
        matched_update,
        matched_update_condition,
        matched_delete_condition,
        insert_not_matched,
    )
    return write_lake_pk_append(table_path, out, row_kind_col=_RK)


def merge_into(
    table,
    source: DataFrame,
    on: Optional[List[str]] = None,
    matched_update: Optional[Dict[str, str]] = None,
    matched_update_condition: Optional[str] = None,
    matched_delete_condition: Optional[str] = None,
    insert_not_matched: bool = True,
) -> None:
    """Apply a MERGE of ``source`` into ``table`` as one commit.

    - ``on``: join keys (default: the table's primary keys).
    - matched + ``matched_delete_condition`` → row deleted.
    - matched + ``matched_update_condition`` (default: any remaining
      match) → row updated per ``matched_update`` (columns not listed
      keep the target value). Delete wins over update on overlap.
    - not matched → inserted from source when ``insert_not_matched``.
    - matched rows meeting no condition are left untouched (nothing is
      written for them).
    """
    schema = table.schema
    if not schema.is_primary_key_table():
        raise ValueError("merge_into requires a primary-key table")
    keys = list(on or schema.primary_keys)
    cols = schema.field_names
    if matched_update:
        unknown = set(matched_update) - set(cols)
        if unknown:
            raise ValueError(f"merge_into: unknown update columns {sorted(unknown)}")
        if set(matched_update) & set(keys):
            raise ValueError("merge_into: cannot update join-key columns")

    target = table.new_read_builder().new_read().to_df()
    out = _merge_changelog(
        target,
        source,
        keys,
        cols,
        matched_update,
        matched_update_condition,
        matched_delete_condition,
        insert_not_matched,
    )

    wb = table.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    try:
        w.write_dataframe(out, row_kind_col=_RK)
        c.commit(w.prepare_commit())
    finally:
        w.close()
        c.close()
