"""paimon_python_spark — a PySpark-native analytics engine with the
capabilities of apache/paimon-python (a streaming data-lake table format
SDK), rebuilt Spark-first.

The reference (``/root/reference``, apache/paimon-python) exposes a
catalog/table/read-builder/write-builder API whose read side is
scan → pushdown → (for primary-key tables) sort-merge + dedup merge-on-read,
and whose write side is Arrow batch ingestion + a snapshot/commit protocol
(see SURVEY.md). This package re-expresses that surface on Spark:

- every read is a composed DataFrame (Catalyst handles pushdown/pruning),
- merge-on-read is a window-function dedup, not an iterator tree,
- the commit protocol is driver-side JSON snapshots/manifests,
- all relational operators (joins/aggs/windows/SQL) come from Spark itself
  (the reference delegates them to DuckDB/pandas after the read —
  pypaimon/api/table_read.py:47-56).

Public API mirrors ``pypaimon.api`` (pypaimon/api/__init__.py):
Catalog, Schema, Table, ReadBuilder, TableScan, Plan, Split, TableRead,
BatchWriteBuilder, BatchTableWrite, BatchTableCommit, CommitMessage,
PredicateBuilder, Predicate.

LAZY EXPORTS (PEP 562): the package ``__init__`` used to import every
submodule eagerly, pulling pandas + pyarrow + numpy (~0.5 s) into ANY
process that merely unpickles one of our classes. Spark 4's Python
data source protocol spawns a FRESH planner process per ``save()``
(schema resolution, write planning, commit — ``PythonPlannerRunner``
is never reused), and each of those paid the full package import just
to reach ``lake_datasource``; every first-use pandas-UDF worker paid
it too. With ``__getattr__``-resolved exports a planner worker now
imports only the light modules it actually touches (json/os/struct-
level); the public surface is unchanged — ``from paimon_python_spark
import X`` works for every name in ``__all__`` exactly as before.
"""

#: public name -> defining submodule; resolved on first attribute access
_EXPORTS = {
    "Catalog": "catalog",
    "Schema": "schema",
    "Predicate": "predicate",
    "PredicateBuilder": "predicate",
    "Table": "table",
    "ReadBuilder": "table",
    "RowType": "table",  # alias of table.ReadType, handled below
    "Plan": "scan",
    "Split": "scan",
    "TableScan": "scan",
    "TableRead": "read",
    "BatchTableCommit": "write",
    "BatchTableWrite": "write",
    "BatchWriteBuilder": "write",
    "CommitMessage": "write",
    "get_spark": "session",
    "set_spark": "session",
    "compact_manifests": "maintenance",
    "expire_snapshots": "maintenance",
    "remove_orphan_files": "maintenance",
    "rollback_to": "maintenance",
    "compact_table": "compaction",
    "rescale_bucket": "compaction",
    "sort_compact_table": "compaction",
    "as_branch": "branches",
    "branch_info": "branches",
    "create_branch": "branches",
    "delete_branch": "branches",
    "fast_forward": "branches",
    "list_branches": "branches",
    "create_tag": "tags",
    "delete_tag": "tags",
    "list_tags": "tags",
    "PaimonLakeCatalog": "paimon_lake",
    "PaimonLakeTable": "paimon_lake",
    "alter_lake_schema": "paimon_lake",
    "clear_lake_consumer": "paimon_lake",
    "compact_lake": "paimon_lake",
    "create_lake_branch": "paimon_lake",
    "create_lake_table": "paimon_lake",
    "create_lake_tag": "paimon_lake",
    "delete_lake_branch": "paimon_lake",
    "delete_lake_rows": "paimon_lake",
    "drop_lake_partitions": "paimon_lake",
    "expire_lake_partitions": "paimon_lake",
    "expire_lake_snapshots": "paimon_lake",
    "fast_forward_lake_branch": "paimon_lake",
    "list_lake_branches": "paimon_lake",
    "list_lake_consumers": "paimon_lake",
    "read_lake_consumer": "paimon_lake",
    "write_lake_consumer": "paimon_lake",
    "overwrite_lake": "paimon_lake",
    "read_lake_incremental": "paimon_lake",
    "remove_lake_orphan_files": "paimon_lake",
    "register_lake_sql_view": "paimon_lake",
    "rescale_lake_bucket": "paimon_lake",
    "rollback_lake": "paimon_lake",
    "sort_compact_lake": "paimon_lake",
    "stream_lake_snapshots": "paimon_lake",
    "update_lake_rows": "paimon_lake",
    "write_lake_append": "paimon_lake",
    "analyze_lake": "lake_statistics",
    "read_lake_statistics": "lake_statistics",
    "merge_into_lake": "merge",
    "export_paimon_table": "paimon_import",
    "import_paimon_table": "paimon_import",
}

__all__ = list(_EXPORTS)

__version__ = "0.1.0"


def __getattr__(name: str):
    import importlib

    mod_name = _EXPORTS.get(name)
    if mod_name is None:
        # `pkg.submodule` attribute access without an explicit import
        # (the eager __init__ used to bind its imported submodules)
        try:
            return importlib.import_module(f"{__name__}.{name}")
        except ModuleNotFoundError:
            raise AttributeError(
                f"module {__name__!r} has no attribute {name!r}"
            ) from None
    mod = importlib.import_module(f"{__name__}.{mod_name}")
    value = getattr(mod, "ReadType" if name == "RowType" else name)
    globals()[name] = value  # cache: next access skips __getattr__
    return value


def __dir__():
    return sorted(set(globals()) | set(__all__))
