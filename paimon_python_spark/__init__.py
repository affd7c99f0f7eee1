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
"""

from paimon_python_spark.catalog import Catalog
from paimon_python_spark.schema import Schema
from paimon_python_spark.predicate import Predicate, PredicateBuilder
from paimon_python_spark.table import Table, ReadBuilder
from paimon_python_spark.table import ReadType as RowType
from paimon_python_spark.scan import Plan, Split, TableScan
from paimon_python_spark.read import TableRead
from paimon_python_spark.write import (
    BatchTableCommit,
    BatchTableWrite,
    BatchWriteBuilder,
    CommitMessage,
)
from paimon_python_spark.session import get_spark, set_spark
from paimon_python_spark.maintenance import (
    compact_manifests,
    expire_snapshots,
    remove_orphan_files,
    rollback_to,
)
from paimon_python_spark.compaction import (
    compact_table,
    rescale_bucket,
    sort_compact_table,
)
from paimon_python_spark.branches import (
    as_branch,
    branch_info,
    create_branch,
    delete_branch,
    fast_forward,
    list_branches,
)
from paimon_python_spark.tags import create_tag, delete_tag, list_tags
from paimon_python_spark.paimon_lake import (
    PaimonLakeCatalog,
    PaimonLakeTable,
    alter_lake_schema,
    clear_lake_consumer,
    compact_lake,
    create_lake_branch,
    create_lake_table,
    create_lake_tag,
    delete_lake_branch,
    delete_lake_rows,
    drop_lake_partitions,
    expire_lake_partitions,
    expire_lake_snapshots,
    fast_forward_lake_branch,
    list_lake_branches,
    list_lake_consumers,
    read_lake_consumer,
    write_lake_consumer,
    overwrite_lake,
    read_lake_incremental,
    remove_lake_orphan_files,
    register_lake_sql_view,
    rescale_lake_bucket,
    rollback_lake,
    sort_compact_lake,
    stream_lake_snapshots,
    update_lake_rows,
    write_lake_append,
)
from paimon_python_spark.lake_statistics import (
    analyze_lake,
    read_lake_statistics,
)
from paimon_python_spark.merge import merge_into_lake
from paimon_python_spark.paimon_import import (
    export_paimon_table,
    import_paimon_table,
)

__all__ = [
    "PaimonLakeCatalog",
    "PaimonLakeTable",
    "alter_lake_schema",
    "analyze_lake",
    "clear_lake_consumer",
    "compact_lake",
    "create_lake_branch",
    "create_lake_table",
    "create_lake_tag",
    "delete_lake_branch",
    "delete_lake_rows",
    "drop_lake_partitions",
    "expire_lake_partitions",
    "expire_lake_snapshots",
    "fast_forward_lake_branch",
    "merge_into_lake",
    "list_lake_branches",
    "list_lake_consumers",
    "read_lake_consumer",
    "write_lake_consumer",
    "overwrite_lake",
    "remove_lake_orphan_files",
    "rescale_lake_bucket",
    "rollback_lake",
    "sort_compact_lake",
    "update_lake_rows",
    "read_lake_incremental",
    "read_lake_statistics",
    "register_lake_sql_view",
    "stream_lake_snapshots",
    "write_lake_append",
    "export_paimon_table",
    "import_paimon_table",
    "Catalog",
    "Schema",
    "Table",
    "Predicate",
    "PredicateBuilder",
    "ReadBuilder",
    "RowType",
    "Plan",
    "Split",
    "TableScan",
    "TableRead",
    "BatchTableCommit",
    "BatchTableWrite",
    "BatchWriteBuilder",
    "CommitMessage",
    "get_spark",
    "set_spark",
    "compact_manifests",
    "expire_snapshots",
    "remove_orphan_files",
    "rollback_to",
    "compact_table",
    "rescale_bucket",
    "sort_compact_table",
    "create_branch",
    "as_branch",
    "list_branches",
    "branch_info",
    "delete_branch",
    "fast_forward",
    "create_tag",
    "delete_tag",
    "list_tags",
]

__version__ = "0.1.0"
