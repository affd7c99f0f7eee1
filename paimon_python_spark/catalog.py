"""Filesystem catalog: databases + tables under a warehouse path.

Mirrors pypaimon/api/catalog.py:24-45 (``Catalog.create(options)``,
``get_table``, ``create_database``, ``create_table``) and the reference's
filesystem-warehouse layout: ``<warehouse>/<db>.db/<table>/``. Metadata
is JSON on disk — no JVM, no external service; Spark only enters the
picture when a table is read or written.
"""

from __future__ import annotations

import os

from paimon_python_spark.schema import Schema
from paimon_python_spark.table import Table


class DatabaseNotExistException(Exception):
    pass


class DatabaseAlreadyExistException(Exception):
    pass


class TableNotExistException(Exception):
    pass


class TableAlreadyExistException(Exception):
    pass


class Catalog:
    """Filesystem-backed catalog (the reference's only shipped catalog)."""

    def __init__(self, warehouse: str, options: dict):
        self.warehouse = warehouse
        self.options = options

    @staticmethod
    def create(catalog_options: dict) -> "Catalog":
        """Reference signature: ``Catalog.create({'warehouse': path, ...})``
        (pypaimon/py4j/java_implementation.py:50-55)."""
        warehouse = catalog_options.get("warehouse")
        if not warehouse:
            raise ValueError("Paimon catalog option 'warehouse' is required.")
        os.makedirs(warehouse, exist_ok=True)
        return Catalog(warehouse, dict(catalog_options))

    # -- paths --

    def _db_path(self, database_name: str) -> str:
        return os.path.join(self.warehouse, f"{database_name}.db")

    def _table_path(self, identifier: str) -> str:
        db, table = self._split(identifier)
        return os.path.join(self._db_path(db), table)

    @staticmethod
    def _split(identifier: str) -> tuple[str, str]:
        parts = identifier.split(".")
        if len(parts) != 2:
            raise ValueError(
                f"Cannot get splits from '{identifier}', please use 'database.table' format."
            )
        return parts[0], parts[1]

    # -- API (catalog.py:24-45) --

    def create_database(self, name: str, ignore_if_exists: bool, properties: dict | None = None) -> None:
        path = self._db_path(name)
        if os.path.isdir(path):
            if ignore_if_exists:
                return
            raise DatabaseAlreadyExistException(f"Database {name} already exists.")
        os.makedirs(path)

    def create_table(self, identifier: str, schema: Schema, ignore_if_exists: bool) -> None:
        db, _ = self._split(identifier)
        if not os.path.isdir(self._db_path(db)):
            raise DatabaseNotExistException(f"Database {db} does not exist.")
        path = self._table_path(identifier)
        if os.path.isdir(path):
            if ignore_if_exists:
                return
            raise TableAlreadyExistException(f"Table {identifier} already exists.")
        # Reference restriction: PK tables must declare a fixed bucket count
        # ('bucket': 'N'); dynamic bucket / cross-partition update tables
        # cannot be written (java_utils.py:56-61).
        os.makedirs(os.path.join(path, "schema"))
        with open(os.path.join(path, "schema", "schema-0.json"), "w") as f:
            f.write(schema.to_json())
        from paimon_python_spark.metadata import MetadataStore

        MetadataStore(path).init_dirs()

    @staticmethod
    def _latest_schema_file(path: str) -> str:
        schema_dir = os.path.join(path, "schema")
        versions = [
            int(n[len("schema-"):-len(".json")])
            for n in os.listdir(schema_dir)
            if n.startswith("schema-") and n.endswith(".json")
        ]
        return os.path.join(schema_dir, f"schema-{max(versions)}.json")

    def get_table(self, identifier: str) -> Table:
        path = self._table_path(identifier)
        if not os.path.isdir(path):
            raise TableNotExistException(f"Table {identifier} does not exist.")
        with open(self._latest_schema_file(path)) as f:
            schema = Schema.from_json(f.read())
        return Table(identifier, path, schema)

    # -- beyond the reference ABC: listing/dropping (Paimon-Java catalog
    # surface, handy for tooling) --

    def list_databases(self) -> list[str]:
        return sorted(
            n[: -len(".db")]
            for n in os.listdir(self.warehouse)
            if n.endswith(".db") and os.path.isdir(os.path.join(self.warehouse, n))
        )

    def list_tables(self, database_name: str) -> list[str]:
        path = self._db_path(database_name)
        if not os.path.isdir(path):
            raise DatabaseNotExistException(f"Database {database_name} does not exist.")
        return sorted(
            n
            for n in os.listdir(path)
            if os.path.isdir(os.path.join(path, n, "schema"))
        )

    def rename_table(self, from_identifier: str, to_identifier: str) -> None:
        src = self._table_path(from_identifier)
        if not os.path.isdir(src):
            raise TableNotExistException(f"Table {from_identifier} does not exist.")
        dst = self._table_path(to_identifier)
        db, _ = self._split(to_identifier)
        if not os.path.isdir(self._db_path(db)):
            raise DatabaseNotExistException(f"Database {db} does not exist.")
        if os.path.isdir(dst):
            raise TableAlreadyExistException(f"Table {to_identifier} already exists.")
        os.rename(src, dst)

    def drop_table(self, identifier: str, ignore_if_not_exists: bool = False) -> None:
        import shutil

        path = self._table_path(identifier)
        if not os.path.isdir(path):
            if ignore_if_not_exists:
                return
            raise TableNotExistException(f"Table {identifier} does not exist.")
        shutil.rmtree(path)

    def alter_table_add_column(
        self, identifier: str, name: str, pa_type, nullable: bool = True
    ) -> None:
        """Schema evolution: append a nullable column as schema-(N+1).

        Read-side NULL-filling for files written under older schemas is
        automatic (the reader passes the latest schema to the parquet
        scan — the reference does the same with an ``index_mapping``,
        data_file_record_reader.py:86-98)."""
        import pyarrow as pa
        from pyspark.sql import types as T

        from paimon_python_spark.types import pa_type_to_spark

        path = self._table_path(identifier)
        if not os.path.isdir(path):
            raise TableNotExistException(f"Table {identifier} does not exist.")
        current_file = self._latest_schema_file(path)
        with open(current_file) as f:
            schema = Schema.from_json(f.read())
        if name in schema.field_names:
            raise ValueError(f"Column {name} already exists.")
        if not nullable:
            raise ValueError("Added columns must be nullable (old files lack them).")
        spark_type = (
            pa_type_to_spark(pa_type, allow_extended_types=True, field_name=name)
            if isinstance(pa_type, pa.DataType)
            else pa_type
        )
        schema.spark_schema = T.StructType(
            list(schema.spark_schema.fields) + [T.StructField(name, spark_type, True)]
        )
        version = int(os.path.basename(current_file)[len("schema-"):-len(".json")]) + 1
        with open(os.path.join(path, "schema", f"schema-{version}.json"), "w") as f:
            f.write(schema.to_json())
