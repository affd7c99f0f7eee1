"""Table schema: fields + partition keys + primary keys + options.

Mirrors pypaimon/api/table.py:38-51 (``Schema`` holds a pyarrow schema,
partition_keys, primary_keys, options, comment). Internally we keep the
Spark ``StructType`` as the source of truth and accept either a pyarrow
schema or a StructType at construction.
"""

from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa
from pyspark.sql import types as T

from paimon_python_spark.types import pa_schema_to_spark, spark_schema_to_pa


class Schema:
    """Schema of a table, matching the reference constructor signature
    (pypaimon/api/table.py:40-51)."""

    def __init__(
        self,
        pa_schema: "pa.Schema | T.StructType",
        partition_keys: Optional[list[str]] = None,
        primary_keys: Optional[list[str]] = None,
        options: Optional[dict] = None,
        comment: Optional[str] = None,
    ):
        self.options = dict(options or {})
        if "tag.automatic-creation" in self.options or (
            "tag.creation-period" in self.options
        ):
            # option-set time is where bad values may raise; commit
            # time skips them (the snapshot is durable by then)
            from paimon_python_spark.tags import validate_auto_tag_options

            validate_auto_tag_options(self.options)
        allow_extended = self.options.get("extended-types", "false") == "true"
        if isinstance(pa_schema, T.StructType):
            self.spark_schema = pa_schema
        else:
            self.spark_schema = pa_schema_to_spark(pa_schema, allow_extended)
        self.partition_keys = list(partition_keys or [])
        self.primary_keys = list(primary_keys or [])
        self.comment = comment
        self._validate()

    def _validate(self) -> None:
        names = [f.name for f in self.spark_schema.fields]
        for k in self.partition_keys + self.primary_keys:
            if k not in names:
                raise ValueError(f"key {k!r} not in schema fields {names}")
        if self.primary_keys and self.partition_keys:
            # Reference: PK == partition keys is an error; partition keys are
            # trimmed from the merge key (sort_merge_reader.py:203-206).
            if set(self.primary_keys) <= set(self.partition_keys):
                raise ValueError(
                    "Primary key constraint should not be same with partition fields"
                )

    @property
    def pa_schema(self) -> pa.Schema:
        return spark_schema_to_pa(self.spark_schema)

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.spark_schema.fields]

    # trimmed primary keys: the per-bucket merge key (PK minus partition keys)
    @property
    def trimmed_primary_keys(self) -> list[str]:
        return [k for k in self.primary_keys if k not in self.partition_keys]

    def is_primary_key_table(self) -> bool:
        return bool(self.primary_keys)

    def num_buckets(self) -> int:
        # Reference supports only fixed-bucket PK tables ('bucket': 'N') and
        # append tables (java_utils.py:56-61). bucket=-1 (dynamic) is rejected
        # at write time, matching test_write_and_read.py:144-153.
        return int(self.options.get("bucket", "-1"))

    def file_format(self) -> str:
        return self.options.get("file.format", "parquet").lower()

    # -- JSON persistence (schema/schema-N.json under the table path) --

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": 1,
                "fields": json.loads(self.spark_schema.json()),
                "partition_keys": self.partition_keys,
                "primary_keys": self.primary_keys,
                "options": self.options,
                "comment": self.comment,
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "Schema":
        d = json.loads(text)
        spark_schema = T.StructType.fromJson(d["fields"])
        schema = cls.__new__(cls)
        schema.spark_schema = spark_schema
        schema.partition_keys = d["partition_keys"]
        schema.primary_keys = d["primary_keys"]
        schema.options = d["options"]
        schema.comment = d.get("comment")
        return schema
