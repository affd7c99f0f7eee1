"""Table + ReadBuilder: the user-facing query-building surface.

Mirrors pypaimon/api/table.py:26-35 (Table → read/write builders) and
pypaimon/api/read_builder.py (with_filter / with_projection / with_limit
→ new_scan / new_read). Pushdowns are recorded here and consumed by the
scan planner (driver-side pruning) and the DataFrame recipe (Catalyst
pushdown) — the reference sends them to the JVM instead
(java_implementation.py:109-127).
"""

from __future__ import annotations

from typing import List, Optional

from paimon_python_spark.predicate import Predicate, PredicateBuilder
from paimon_python_spark.schema import Schema


class Table:
    def __init__(self, identifier: str, table_path: str, schema: Schema):
        self.identifier = identifier
        self.table_path = table_path
        self.schema = schema

    def new_read_builder(self) -> "ReadBuilder":
        return ReadBuilder(self)

    def new_batch_write_builder(self):
        # Reference rejects dynamic-bucket (PK table without 'bucket': 'N')
        # and cross-partition tables at builder creation
        # (java_utils.py:56-61, test_write_and_read.py:144-153).
        from paimon_python_spark.write import BatchWriteBuilder

        if self.schema.is_primary_key_table():
            if self.schema.num_buckets() < 1:
                raise TypeError(
                    "Doesn't support writing dynamic bucket or cross partition table."
                )
            if not self.schema.trimmed_primary_keys or any(
                p not in self.schema.primary_keys
                for p in self.schema.partition_keys
            ):
                # partition keys not contained in the primary key means an
                # update can move a key across partitions (CROSS_PARTITION
                # bucket mode) — fixed-bucket merge-on-read is partition-
                # local and cannot express it, same as the reference
                raise TypeError(
                    "Doesn't support writing dynamic bucket or cross partition table."
                )
        return BatchWriteBuilder(self)

    def delete_where(self, predicate: Predicate) -> None:
        """Row-level DELETE on a primary-key table: the matching rows of
        the current merged state are re-written as RowKind -D records and
        committed; merge-on-read then drops those keys. One read job +
        one write job — no file rewrite (the LSM absorbs the tombstones;
        compaction reclaims the space later)."""
        from pyspark.sql import functions as F

        if not self.schema.is_primary_key_table():
            raise ValueError("delete_where requires a primary-key table")
        rb = self.new_read_builder().with_filter(predicate)
        victims = rb.new_read().to_df().withColumn("__rk", F.lit(3))
        wb = self.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        try:
            w.write_dataframe(victims, row_kind_col="__rk")
            c.commit(w.prepare_commit())
        finally:
            w.close()
            c.close()

    def update_where(self, predicate: Predicate, set_exprs: dict) -> None:
        """Row-level UPDATE on a primary-key table: matching rows of the
        current merged state are re-written with ``set_exprs`` applied
        (SQL strings over the row's columns) as RowKind +U records in
        one commit. Same shape as delete_where: one bounded read + one
        write, no file rewrite."""
        from pyspark.sql import functions as F

        if not self.schema.is_primary_key_table():
            raise ValueError("update_where requires a primary-key table")
        cols = self.schema.field_names
        unknown = set(set_exprs) - set(cols)
        if unknown:
            raise ValueError(f"update_where: unknown columns {sorted(unknown)}")
        pks = set(self.schema.primary_keys)
        if set(set_exprs) & pks:
            raise ValueError(
                "update_where: cannot update primary-key columns "
                "(delete + insert instead)"
            )
        rb = self.new_read_builder().with_filter(predicate)
        updated = (
            rb.new_read()
            .to_df()
            .select(
                *[F.expr(set_exprs.get(c, c)).alias(c) for c in cols],
            )
            .withColumn("__rk", F.lit(2))
        )
        wb = self.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        try:
            w.write_dataframe(updated, row_kind_col="__rk")
            c.commit(w.prepare_commit())
        finally:
            w.close()
            c.close()

    def analyze(self, columns=None, exact: bool = False) -> int:
        """ANALYZE this table: one-pass stats aggregate over the merged
        read, statistic file under ``statistics/``, ANALYZE snapshot —
        the engine twin of :func:`lake_statistics.analyze_lake`.
        Returns the new snapshot id."""
        from paimon_python_spark.lake_statistics import analyze_table

        return analyze_table(self, columns=columns, exact=exact)

    def statistics(self, snapshot_id=None):
        """Statistics system table (``table$statistics``): newest
        ANALYZE's totals + per-column colstat JSON, walking the chain
        back from ``snapshot_id``. Empty if never analyzed."""
        return _engine_system_df(self.table_path, "statistics", snapshot_id)

    # -- system tables (Paimon's table$snapshots / table$files) --

    def snapshots(self):
        """Snapshot history as a DataFrame (metadata-sized — built on
        the driver like Paimon's snapshots system table)."""
        return _engine_system_df(self.table_path, "snapshots")

    def files(self, snapshot_id: Optional[int] = None):
        """Live data files (with stats) as a DataFrame — the files
        system table; drives compaction decisions and debugging."""
        return _engine_system_df(self.table_path, "files", snapshot_id)

    def audit_log(self, snapshot_id: Optional[int] = None):
        """Audit-log system table: every stored row (pre-merge) with a
        leading ``rowkind`` string column (``+I``/``-U``/``+U``/``-D``)
        — Paimon's ``table$audit_log`` over the reference's RowKind
        changelog model (pypaimon/pynative/common/row/row_kind.py:22-57)."""
        from paimon_python_spark.read import audit_log_df

        return audit_log_df(self, snapshot_id)

    def branches(self):
        """Branches system table: (branch_name, created_from_snapshot)."""
        return _engine_system_df(self.table_path, "branches")

    def merge_into(self, source, **kwargs) -> None:
        """MERGE source into this PK table (see
        :func:`paimon_python_spark.merge.merge_into`)."""
        from paimon_python_spark.merge import merge_into

        merge_into(self, source, **kwargs)

    def partitions(self):
        """Partitions system table: per-partition record/file/byte
        totals from the manifests (metadata-only — the planner's view,
        no data scan), like Paimon's ``table$partitions``."""
        return _engine_system_df(self.table_path, "partitions")

    def manifests(self, snapshot_id: Optional[int] = None):
        """Manifests system table — Paimon's ``table$manifests``."""
        return _engine_system_df(self.table_path, "manifests", snapshot_id)

    def buckets(self):
        """Buckets system table — Paimon's ``table$buckets``: per
        (partition, bucket) record/file/byte totals (the skew and
        rescale diagnostic), metadata-only like ``partitions()``."""
        return _engine_system_df(self.table_path, "buckets")

    # -- tags (durable named snapshots, survive expiration) --

    def create_tag(self, name: str, snapshot_id: Optional[int] = None) -> int:
        from paimon_python_spark.tags import create_tag

        return create_tag(self, name, snapshot_id)

    def delete_tag(self, name: str) -> bool:
        from paimon_python_spark.tags import delete_tag

        return delete_tag(self, name)

    def tags(self):
        """Tags system table: (tag_name, snapshot_id)."""
        return _engine_system_df(self.table_path, "tags")

    def options(self):
        """Options system table: (key, value) — Paimon's ``table$options``."""
        return _engine_system_df(self.table_path, "options")


class ReadBuilder:
    """Accumulates pushdowns; produces TableScan (planning) and TableRead
    (execution). API: pypaimon/api/read_builder.py."""

    def __init__(self, table: Table):
        self.table = table
        self._predicate: Optional[Predicate] = None
        self._projection: Optional[List[str]] = None
        self._limit: Optional[int] = None
        self._snapshot_id: Optional[int] = None

    def new_predicate_builder(self) -> PredicateBuilder:
        return PredicateBuilder(self.table.schema.field_names)

    def with_filter(self, predicate: Predicate) -> "ReadBuilder":
        """Pushdown filter — applied "as much as possible, but is not
        guaranteed to be complete" (read_builder.py:31-34); our reader
        always applies the full residual after the scan/merge."""
        self._predicate = predicate
        return self

    def with_projection(self, projection: List) -> "ReadBuilder":
        """Name-list or nested-path projection; reordering allowed; empty
        list → empty frame (test_write_and_read.py:458-518).

        Entries are top-level names (``"a"``) or struct paths
        (``["s", "x"]`` — "push nested projection" per the reference ABC,
        read_builder.py:36-38). A path prunes the struct to just the
        named subfields (Catalyst's nested-schema pruning then narrows
        the parquet read schema to those leaves); multiple paths into one
        struct merge. Stored normalized as a list of paths."""
        from pyspark.sql import types as T

        spark_schema = self.table.schema.spark_schema
        paths: List[List[str]] = []
        for entry in projection:
            path = [entry] if isinstance(entry, str) else list(entry)
            if not path or not all(isinstance(p, str) for p in path):
                raise ValueError(f"Invalid projection entry: {entry!r}")
            if path[0] not in self.table.schema.field_names:
                raise ValueError(f"Field {path[0]} not in table schema")
            dtype = spark_schema[path[0]].dataType
            for step in path[1:]:
                if not isinstance(dtype, T.StructType) or step not in dtype.fieldNames():
                    raise ValueError(
                        f"Field {'.'.join(path)} not in table schema"
                    )
                dtype = dtype[step].dataType
            paths.append(path)
        self._projection = paths
        return self

    def with_limit(self, limit: int) -> "ReadBuilder":
        """Split-granular limit: scan planning stops once the planned
        splits' row count reaches the limit; the read returns those whole
        splits, not exactly N rows (test_pynative_reader.py:166-181)."""
        self._limit = limit
        return self

    def with_snapshot(self, snapshot_id: int) -> "ReadBuilder":
        """Time travel: plan the scan against a historical snapshot
        instead of the latest one (Paimon's ``scan.snapshot-id``). The
        snapshot's manifest list fully determines the live file set, so
        this is a planning-time choice — the read recipe is unchanged."""
        self._snapshot_id = snapshot_id
        return self

    def with_timestamp(self, timestamp_millis: int) -> "ReadBuilder":
        """Pin the read to the last snapshot committed at or before the
        given epoch-millis (Paimon's ``scan.timestamp-millis``)."""
        import os

        from paimon_python_spark.metadata import MetadataStore

        store = MetadataStore(self.table.table_path)
        latest = store.latest_snapshot_id() or 0
        best = None
        for sid in range(1, latest + 1):
            if not os.path.exists(
                os.path.join(store.snapshot_dir, f"snapshot-{sid}.json")
            ):
                continue
            s = store.read_snapshot(sid)
            if s.time_millis <= timestamp_millis:
                best = sid
        if best is None:
            raise ValueError(
                f"no snapshot committed at or before {timestamp_millis}"
            )
        return self.with_snapshot(best)

    def with_tag(self, name: str) -> "ReadBuilder":
        """Pin the read to a tagged snapshot (Paimon's ``scan.tag-name``):
        tag resolution at plan time, then identical to with_snapshot."""
        from paimon_python_spark.tags import resolve_tag

        return self.with_snapshot(resolve_tag(self.table, name))

    def new_scan(self):
        from paimon_python_spark.scan import TableScan

        return TableScan(self)

    def new_read(self):
        from paimon_python_spark.read import TableRead

        return TableRead(self)

    def read_type(self) -> "ReadType":
        """The projected row type (mirrors read_type() reflecting the
        projection, test_object_metadata.py:36-47). Behaves as the list
        of projected field names AND serves the reference's
        ``read_type().as_arrow()`` (a pyarrow schema of the projected
        top-level fields)."""
        if self._projection is None:
            names = list(self.table.schema.field_names)
        else:
            names = []
            for path in self._projection:
                if path[0] not in names:
                    names.append(path[0])
        return ReadType(names, self.table.schema.spark_schema)


class ReadType(list):
    """Projected row type: a list of field names (engine-historic
    behavior) that also answers ``as_arrow()`` like the reference's
    RowType wrapper."""

    def __init__(self, names, spark_schema):
        super().__init__(names)
        self._spark_schema = spark_schema

    def as_arrow(self):
        from pyspark.sql import types as T

        from paimon_python_spark.types import spark_schema_to_pa

        return spark_schema_to_pa(
            T.StructType([self._spark_schema[n] for n in self])
        )


def engine_system_table_schema(name: str):
    """StructType of an engine system table — static per name, O(1)
    (schema() must not walk manifests to learn column types)."""
    from pyspark.sql import types as T

    P = T.MapType(T.StringType(), T.StringType())
    defs = {
        "snapshots": [
            ("snapshot_id", T.LongType(), False),
            ("commit_kind", T.StringType(), False),
            ("commit_user", T.StringType(), False),
            ("time_millis", T.LongType(), False),
            ("total_record_count", T.LongType(), False),
            ("delta_record_count", T.LongType(), False),
            ("manifest_count", T.IntegerType(), False),
        ],
        "files": [
            ("file_path", T.StringType(), False),
            ("partition", P, True),
            ("bucket", T.IntegerType(), False),
            ("row_count", T.LongType(), False),
            ("file_size", T.LongType(), False),
            # $files stats maps (lake twin mirrors real Paimon's shape)
            ("null_value_counts", P, False),
            ("min_value_stats", P, False),
            ("max_value_stats", P, False),
        ],
        "partitions": [
            ("partition", P, True),
            ("record_count", T.LongType(), False),
            ("file_count", T.LongType(), False),
            ("total_size", T.LongType(), False),
        ],
        "manifests": [
            ("file_name", T.StringType(), False),
            ("file_size", T.LongType(), False),
            ("num_entries", T.LongType(), False),
            ("num_added_files", T.LongType(), False),
            ("num_deleted_files", T.LongType(), False),
        ],
        "buckets": [
            ("partition", P, True),
            ("bucket", T.IntegerType(), False),
            ("record_count", T.LongType(), False),
            ("file_count", T.LongType(), False),
            ("total_size", T.LongType(), False),
        ],
        "branches": [
            ("branch_name", T.StringType(), False),
            ("created_from_snapshot", T.LongType(), True),
        ],
        "tags": [
            ("tag_name", T.StringType(), False),
            ("snapshot_id", T.LongType(), False),
        ],
        "options": [
            ("key", T.StringType(), False),
            ("value", T.StringType(), False),
        ],
        # lake twin: paimon_lake.lake_system_table_schema("statistics")
        "statistics": [
            ("snapshot_id", T.LongType(), False),
            ("schema_id", T.LongType(), False),
            ("mergedRecordCount", T.LongType(), False),
            ("mergedRecordSize", T.LongType(), False),
            ("colstat", T.StringType(), False),
        ],
    }
    if name not in defs:
        raise ValueError(
            f"unknown system table {name!r}: one of {sorted(defs)} "
            "(audit_log reads data files — use Table.audit_log())"
        )
    return T.StructType([T.StructField(n, t, nl) for n, t, nl in defs[name]])


def engine_system_table_data(
    table_path: str, name: str, snapshot_id: "Optional[int]" = None
):
    """(StructType, rows) for an ENGINE-table SYSTEM table — the pure
    metadata walk behind snapshots()/files()/manifests()/buckets()/
    partitions()/branches()/tags()/options(), with NO SparkSession
    dependency so format("paimon_spark") can serve
    ``.load("<path>$<name>")`` from its plan-time worker. The Table
    methods wrap this with one createDataFrame."""
    import os

    from pyspark.sql import types as T

    from paimon_python_spark.metadata import MetadataStore

    store = MetadataStore(table_path)

    if name == "snapshots":
        rows = []
        latest = store.latest_snapshot_id() or 0
        for sid in range(1, latest + 1):
            if not os.path.exists(
                os.path.join(store.snapshot_dir, f"snapshot-{sid}.json")
            ):
                continue  # expired
            s = store.read_snapshot(sid)
            rows.append(
                (
                    s.id,
                    s.commit_kind,
                    s.commit_user,
                    s.time_millis,
                    s.total_record_count,
                    s.delta_record_count,
                    len(s.manifests),
                )
            )
        schema = engine_system_table_schema(name)
        return schema, rows

    if name == "files":
        snap = store.read_snapshot(snapshot_id) if snapshot_id else None
        rows = [
            (
                f.path,
                {k: str(v) for k, v in f.partition.items()},
                f.bucket,
                f.row_count,
                f.file_size,
                {
                    c: str(s["null_count"])
                    for c, s in (f.stats or {}).items()
                    if s.get("null_count") is not None
                },
                {
                    c: str(s["min"])
                    for c, s in (f.stats or {}).items()
                    if s.get("min") is not None
                },
                {
                    c: str(s["max"])
                    for c, s in (f.stats or {}).items()
                    if s.get("max") is not None
                },
            )
            for f in store.live_files(snap)
        ]
        schema = engine_system_table_schema(name)
        return schema, rows

    _snap = store.read_snapshot(snapshot_id) if snapshot_id else None

    if name == "partitions":
        agg: dict = {}
        for f in store.live_files(_snap):
            key = tuple(sorted((k, str(v)) for k, v in f.partition.items()))
            cur = agg.setdefault(key, [0, 0, 0])
            cur[0] += f.row_count
            cur[1] += 1
            cur[2] += f.file_size
        rows = [
            (dict(k), rc, fc, fs) for k, (rc, fc, fs) in sorted(agg.items())
        ]
        schema = engine_system_table_schema(name)
        return schema, rows

    if name == "manifests":
        snap = store.read_snapshot(
            snapshot_id or store.latest_snapshot_id() or 0
        )
        rows = []
        for mname in snap.manifests:
            entries = store.read_manifest(mname)
            rows.append(
                (
                    mname,
                    os.path.getsize(os.path.join(store.manifest_dir, mname)),
                    len(entries),
                    sum(1 for e in entries if e.kind == "ADD"),
                    sum(1 for e in entries if e.kind == "DELETE"),
                )
            )
        schema = engine_system_table_schema(name)
        return schema, rows

    if name == "buckets":
        agg = {}
        for f in store.live_files(_snap):
            key = (
                tuple(sorted((k, str(v)) for k, v in f.partition.items())),
                f.bucket,
            )
            cur = agg.setdefault(key, [0, 0, 0])
            cur[0] += f.row_count
            cur[1] += 1
            cur[2] += f.file_size
        rows = [
            (dict(k[0]), k[1], rc, fc, fs)
            for k, (rc, fc, fs) in sorted(agg.items())
        ]
        schema = engine_system_table_schema(name)
        return schema, rows

    # the remaining names need the Table wrapper (branch/tag helpers
    # take a Table); construction is pure file IO
    def _table():
        from paimon_python_spark.datasource import _load_schema

        return Table("system", table_path, _load_schema(table_path))

    if name == "branches":
        from paimon_python_spark.branches import branch_info

        schema = engine_system_table_schema(name)
        return schema, branch_info(_table())

    if name == "tags":
        from paimon_python_spark.tags import list_tags

        schema = engine_system_table_schema(name)
        return schema, sorted(list_tags(_table()).items())

    if name == "options":
        from paimon_python_spark.datasource import _load_schema

        schema = engine_system_table_schema(name)
        return schema, sorted(
            (k, str(v)) for k, v in _load_schema(table_path).options.items()
        )

    if name == "statistics":
        import json as _json

        from paimon_python_spark.lake_statistics import read_table_statistics

        stats = read_table_statistics(table_path, snapshot_id)
        rows = []
        if stats is not None:
            rows.append(
                (
                    int(stats["snapshotId"]),
                    int(stats["schemaId"]),
                    int(stats["mergedRecordCount"]),
                    int(stats["mergedRecordSize"]),
                    _json.dumps(stats["colStats"], sort_keys=True),
                )
            )
        schema = engine_system_table_schema(name)
        return schema, rows

    raise ValueError(
        f"unknown system table {name!r}: one of snapshots / files / "
        "partitions / manifests / buckets / branches / tags / options / "
        "statistics (audit_log reads data files — use Table.audit_log())"
    )


def _engine_system_df(table_path, name, snapshot_id=None):
    from paimon_python_spark._localdf import local_df
    from paimon_python_spark.session import get_spark

    schema, rows = engine_system_table_data(table_path, name, snapshot_id)
    return local_df(get_spark(), rows, schema)

