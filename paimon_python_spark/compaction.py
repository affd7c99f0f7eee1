"""Compaction: rewrite fragmented (partition, bucket) groups into single
files and publish a COMPACT snapshot.

The reference's commits may produce a compaction snapshot alongside the
data snapshot (pypaimon/api/table_commit.py:28-32); the LSM sorted runs
it collapses are exactly our per-commit files. Spark-first equivalence:

- PK groups: run the merge-on-read recipe once (window dedup + drop
  deletes) and write the survivors as ONE sorted run, preserving each
  row's ``_SEQUENCE_NUMBER`` (so later un-compacted writes still win by
  sequence) and stamping kind=+I (deletes are physically dropped at the
  "max level", like an LSM full compaction).
- Append groups: concatenate small files (file-count threshold).

Each group rewrite is an independent Spark job over only that group's
files; the commit atomically swaps old files for new via DELETE+ADD
manifest entries. At scale this is the small-files problem solver: scan
cost goes from O(commits) files per bucket back to O(1).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from paimon_python_spark.metadata import (
    DataFileMeta,
    ManifestEntry,
    MetadataStore,
    Snapshot,
)
from paimon_python_spark.session import get_spark
from paimon_python_spark.write import (
    ADD_KINDS,
    BUCKET_COL,
    KIND_COL,
    PART_PREFIX,
    ROWKIND_INSERT,
    SEQ_COL,
    DataFileHarvester,
)


def compact_table(table, small_file_threshold: int = 2) -> Optional[int]:
    """Compact every (partition, bucket) group with ≥ ``small_file_threshold``
    files. Returns the new snapshot id, or None if nothing to do."""
    import time

    store = MetadataStore(table.table_path)
    schema = table.schema
    prev = store.latest_snapshot()
    if prev is None:
        return None
    live = store.live_files(prev)

    groups: dict[tuple, List[DataFileMeta]] = {}
    for f in live:
        key = (tuple(sorted(f.partition.items())), f.bucket)
        groups.setdefault(key, []).append(f)

    to_rewrite = {k: v for k, v in groups.items() if len(v) >= small_file_threshold}
    if not to_rewrite:
        return None

    spark = get_spark()
    harvester = DataFileHarvester(table)
    is_pk = schema.is_primary_key_table()
    physical = T.StructType(list(schema.spark_schema.fields))
    if is_pk:
        physical = T.StructType(
            physical.fields
            + [
                T.StructField(SEQ_COL, T.LongType(), False),
                T.StructField(KIND_COL, T.IntegerType(), False),
            ]
        )

    import os

    new_files: List[DataFileMeta] = []
    old_files: List[DataFileMeta] = []
    for (part_items, bucket), files in to_rewrite.items():
        paths = [os.path.join(table.table_path, f.path) for f in files]
        df = spark.read.schema(physical).format(schema.file_format()).load(paths)
        if is_pk:
            keys = list(dict.fromkeys(schema.partition_keys + schema.primary_keys))
            w = Window.partitionBy(*keys).orderBy(F.col(SEQ_COL).desc())
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .filter(F.col(KIND_COL).isin(*ADD_KINDS))  # drop -D at max level
                .drop("__rn")
                .withColumn(KIND_COL, F.lit(ROWKIND_INSERT))
                .sortWithinPartitions(*keys)  # keep the run key-sorted
            )
        layout_cols = []
        for pk in schema.partition_keys:
            shadow = PART_PREFIX + pk
            df = df.withColumn(shadow, F.col(pk).cast("string"))
            layout_cols.append(shadow)
        if is_pk:
            df = df.withColumn(BUCKET_COL, F.lit(bucket))
            layout_cols.append(BUCKET_COL)
        writer = df.coalesce(1).write.mode("append")
        if layout_cols:
            writer = writer.partitionBy(*layout_cols)
        writer.format(schema.file_format()).save(store.data_dir)
        new_files.extend(harvester.harvest_new_files())
        old_files.extend(files)

    entries = [ManifestEntry("DELETE", f) for f in old_files] + [
        ManifestEntry("ADD", f) for f in new_files
    ]
    manifest = store.write_manifest(entries)
    removed = sum(f.row_count for f in old_files)
    added = sum(f.row_count for f in new_files)

    # deletion vectors: compaction rewrites files to their merged state,
    # so marks on the rewritten files die with them; marks on untouched
    # files stay valid and carry over.
    from paimon_python_spark.deletion_vectors import prune_dv_df, write_dv_df

    gone = {f.path for f in old_files}
    kept_live = [f for f in live if f.path not in gone] + new_files
    dv_df = prune_dv_df(table, prev, kept_live)
    dv_index = write_dv_df(table.table_path, prev.id + 1, dv_df)

    snapshot = Snapshot(
        id=prev.id + 1,
        schema_id=0,
        commit_kind="COMPACT",
        manifests=prev.manifests + [manifest],
        total_record_count=prev.total_record_count - removed + added,
        delta_record_count=added,
        time_millis=int(time.time() * 1000),
        dv_index=dv_index,
    )
    store.write_snapshot(snapshot)
    return snapshot.id


def sort_compact_table(
    table, sort_columns: List[str], zorder: bool = False
) -> Optional[int]:
    """Ordered full rewrite of an append table (Paimon's *sort compact*
    procedure, ``compact order_by``): read every live file, cluster the
    rows on ``sort_columns`` — range-partition + sort for linear order,
    bit-interleaved quantile buckets for ``zorder=True`` — and swap all
    old files for the new clustered set in one COMPACT snapshot.

    Why this matters at scale: after months of unordered ingestion every
    file's min/max spans the whole domain and stats pruning is dead. One
    sort compaction restores disjoint per-file ranges on the listed
    columns, so the scan planner goes back to opening O(matching) files
    instead of O(all). The rewrite is one shuffle over the table — paid
    once, amortized over every subsequent query.

    PK tables are rejected: their layout is owned by the bucket function
    (cluster within buckets at write time via ``write.sort-columns``).
    Returns the new snapshot id, or None if the table is empty.
    """
    import os
    import time

    from paimon_python_spark.write import zorder_cluster

    schema = table.schema
    if schema.is_primary_key_table():
        raise ValueError(
            "sort_compact_table: primary-key tables keep their bucket layout; "
            "use write.sort-columns to cluster inside buckets instead"
        )
    missing = [c for c in sort_columns if c not in schema.field_names]
    if missing or not sort_columns:
        raise ValueError(f"sort_compact_table: unknown sort columns {missing}")
    if schema.file_format() == "avro":
        raise ValueError("sort_compact_table: supported for parquet/orc tables")

    store = MetadataStore(table.table_path)
    prev = store.latest_snapshot()
    if prev is None:
        return None
    live = store.live_files(prev)
    if not live:
        return None

    spark = get_spark()
    harvester = DataFileHarvester(table)
    physical = T.StructType(list(schema.spark_schema.fields))
    paths = [os.path.join(table.table_path, f.path) for f in live]
    df = spark.read.schema(physical).format(schema.file_format()).load(paths)

    if zorder:
        df = zorder_cluster(df, sort_columns)
    else:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartitionByRange(n, *sort_columns).sortWithinPartitions(
            *sort_columns
        )

    layout_cols = []
    for pk in schema.partition_keys:
        shadow = PART_PREFIX + pk
        df = df.withColumn(shadow, F.col(pk).cast("string"))
        layout_cols.append(shadow)
    writer = df.write.mode("append")
    if layout_cols:
        writer = writer.partitionBy(*layout_cols)
    compression = schema.options.get("file.compression", "")
    if compression:
        writer = writer.option("compression", compression)
    writer.format(schema.file_format()).save(store.data_dir)
    new_files = harvester.harvest_new_files()

    entries = [ManifestEntry("DELETE", f) for f in live] + [
        ManifestEntry("ADD", f) for f in new_files
    ]
    manifest = store.write_manifest(entries)
    added = sum(f.row_count for f in new_files)
    snapshot = Snapshot(
        id=prev.id + 1,
        schema_id=0,
        commit_kind="COMPACT",
        manifests=prev.manifests + [manifest],
        total_record_count=prev.total_record_count
        - sum(f.row_count for f in live)
        + added,
        delta_record_count=added,
        time_millis=int(time.time() * 1000),
    )
    store.write_snapshot(snapshot)
    return snapshot.id


def rescale_bucket(table, new_buckets: int) -> Optional[int]:
    """Change a PK table's bucket count (Paimon's *rescale bucket*
    overwrite procedure): full-merge every live row, re-hash into
    ``new_buckets`` buckets, swap all files in one COMPACT snapshot, and
    publish the option change as a new schema version.

    Paimon likewise requires a full INSERT OVERWRITE to rescale — the
    bucket function pins row→file placement, so a bucket-count change is
    necessarily a rewrite of the whole table (one shuffle keyed on the
    new bucket, then bucket-local file writes). At scale you run it per
    partition; the snapshot swap keeps readers consistent either way.
    Sequence numbers survive the rewrite so later un-compacted writes
    still win by sequence; deletes are physically dropped (max level).
    """
    import os
    import time

    schema = table.schema
    if not schema.is_primary_key_table():
        raise ValueError("rescale_bucket requires a primary-key table")
    if new_buckets < 1:
        raise ValueError(f"invalid bucket count {new_buckets}")
    if new_buckets == schema.num_buckets():
        return None

    store = MetadataStore(table.table_path)
    prev = store.latest_snapshot()

    # publish the option change as schema-(N+1) BEFORE the data rewrite:
    # a reader that sees the new schema with old files still merges
    # correctly (bucket count only steers writes and bucket pruning).
    schema.options["bucket"] = str(new_buckets)
    sdir = os.path.join(table.table_path, "schema")
    versions = [
        int(n[len("schema-") : -len(".json")])
        for n in os.listdir(sdir)
        if n.startswith("schema-") and n.endswith(".json")
    ]
    new_version = max(versions) + 1
    with open(os.path.join(sdir, f"schema-{new_version}.json"), "w") as f:
        f.write(schema.to_json())

    if prev is None:
        return None
    live = store.live_files(prev)
    if not live:
        return None

    spark = get_spark()
    harvester = DataFileHarvester(table)
    physical = T.StructType(
        list(schema.spark_schema.fields)
        + [
            T.StructField(SEQ_COL, T.LongType(), False),
            T.StructField(KIND_COL, T.IntegerType(), False),
        ]
    )
    paths = [os.path.join(table.table_path, f.path) for f in live]
    df = spark.read.schema(physical).format(schema.file_format()).load(paths)

    keys = list(dict.fromkeys(schema.partition_keys + schema.primary_keys))
    w = Window.partitionBy(*keys).orderBy(F.col(SEQ_COL).desc())
    df = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(KIND_COL).isin(*ADD_KINDS))
        .drop("__rn")
        .withColumn(KIND_COL, F.lit(ROWKIND_INSERT))
    )

    layout_cols = []
    for pk in schema.partition_keys:
        shadow = PART_PREFIX + pk
        df = df.withColumn(shadow, F.col(pk).cast("string"))
        layout_cols.append(shadow)
    df = df.withColumn(
        BUCKET_COL,
        F.pmod(
            F.hash(*[F.col(k) for k in schema.trimmed_primary_keys]),
            F.lit(new_buckets),
        ),
    )
    layout_cols.append(BUCKET_COL)
    df = df.repartition(*[F.col(c) for c in layout_cols]).sortWithinPartitions(*keys)

    writer = df.write.mode("append").partitionBy(*layout_cols)
    compression = schema.options.get("file.compression", "")
    if compression:
        writer = writer.option("compression", compression)
    writer.format(schema.file_format()).save(store.data_dir)
    new_files = harvester.harvest_new_files()

    entries = [ManifestEntry("DELETE", f) for f in live] + [
        ManifestEntry("ADD", f) for f in new_files
    ]
    manifest = store.write_manifest(entries)
    added = sum(f.row_count for f in new_files)
    snapshot = Snapshot(
        id=prev.id + 1,
        schema_id=new_version,
        commit_kind="COMPACT",
        manifests=prev.manifests + [manifest],
        total_record_count=prev.total_record_count
        - sum(f.row_count for f in live)
        + added,
        delta_record_count=added,
        time_millis=int(time.time() * 1000),
        # every file was rewritten to merged state: all DV marks die
        dv_index=None,
    )
    store.write_snapshot(snapshot)
    return snapshot.id
