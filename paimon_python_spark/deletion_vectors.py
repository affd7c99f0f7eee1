"""Deletion vectors: a positional delete index for primary-key tables.

Table option ``deletion-vectors.enabled = true`` (requires the
``deduplicate`` merge engine and parquet data files). Instead of leaving
merge-on-read to discover superseded row versions with a key-window at
EVERY read, the committer marks them once, at write time, in a per-file
position index stored under ``index/dv-<snapshot_id>.json``. A read is
then a narrow scan: load live files with ``_metadata.row_index``,
anti-join the (tiny, broadcast) position index, drop ``-D`` rows — no
shuffle, no window. Paimon's deletion-vectors mode has exactly this
read/write trade (its bitmaps are produced by the writer's lookup /
compaction, see the format it layers under the readers the reference SDK
consumes, e.g. pypaimon/pynative/reader/sort_merge_reader.py:198-259 —
with DVs that whole merge pipeline degenerates to a filter).

Scale design:
- Commit cost: one column-pruned scan of the buckets touched by the
  commit plus a window over ONLY the affected keys (semi-join against
  the new keys first, broadcast). Untouched buckets are never opened —
  a key's bucket is deterministic (bucketing.py), so files in other
  buckets cannot contain an overwritten version.
- Read cost: scan + broadcast anti-join on (file, position). The index
  is O(superseded rows), orders of magnitude smaller than the data;
  at 100 TB you would swap the JSON int lists for roaring bitmaps and
  the driver collect for a distributed index write — the (file,
  sorted-positions) contract is unchanged.
- Index entries for files dropped by overwrite/compaction are pruned at
  every commit, so the index never outlives its files.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

from pyspark.sql import functions as F
from pyspark.sql import Window

from paimon_python_spark.metadata import DataFileMeta, MetadataStore, Snapshot

INDEX_DIR = "index"


def dv_enabled(schema) -> bool:
    return schema.options.get("deletion-vectors.enabled", "false").lower() == "true"


def check_dv_options(schema) -> None:
    """Reject option combinations deletion vectors cannot serve."""
    if not dv_enabled(schema):
        return
    if not schema.is_primary_key_table():
        raise ValueError("deletion-vectors.enabled requires a primary-key table")
    engine = schema.options.get("merge-engine", "deduplicate")
    if engine != "deduplicate":
        raise ValueError(
            f"deletion-vectors.enabled requires merge-engine=deduplicate, got {engine!r}"
        )
    if schema.file_format() != "parquet":
        raise ValueError(
            "deletion-vectors.enabled requires file.format=parquet "
            "(_metadata.row_index is a parquet-reader feature)"
        )


# ---- index IO (driver-side, same atomic-rename discipline as snapshots) ----


def _index_dir(table_path: str) -> str:
    return os.path.join(table_path, INDEX_DIR)


def dv_file_name(snapshot_id: int) -> str:
    import uuid

    # uuid suffix: branches share the main table's index dir (immutable
    # files, branch-local snapshot chains), so names must not collide
    # across chains that reuse snapshot ids.
    return f"dv-{snapshot_id}-{uuid.uuid4().hex[:8]}.json"


def read_dv(table_path: str, snapshot: Optional[Snapshot]) -> dict[str, list[int]]:
    """Load the deletion vector index a snapshot points at ({} if none)."""
    name = getattr(snapshot, "dv_index", None) if snapshot else None
    if not name:
        return {}
    with open(os.path.join(_index_dir(table_path), name)) as f:
        return json.load(f)


def write_dv(table_path: str, snapshot_id: int, dv: dict[str, list[int]]) -> str:
    os.makedirs(_index_dir(table_path), exist_ok=True)
    name = dv_file_name(snapshot_id)
    path = os.path.join(_index_dir(table_path), name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({k: sorted(v) for k, v in sorted(dv.items())}, f)
    os.replace(tmp, path)
    return name


# ---- commit-time maintenance ----


def build_commit_dv(
    table,
    new_files: List[DataFileMeta],
    kept_files: List[DataFileMeta],
    prev_dv: dict[str, list[int]],
) -> dict[str, list[int]]:
    """Compute the index for a new snapshot: previous marks on files that
    survive this commit, plus a mark on every non-latest version of each
    key the commit touches.

    One windowed pass over the affected keys only: rows of touched
    buckets are semi-joined (broadcast) against the new commit's key
    set before the window, so the sort never sees untouched keys.
    """
    from paimon_python_spark.session import get_spark
    from paimon_python_spark.write import SEQ_COL

    schema = table.schema
    merge_keys = list(
        dict.fromkeys(schema.partition_keys + schema.trimmed_primary_keys)
    )
    kept_paths = {f.path for f in kept_files} | {f.path for f in new_files}
    merged: dict[str, set[int]] = {
        p: set(pos) for p, pos in prev_dv.items() if p in kept_paths
    }

    touched_buckets = {f.bucket for f in new_files}
    touched_parts = {tuple(sorted(f.partition.items())) for f in new_files}
    candidates = [
        f
        for f in kept_files
        if f.bucket in touched_buckets
        and tuple(sorted(f.partition.items())) in touched_parts
    ]

    spark = get_spark()
    physical = _physical_schema(schema)
    prefix = "file:" + table.table_path + "/"

    def _scan(files: List[DataFileMeta], cols):
        paths = [os.path.join(table.table_path, f.path) for f in files]
        return spark.read.schema(physical).parquet(*paths).select(*cols)

    new_keys = _scan(new_files, merge_keys).distinct()
    pos_cols = [
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.row_index").alias("__pos"),
    ]
    versions = _scan(candidates + new_files, [*merge_keys, SEQ_COL, *pos_cols]).join(
        F.broadcast(new_keys), merge_keys, "left_semi"
    )
    w = Window.partitionBy(*merge_keys).orderBy(
        F.col(SEQ_COL).desc(), F.col("__fp").desc(), F.col("__pos").desc()
    )
    stale = (
        versions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select("__fp", "__pos")
    )
    for row in stale.collect():
        rel = row["__fp"]
        if rel.startswith(prefix):
            rel = rel[len(prefix) :]
        merged.setdefault(rel, set()).add(row["__pos"])
    return {p: sorted(s) for p, s in merged.items() if s}


def prune_dv(
    prev_dv: dict[str, list[int]], kept_files: List[DataFileMeta]
) -> dict[str, list[int]]:
    """Drop index entries whose files left the live set (compaction /
    overwrite rewrote them)."""
    kept = {f.path for f in kept_files}
    return {p: pos for p, pos in prev_dv.items() if p in kept and pos}


# ---- read-time application ----


def apply_dv(df, table_path: str, dv: dict[str, list[int]]):
    """Filter DV-marked positions out of a scan that carries
    ``__fp``/``__pos`` metadata columns. Broadcast anti-join: the index
    is tiny relative to the data, so this stays a narrow map-side
    filter at any scale."""
    if not dv:
        return df.drop("__fp", "__pos")
    spark = df.sparkSession
    rows = [
        ("file:" + os.path.join(table_path, rel), int(pos))
        for rel, positions in dv.items()
        for pos in positions
    ]
    dv_df = spark.createDataFrame(rows, "__dvfp string, __dvpos long")
    return df.join(
        F.broadcast(dv_df),
        (df["__fp"] == dv_df["__dvfp"]) & (df["__pos"] == dv_df["__dvpos"]),
        "left_anti",
    ).drop("__fp", "__pos")


def _physical_schema(schema):
    from pyspark.sql import types as T

    from paimon_python_spark.write import KIND_COL, SEQ_COL

    return T.StructType(
        list(schema.spark_schema.fields)
        + [
            T.StructField(SEQ_COL, T.LongType(), False),
            T.StructField(KIND_COL, T.IntegerType(), False),
        ]
    )
