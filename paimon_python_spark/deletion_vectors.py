"""Deletion vectors: a positional delete index for primary-key tables.

Table option ``deletion-vectors.enabled = true`` (requires the
``deduplicate`` merge engine and parquet data files). Instead of leaving
merge-on-read to discover superseded row versions with a key-window at
EVERY read, the committer marks them once, at write time, in a per-file
position index stored under ``index/dv-<snapshot_id>-<uuid>/`` — a
parquet dataset with one row per marked data file:
``(file string, positions array<long>)``, positions sorted (parquet's
delta/RLE encoding compresses the sorted runs, the columnar stand-in
for Paimon's roaring bitmaps). A read is then a narrow scan: load live
files with ``_metadata.row_index``, anti-join the position index, drop
``-D`` rows — no key window. Paimon's deletion-vectors mode has exactly
this read/write trade (its bitmaps are produced by the writer's lookup /
compaction, see the format it layers under the readers the reference SDK
consumes, e.g. pypaimon/pynative/reader/sort_merge_reader.py:198-259 —
with DVs that whole merge pipeline degenerates to a filter).

Scale design — the index NEVER materializes on the driver:
- Commit cost: one column-pruned scan of the buckets touched by the
  commit plus a window over ONLY the affected keys (semi-join against
  the new commit's key set first, broadcast). Untouched buckets are
  never opened — a key's bucket is deterministic (bucketing.py), so
  files in other buckets cannot contain an overwritten version. The
  stale positions stay a DataFrame end-to-end: merged with the previous
  index (itself read as a parquet DataFrame) and written back by a
  distributed parquet write. The driver sees only file names and footer
  row counts.
- Read cost: scan + anti-join on (file, position). Below
  ``deletion-vectors.index-broadcast-bytes`` (default 64 MB) the index
  side is broadcast — a map-side filter, no exchange of the data. Above
  it (billions of marked positions) the join degrades gracefully to a
  shuffled anti-join instead of a driver OOM.
- Index entries for files dropped by overwrite/compaction are pruned at
  every commit (a broadcast semi-join against the kept file list), so
  the index never outlives its files.

Legacy: indexes written before this design were single JSON dicts
(``dv-*.json``); they are still readable (loaded driver-side — they
were driver-sized by construction) but never written.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paimon_python_spark._localdf import local_df
from paimon_python_spark.metadata import DataFileMeta, Snapshot


def _sql_str(s: str) -> str:
    """SQL single-quoted string literal (escape embedded quotes/backslashes)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

INDEX_DIR = "index"
DV_SCHEMA = "file string, positions array<long>"
DEFAULT_BROADCAST_BYTES = 64 << 20


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


def _index_dir(table_path: str) -> str:
    return os.path.join(table_path, INDEX_DIR)


def _broadcast_threshold(schema) -> int:
    return int(
        schema.options.get(
            "deletion-vectors.index-broadcast-bytes", str(DEFAULT_BROADCAST_BYTES)
        )
    )


def dv_file_name(snapshot_id: int) -> str:
    import uuid

    # uuid suffix: branches share the main table's index dir (immutable
    # datasets, branch-local snapshot chains), so names must not collide
    # across chains that reuse snapshot ids.
    return f"dv-{snapshot_id}-{uuid.uuid4().hex[:8]}"


def dv_index_bytes(table_path: str, name: str) -> int:
    """On-disk size of an index — the broadcast-or-shuffle decision."""
    path = os.path.join(_index_dir(table_path), name)
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


# ---- index IO ----


def read_dv_df(spark, table_path: str, snapshot: Optional[Snapshot]) -> Optional[DataFrame]:
    """The deletion-vector index a snapshot points at, as a DataFrame
    ``(file, positions)`` — parquet-backed (distributed scan), or
    ``None`` when the snapshot carries no index."""
    name = getattr(snapshot, "dv_index", None) if snapshot else None
    if not name:
        return None
    path = os.path.join(_index_dir(table_path), name)
    if name.endswith(".json"):
        # legacy driver-written dict (bounded size by construction)
        with open(path) as f:
            d = json.load(f)
        if not d:
            return None
        rows = [(k, [int(p) for p in v]) for k, v in sorted(d.items())]
        return local_df(spark, rows, DV_SCHEMA)
    return spark.read.schema(DV_SCHEMA).parquet(path)


def write_dv_df(table_path: str, snapshot_id: int, dv_df: Optional[DataFrame]) -> Optional[str]:
    """Publish an index DataFrame as a parquet dataset under ``index/``
    via a distributed write; returns its name, or ``None`` when the
    index is empty (the dataset is removed — a snapshot with no marks
    carries no index). Emptiness is checked from the written parquet
    footers (driver-side stat, no second job). Visibility is governed
    by the snapshot pointer, so the write needs no rename dance."""
    if dv_df is None:
        return None
    os.makedirs(_index_dir(table_path), exist_ok=True)
    name = dv_file_name(snapshot_id)
    path = os.path.join(_index_dir(table_path), name)
    (
        # no repartition: build_commit_dv_df / prune_dv_df emit ONE row
        # per marked file (post-aggregate), so there is nothing to
        # co-locate — a hash repartition here was a pure extra shuffle
        # of the whole index per commit (r12 optimization; AQE already
        # coalesces the upstream aggregate's partitions)
        dv_df.sortWithinPartitions("file")
        .write.mode("error")
        .parquet(path)
    )
    import pyarrow.parquet as pq

    n_rows = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                n_rows += pq.ParquetFile(os.path.join(dirpath, fn)).metadata.num_rows
    if n_rows == 0:
        shutil.rmtree(path)
        return None
    return name


# ---- commit-time maintenance ----


def _kept_paths_df(spark, files: List[DataFileMeta]) -> DataFrame:
    # ONE slice: these path lists are consumed by broadcast joins only
    # (hash build of KB-scale strings, no per-row compute), and each
    # extra slice is a Python-worker round-trip inside the broadcast
    # build job — measured 2 x 1.3 s per DV commit at 12 slices vs
    # ~0.27 s at 1 (the twin 12-task jobs in the dv_roundtrip profile)
    return local_df(spark, [(f.path,) for f in files], "file string", max_slices=1)


def build_commit_dv_df(
    table,
    new_files: List[DataFileMeta],
    kept_files: List[DataFileMeta],
    prev: Optional[Snapshot],
) -> DataFrame:
    """Compute the index for a new snapshot as a DataFrame: previous
    marks on files that survive this commit, plus a mark on every
    non-latest version of each key the commit touches.

    One windowed pass over the affected keys only: rows of touched
    buckets are semi-joined (broadcast) against the new commit's key
    set before the window, so the sort never sees untouched keys. The
    result never leaves the cluster — no ``collect`` anywhere.
    """
    from paimon_python_spark.session import get_spark
    from paimon_python_spark.write import SEQ_COL

    spark = get_spark()
    schema = table.schema
    merge_keys = list(
        dict.fromkeys(schema.partition_keys + schema.trimmed_primary_keys)
    )

    touched_buckets = {f.bucket for f in new_files}
    touched_parts = {tuple(sorted(f.partition.items())) for f in new_files}
    candidates = [
        f
        for f in kept_files
        if f.bucket in touched_buckets
        and tuple(sorted(f.partition.items())) in touched_parts
    ]

    physical = _physical_schema(schema)
    prefix = "file:" + table.table_path + "/"

    def _scan(files: List[DataFileMeta], cols):
        paths = [os.path.join(table.table_path, f.path) for f in files]
        return spark.read.schema(physical).parquet(*paths).select(*cols)

    pos_cols = [
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.row_index").alias("__pos"),
    ]
    versions = _scan(candidates + new_files, [*merge_keys, SEQ_COL, *pos_cols])
    if candidates:
        # restrict the window to keys the commit touches; with no
        # candidate files the scan IS the new files, every key is by
        # definition in the commit's key set, and the semi-join (plus
        # its distinct aggregate and broadcast build) is an identity —
        # skip it (first commit of every DV table hits this)
        new_keys = _scan(new_files, merge_keys).distinct()
        versions = versions.join(F.broadcast(new_keys), merge_keys, "left_semi")
    w = Window.partitionBy(*merge_keys).orderBy(
        F.col(SEQ_COL).desc(), F.col("__fp").desc(), F.col("__pos").desc()
    )
    stale = (
        versions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(
            # relativize executor-side. Guarded: if _metadata.file_path is
            # rendered under a different URI scheme than the expected
            # 'file:<table_path>/' prefix (file://, s3a://, hdfs://...),
            # a blind substring would silently corrupt every mark name
            # and the read-time anti-join would stop filtering deleted
            # rows — so a prefix mismatch fails the job loudly instead.
            F.expr(
                f"CASE WHEN startswith(__fp, {_sql_str(prefix)}) "
                f"THEN substring(__fp, {len(prefix) + 1}) "
                f"ELSE raise_error(concat("
                f"'deletion_vectors: scanned file path ', __fp, "
                f"' does not start with expected table prefix ', "
                f"{_sql_str(prefix)}, "
                f"' — URI scheme mismatch would corrupt DV marks')) END"
            ).alias("file"),
            F.col("__pos").cast("long").alias("pos"),
        )
    )

    prev_df = read_dv_df(spark, table.table_path, prev)
    if prev_df is not None:
        kept = _kept_paths_df(spark, list(kept_files) + list(new_files))
        prev_live = prev_df.join(F.broadcast(kept), "file", "left_semi")
        # the window can only re-derive marks on files it scanned
        # (candidates + new); prev marks on every OTHER live file pass
        # through VERBATIM — their sorted position arrays never explode,
        # never ride the distinct, never re-aggregate. At scale the
        # untouched-bucket marks are the bulk of the index, so a commit
        # no longer shuffles the whole previous index (guide §2.3).
        touched = _kept_paths_df(spark, candidates + new_files)
        prev_touched_pairs = prev_live.join(
            F.broadcast(touched), "file", "left_semi"
        ).select("file", F.explode("positions").alias("pos"))
        untouched = prev_live.join(
            F.broadcast(touched), "file", "left_anti"
        ).select("file", "positions")
        # the window re-derives marks already present in prev (older
        # versions of a re-touched key rank > 1 again). Fold the
        # overlap INSIDE the groupBy (array_distinct over the collected
        # positions) instead of a standalone .distinct(): that was a
        # second full Exchange of every touched pair by (file, pos)
        # right before the Exchange by file (guide §2.4) — same sorted
        # de-duplicated position arrays, one shuffle fewer per commit.
        pairs = prev_touched_pairs.unionByName(stale)
        return (
            pairs.groupBy("file")
            .agg(
                F.sort_array(F.array_distinct(F.collect_list("pos"))).alias(
                    "positions"
                )
            )
            .unionByName(untouched)
        )
    pairs = stale  # row_number > 1 is already duplicate-free
    return pairs.groupBy("file").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def prune_dv_df(
    table, prev: Optional[Snapshot], kept_files: List[DataFileMeta]
) -> Optional[DataFrame]:
    """Drop index entries whose files left the live set (compaction /
    overwrite rewrote them) — broadcast semi-join against the kept
    file list; positions on surviving files stay valid verbatim."""
    from paimon_python_spark.session import get_spark

    spark = get_spark()
    prev_df = read_dv_df(spark, table.table_path, prev)
    if prev_df is None:
        return None
    kept = _kept_paths_df(spark, kept_files)
    return prev_df.join(F.broadcast(kept), "file", "left_semi")


# ---- read-time application ----


def apply_dv(df: DataFrame, table, snapshot: Optional[Snapshot]) -> DataFrame:
    """Filter DV-marked positions out of a scan that carries
    ``__fp``/``__pos`` metadata columns. Anti-join on (file, position):
    the index side is broadcast while its on-disk size is under
    ``deletion-vectors.index-broadcast-bytes`` (a map-side filter, the
    data never exchanges); past that it degrades to a shuffled
    anti-join — slower, but no driver materialization at any size."""
    name = getattr(snapshot, "dv_index", None) if snapshot else None
    if not name:
        return df.drop("__fp", "__pos")
    spark = df.sparkSession
    dv_df = read_dv_df(spark, table.table_path, snapshot)
    prefix = "file:" + table.table_path + "/"
    pairs = dv_df.select(
        F.concat(F.lit(prefix), F.col("file")).alias("__dvfp"),
        F.explode("positions").alias("__dvpos"),
    )
    if dv_index_bytes(table.table_path, name) <= _broadcast_threshold(table.schema):
        pairs = F.broadcast(pairs)
    else:
        # past the threshold a broadcast would OOM the driver/executors;
        # pin a shuffled hash join (hints survive AQE re-planning, which
        # would otherwise demote the "small-looking" side to broadcast)
        pairs = pairs.hint("shuffle_hash")
    return df.join(
        pairs,
        (F.col("__fp") == F.col("__dvfp")) & (F.col("__pos") == F.col("__dvpos")),
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
