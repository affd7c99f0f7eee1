"""Batch write + commit: Spark jobs produce data files, the driver
publishes them atomically via manifest + snapshot JSON.

Reference behavior being re-expressed (SURVEY §3.2):
- ``BatchTableWrite.write_arrow / write_arrow_batch / write_pandas``
  ingest batches (java_implementation.py:352-377); the JVM's BytesWriter
  checks schema types-ignoring-nullability (BytesWriter.java:59-99) and
  appends rows to per-bucket LSM level-0 files.
- ``prepare_commit`` returns CommitMessages (new files per
  partition/bucket); ``commit`` creates a snapshot
  (java_implementation.py:379-407, table_commit.py:24-36).
- ``overwrite(static_partition)``: None → whole table (or dynamic
  partitions if the table option says so), {'f0':'1'} → that partition
  only (write_builder.py:28-32, semantics test
  test_write_and_read.py:311-383).

Spark-first design decisions:
- Data files physically contain **all** schema columns (partition values
  included), so reads never depend on directory-based partition
  discovery; the directory layout (``__pt_<k>=v/__bucket=N``) exists for
  pruning/inspection and is derived from shadow columns at write time.
- PK tables get two extra physical columns: ``_SEQUENCE_NUMBER`` (int64,
  strictly increasing per commit — last write wins) and ``_VALUE_KIND``
  (int32 RowKind: 0=+I, 1=-U, 2=+U, 3=-D — row_kind.py:22-57).
- Bucket = ``pmod(murmur3(trimmed_pk), num_buckets)`` via ``F.hash`` —
  deterministic across commits so a key always lands in one bucket and
  merge-on-read stays partition-local.
- Per-file stats (min/max/null_count) are harvested from parquet footers
  on the driver after the job — footer reads only, no data scan — and
  feed the scan planner's file skipping.

Sequence-number layout (int64): ``(snapshot_id+1) << 45 | call_idx << 40
| row``. The arrow/pandas ingestion path stamps dense row numbers before
the data reaches Spark (exact input order, like the reference's
per-record sequencing). The distributed ``write_dataframe`` path stamps
``row`` AFTER the bucket co-location shuffle, as the per-task row
counter of ``monotonically_increasing_id`` (its low 33 bits): every row
of a given key lives in exactly one post-shuffle task, so the counter
alone disambiguates same-key rows — merge order only ever compares
sequence numbers *within* a key (merge/compaction/DV windows all
partition by key). No partition-count cap at any cluster size; the only
envelope is 2^33 rows per bucket-task per call. Same-key rows arriving
in one call have no observable input order on a distributed write, so
counter order within the task is as meaningful as any.
"""

from __future__ import annotations

import os
import time
import urllib.parse
from typing import List, Optional

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paimon_python_spark.bloom import build_hex
from paimon_python_spark.deletion_vectors import check_dv_options, dv_enabled
from paimon_python_spark.metadata import (
    DataFileMeta,
    ManifestEntry,
    MetadataStore,
    Snapshot,
)
from paimon_python_spark.session import get_spark
from paimon_python_spark.types import check_write_schema_compatible, pa_schema_to_spark

SEQ_COL = "_SEQUENCE_NUMBER"
KIND_COL = "_VALUE_KIND"
BUCKET_COL = "__bucket"
PART_PREFIX = "__pt_"

# RowKind byte values (pypaimon/pynative/common/row/row_kind.py:22-57)
ROWKIND_INSERT = 0  # +I
ROWKIND_UPDATE_BEFORE = 1  # -U
ROWKIND_UPDATE_AFTER = 2  # +U
ROWKIND_DELETE = 3  # -D
ADD_KINDS = (ROWKIND_INSERT, ROWKIND_UPDATE_AFTER)

#: Paimon RowKind.shortString() → byte value (RowKind.java, public API)
ROWKIND_SHORT_STRINGS = {"+I": 0, "-U": 1, "+U": 2, "-D": 3}


def rowkind_field_expr(df: DataFrame, field: str):
    """Row-kind Column derived from a USER column per the table option
    ``rowkind.field`` (Paimon's RowKindGenerator): a STRING column
    carries the short strings ``+I``/``-U``/``+U``/``-D``, an integer
    column the byte values 0-3; null or any other value raises at
    execution with the offending value, like the JVM generator. The
    field is a regular table column — it stays in the written data."""
    if field not in df.columns:
        raise ValueError(
            f"rowkind.field {field!r} is not a column of the input "
            f"DataFrame ({df.columns})"
        )
    dt = df.schema[field].dataType
    col = F.col(field)
    if isinstance(dt, T.StringType):
        expr = F.lit(None).cast("int")
        for short, code in ROWKIND_SHORT_STRINGS.items():
            expr = F.when(col == short, F.lit(code)).otherwise(expr)
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        # validate BEFORE casting: a bigint outside int range must hit
        # the descriptive raise below, not a cast overflow (or, worse,
        # wrap to a valid kind on a non-ANSI session)
        expr = F.when(col.between(F.lit(0), F.lit(3)), col.cast("int"))
    else:
        raise ValueError(
            f"rowkind.field {field!r} must be a string (+I/-U/+U/-D) or "
            f"integer (0-3) column, got {dt.simpleString()}"
        )
    return F.coalesce(
        expr,
        F.raise_error(
            F.concat(
                F.lit(
                    f"rowkind.field {field!r}: invalid row kind "
                    f"(expect +I/-U/+U/-D or 0-3), got: "
                ),
                F.coalesce(col.cast("string"), F.lit("NULL")),
            )
        ).cast("int"),
    )


def zorder_cluster(df: DataFrame, cols: List[str], bits: int = 6) -> DataFrame:
    """Multi-dimension clustering (write.zorder-columns, sort compaction):
    bucket each column into 2^bits quantile buckets (boundaries from a
    one-pass approxQuantile on the driver — layout-only, so approximation
    is fine), interleave the bucket bits into a z-value, and
    range-partition + sort on it. Files then have TIGHT min/max on EVERY
    listed column, so stats pruning fires for predicates on any of them —
    the property plain sort-columns only gives the leading column. The
    whole thing is one extra shuffle at write time."""
    n_buckets = 2**bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucket_cols = []
    for ci, c in enumerate(cols):
        bounds = df.stat.approxQuantile(c, probs, 0.01)
        # bucket index = how many boundaries are <= value (0..2^bits-1)
        arr = "array(" + ", ".join(repr(b) for b in bounds) + ")"
        df = df.withColumn(
            f"__zb_{ci}",
            F.expr(f"size(filter({arr}, b -> b <= CAST(`{c}` AS DOUBLE)))"),
        )
        bucket_cols.append(f"__zb_{ci}")
    # interleave: dim ci's bit b lands at position b*len(cols)+ci
    parts = [
        f"(((`{bc}` >> {b}) & 1) << {b * len(cols) + ci})"
        for ci, bc in enumerate(bucket_cols)
        for b in range(bits)
    ]
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.withColumn("__zkey", F.expr(" + ".join(parts)))
        .repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *bucket_cols)
    )

_SEQ_COMMIT_SHIFT = 45
_SEQ_CALL_SHIFT = 40


class CommitMessage:
    """New files produced by a write, grouped for the committer
    (the reference's serialized CommitMessage, java_implementation.py:379-381)."""

    def __init__(self, files: List[DataFileMeta]):
        self.files = files

    def is_empty(self) -> bool:
        return not self.files


class BatchWriteBuilder:
    def __init__(self, table):
        self.table = table
        check_dv_options(table.schema)
        self._overwrite = False
        self._static_partition: Optional[dict] = None

    def overwrite(self, static_partition: Optional[dict] = None) -> "BatchWriteBuilder":
        self._overwrite = True
        self._static_partition = static_partition
        return self

    def new_write(self) -> "BatchTableWrite":
        return BatchTableWrite(self.table)

    def new_commit(self) -> "BatchTableCommit":
        return BatchTableCommit(self.table, self._overwrite, self._static_partition)


class DataFileHarvester:
    """Detects and describes the files a Spark write job just produced:
    diff the data dir against the known set, then read footers for
    stats. Driver-side listing per write call — fine at lake-format
    commit rates (a production object-store impl would take the file
    list straight from the Spark committer instead)."""

    def __init__(self, table):
        self.table = table
        self.schema = table.schema
        self.store = MetadataStore(table.table_path)
        self._known_files = self.scan_data_dir()

    def scan_data_dir(self) -> set[str]:
        found = set()
        for root, _dirs, files in os.walk(self.store.data_dir):
            for name in files:
                if name.startswith("part-") and not name.endswith((".crc", "_SUCCESS")):
                    found.add(os.path.join(root, name))
        return found

    def harvest_new_files(self) -> List[DataFileMeta]:
        current = self.scan_data_dir()
        new_paths = sorted(current - self._known_files)
        self._known_files = current
        # index-declaring tables pay a full column scan per file (bloom
        # hashes, bitmap/bsi payloads) — DISTRIBUTE that over the
        # executors when there's real fan-out, instead of serializing
        # every write behind a driver loop. Footer-stats-only harvests
        # stay on the driver (they read KBs per file).
        heavy = bool(self._bloom_columns()) or any(
            self.schema.options.get(o, "").strip()
            for o in ("file-index.bitmap.columns", "file-index.bsi.columns")
        )
        # >1: even two index-heavy files are worth a job — each pays a
        # full column scan + per-distinct-value bitmap build (~1.5 s/file
        # measured on the exact-index gate), so serializing them behind
        # the driver costs more than the ~100 ms job overhead
        if heavy and len(new_paths) > 1:
            try:
                from paimon_python_spark.session import get_spark

                spark = get_spark()
            except Exception:
                spark = None
            if spark is not None:
                tp, sch = self.table.table_path, self.schema
                metas = (
                    spark.sparkContext.parallelize(
                        new_paths, min(len(new_paths), 64)
                    )
                    .map(lambda p: _harvest_file_meta(tp, sch, p))
                    .collect()
                )
                # deterministic manifest order regardless of task order
                return sorted(metas, key=lambda m: m.path)
        return [self.file_meta(path) for path in new_paths]

    def file_meta(self, path: str) -> DataFileMeta:
        return _harvest_file_meta(self.table.table_path, self.schema, path)

    def _bloom_columns(self) -> List[str]:
        return _index_option_cols(self.schema, "file-index.bloom-filter.columns")


def _index_option_cols(schema, opt: str) -> List[str]:
    return [
        c.strip() for c in schema.options.get(opt, "").split(",") if c.strip()
    ]


def _harvest_file_meta(table_path: str, schema, path: str) -> DataFileMeta:
    """One file's manifest metadata: footer stats, bloom hashes
    (file-index.bloom-filter.columns — the min/max-can't-prune point
    lookups), exact index payloads. Module-level and closed over only
    (table_path, schema) so index-heavy harvests can run as a Spark
    job over the file list instead of a driver loop."""
    rel = os.path.relpath(path, table_path)
    partition = _parse_partition_path(schema, path)
    bucket = _parse_bucket_path(path)
    size = os.path.getsize(path)
    rows, stats = (
        _collect_parquet_stats(path)
        if path.endswith(".parquet")
        else _collect_generic_stats(path, schema)
    )
    min_seq = max_seq = None
    if SEQ_COL in stats:
        min_seq = stats[SEQ_COL].get("min")
        max_seq = stats[SEQ_COL].get("max")
    for col in _index_option_cols(schema, "file-index.bloom-filter.columns"):
        vals = _column_values(path, col)
        if vals is not None:
            bloom_hex = build_hex(vals)
            if bloom_hex:
                stats.setdefault(col, {})["bloom"] = bloom_hex
    fi_b64, extra_files = _exact_index_payloads(schema, path)
    return DataFileMeta(
        path=rel,
        row_count=rows,
        file_size=size,
        partition=partition,
        bucket=bucket,
        min_seq=min_seq,
        max_seq=max_seq,
        stats=stats,
        file_index_b64=fi_b64,
        extra_files=extra_files,
    )


def _exact_index_payloads(schema, path: str):
    """file-index.bitmap.columns / file-index.bsi.columns on ENGINE
    tables: one spec-format container per data file with an EXACT
    value-dictionary bitmap and/or bit-sliced index per declared
    column — equality on an absent value plans ZERO files where a
    bloom could false-positive. Returns (inline_b64, extra_files):
    inline base64 in the JSON manifest at or under
    file-index.in-manifest-threshold, standalone <data-stem>.index
    beside the data file above it (same shape the lake writers
    use). Unindexable column types are skipped — never wrong, the
    planner just can't prune on them."""
    import base64
    import os

    from paimon_python_spark.paimon_lake import (
        _bitmap_kind,
        _bsi_kind,
        _index_in_manifest_threshold,
    )

    bitmap_cols = _index_option_cols(schema, "file-index.bitmap.columns")
    bsi_cols = _index_option_cols(schema, "file-index.bsi.columns")
    if not bitmap_cols and not bsi_cols:
        return None, None
    from paimon_python_spark import fileindex_codec as fic

    idx: dict = {}
    for col in bitmap_cols:
        kind = _bitmap_kind(schema, col)
        if kind is None:
            continue
        vals = _column_values(path, col)
        if vals is None:
            continue
        try:
            idx.setdefault(col, {})[fic.BITMAP_INDEX_TYPE] = (
                fic.build_spec_bitmap(vals, kind)
            )
        except ValueError:
            pass
    for col in bsi_cols:
        kind = _bsi_kind(schema, col)
        if kind is None:
            continue
        vals = _column_values(path, col)
        if vals is None:
            continue
        try:
            idx.setdefault(col, {})[fic.BSI_INDEX_TYPE] = (
                fic.build_spec_bsi(vals, kind)
            )
        except ValueError:
            pass
    if not idx:
        return None, None
    raw = fic.write_file_index(idx)
    if len(raw) <= _index_in_manifest_threshold(schema):
        return base64.b64encode(raw).decode("ascii"), None
    name = os.path.basename(path).rsplit(".", 1)[0] + ".index"
    with open(os.path.join(os.path.dirname(path), name), "wb") as xf:
        xf.write(raw)
    return None, [name]


def _parse_partition_path(schema, path: str) -> dict:
    spec = {}
    spark_types = {f.name: f.dataType for f in schema.spark_schema.fields}
    for seg in path.split(os.sep):
        if seg.startswith(PART_PREFIX) and "=" in seg:
            k, v = seg.split("=", 1)
            name = k[len(PART_PREFIX):]
            value = urllib.parse.unquote(v)
            if value == "__HIVE_DEFAULT_PARTITION__":
                spec[name] = None
                continue
            dt = spark_types.get(name)
            if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                spec[name] = int(value)
            elif isinstance(dt, (T.FloatType, T.DoubleType)):
                spec[name] = float(value)
            elif isinstance(dt, T.BooleanType):
                spec[name] = value.lower() == "true"
            else:
                spec[name] = value
    return spec


def _parse_bucket_path(path: str) -> int:
    for seg in path.split(os.sep):
        if seg.startswith(BUCKET_COL + "="):
            return int(seg.split("=", 1)[1])
    return 0


class BatchTableWrite:
    def __init__(self, table):
        self.table = table
        self.schema = table.schema
        self.store = MetadataStore(table.table_path)
        base_snapshot = self.store.latest_snapshot_id() or 0
        self._seq_base = (base_snapshot + 1) << _SEQ_COMMIT_SHIFT
        self._call_idx = 0
        self._pending: List[DataFileMeta] = []
        self._harvester = DataFileHarvester(table)
        self._closed = False

    # ---- ingestion APIs (reference parity) ----

    def write_pandas(self, dataframe) -> None:
        # pandas is coerced to the table's arrow schema, exactly like the
        # reference (RecordBatch.from_pandas(df, schema=self._arrow_schema),
        # java_implementation.py:369-371) — so e.g. pandas int64 data fits
        # an int32 column. write_arrow stays strict (BytesWriter.java:59-66).
        table = pa.Table.from_pandas(
            dataframe, schema=self.schema.pa_schema, preserve_index=False
        )
        self.write_arrow(table)

    def write_arrow_batch(self, record_batch: pa.RecordBatch) -> None:
        self.write_arrow(pa.Table.from_batches([record_batch]))

    def write_arrow(self, table: pa.Table) -> None:
        data_schema = pa_schema_to_spark(table.schema, allow_extended_types=True)
        check_write_schema_compatible(self.schema.spark_schema, data_schema)
        n = table.num_rows
        if self.schema.is_primary_key_table():
            # dense, input-ordered sequence numbers — exact "last write
            # wins" within and across calls, like the reference's
            # per-record sequencing.
            start = self._seq_base + (self._call_idx << _SEQ_CALL_SHIFT)
            table = table.append_column(
                SEQ_COL, pa.array(range(start, start + n), pa.int64())
            )
            table = table.append_column(
                KIND_COL, pa.array([ROWKIND_INSERT] * n, pa.int32())
            )
        spark = get_spark()
        df = spark.createDataFrame(
            table, schema=self._physical_schema() if self.schema.is_primary_key_table() else self.schema.spark_schema
        )
        rk_field = self.schema.options.get("rowkind.field")
        if rk_field and self.schema.is_primary_key_table():
            # arrow/pandas ingestion honors rowkind.field too — the JVM
            # writer derives kinds from the column regardless of API
            df = df.withColumn(KIND_COL, rowkind_field_expr(df, rk_field))
        # driver-provided batch: keep one output file per partition/bucket
        # (the LSM "one sorted run per commit" analogue) instead of one
        # per default parallelism slice.
        self._write_physical(df.coalesce(1))

    def write_dataframe(self, df: DataFrame, row_kind_col: Optional[str] = None) -> None:
        """Scale path: distributed write of an arbitrary DataFrame.

        ``row_kind_col`` names an int column holding RowKind values
        (0/1/2/3) to support changelog ingestion (deletes/updates); rows
        are inserts otherwise. Without it, a declared ``rowkind.field``
        table option derives the kind from that USER column (Paimon's
        RowKindGenerator: +I/-U/+U/-D strings or 0-3 byte values) —
        the column is part of the table and stays in the data.
        """
        rk_field = (
            self.schema.options.get("rowkind.field")
            if row_kind_col is None and self.schema.is_primary_key_table()
            else None
        )
        if rk_field:
            kind = rowkind_field_expr(df, rk_field)
        else:
            kind = (
                F.col(row_kind_col).cast("int")
                if row_kind_col
                else F.lit(ROWKIND_INSERT).cast("int")
            )
        data_cols = [f.name for f in df.schema.fields if f.name != row_kind_col]
        check_write_schema_compatible(
            self.schema.spark_schema,
            T.StructType([df.schema[c] for c in data_cols]),
        )
        if self.schema.is_primary_key_table():
            # sequence numbers are stamped inside _write_physical, after
            # the bucket shuffle (see module docstring) — scale-safe at
            # any input partition count
            df = df.withColumn(KIND_COL, kind).select(*data_cols, KIND_COL)
        else:
            df = df.select(*data_cols)
        self._write_physical(df)

    # ---- physical write ----

    def _physical_schema(self) -> T.StructType:
        fields = list(self.schema.spark_schema.fields)
        if self.schema.is_primary_key_table():
            fields += [
                T.StructField(SEQ_COL, T.LongType(), False),
                T.StructField(KIND_COL, T.IntegerType(), False),
            ]
        return T.StructType(fields)

    def _write_physical(self, df: DataFrame) -> None:
        if self._closed:
            raise RuntimeError("write has been closed")
        schema = self.schema
        layout_cols: List[str] = []
        for pk in schema.partition_keys:
            shadow = PART_PREFIX + pk
            df = df.withColumn(shadow, F.col(pk).cast("string"))
            layout_cols.append(shadow)
        if schema.is_primary_key_table():
            nb = schema.num_buckets()
            df = df.withColumn(
                BUCKET_COL,
                F.pmod(F.hash(*[F.col(k) for k in schema.trimmed_primary_keys]), F.lit(nb)),
            )
            layout_cols.append(BUCKET_COL)
            # co-locate each bucket into one task → one file per bucket
            # per call (the LSM "sorted run" analogue); at scale this is
            # the shuffle that makes merge-on-read partition-local.
            #
            # Width cap (r13, VERDICT task 7): an UNPARTITIONED PK table
            # has at most nb groups, so inheriting an arbitrarily large
            # session shuffle width (a wide cluster's 2000) fans a small
            # commit into thousands of near-empty write tasks and
            # commit-protocol files. Cap at 8x nb (headroom keeps hash
            # spreading effective, guide §2.5) — but ONLY when the
            # session width exceeds the cap: below it the keyless form
            # keeps AQE's coalescing, which r12 measured faster on this
            # path (Finding 19's reverted pin). Partitioned tables have
            # an unknown group count and keep the session width.
            try:
                _w = int(
                    df.sparkSession.conf.get("spark.sql.shuffle.partitions")
                )
            except Exception:
                _w = 0
            _cap = max(8 * nb, 2)
            if not schema.partition_keys and _w > _cap:
                df = df.repartition(_cap, *[F.col(c) for c in layout_cols])
            else:
                df = df.repartition(*[F.col(c) for c in layout_cols])
            if SEQ_COL not in df.columns:
                # distributed write path: stamp post-shuffle, where a
                # key's rows are all in one task — the task-local counter
                # (mono-id low 33 bits) disambiguates same-key rows with
                # no partition-count cap. Hash-partitioning by bucket is
                # exact (AQE may coalesce but never splits hash
                # partitions), so key co-location is guaranteed.
                base = self._seq_base + (self._call_idx << _SEQ_CALL_SHIFT)
                data_cols = [
                    c for c in df.columns if c not in (KIND_COL, *layout_cols)
                ]
                df = df.withColumn(
                    SEQ_COL,
                    (
                        F.lit(base)
                        + F.monotonically_increasing_id().bitwiseAND(
                            F.lit((1 << 33) - 1)
                        )
                    ).cast("long"),
                ).select(*data_cols, SEQ_COL, KIND_COL, *layout_cols)

        # optional write clustering: sorting within each task makes the
        # per-file min/max stats tight on the sort columns, so the scan
        # planner's stats pruning actually skips files on those
        # dimensions (the poor-man's z-order; at 100 TB this is the
        # difference between stats that prune and stats that span the
        # whole domain in every file).
        zorder_cols = [
            c.strip()
            for c in schema.options.get("write.zorder-columns", "").split(",")
            if c.strip()
        ]
        if zorder_cols and not schema.is_primary_key_table():
            df = self._zorder_cluster(df, zorder_cols)

        sort_cols = [
            c.strip()
            for c in schema.options.get("write.sort-columns", "").split(",")
            if c.strip()
        ]
        if sort_cols:
            if schema.is_primary_key_table():
                # bucket co-location must survive: sort only inside each
                # bucket's task (runs come out key-clustered per bucket)
                df = df.sortWithinPartitions(*sort_cols)
            else:
                # range-partition so each FILE covers a disjoint range —
                # that's what makes min/max stats disjoint and prunable.
                # Explicit partition count: AQE would otherwise coalesce
                # a small write into one file and erase the clustering.
                n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
                df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
                    *sort_cols
                )

        fmt = schema.file_format()
        compression = schema.options.get("file.compression", "")
        if fmt == "avro":
            self._write_avro_distributed(df, layout_cols, codec=compression or "null")
        else:
            # INT96 (Spark's legacy default) writes NO footer stats for
            # timestamps — killing row-group pruning and the
            # tag.watermark-column derivation. MICROS is the modern
            # interop encoding every reader row-group-prunes on.
            df.sparkSession.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
            writer = df.write.mode("append")
            if layout_cols:
                writer = writer.partitionBy(*layout_cols)
            if compression:
                writer = writer.option("compression", compression)
            writer.format(fmt).save(self.store.data_dir)

        self._pending.extend(self._harvester.harvest_new_files())
        self._call_idx += 1

    def _zorder_cluster(self, df: DataFrame, cols: List[str], bits: int = 6) -> DataFrame:
        return zorder_cluster(df, cols, bits)

    def _write_avro_distributed(
        self, df: DataFrame, layout_cols: List[str], codec: str = "null"
    ) -> None:
        """Avro writes run inside Spark tasks via ``mapInPandas`` (no
        spark-avro DataSource in this environment): each task groups its
        rows by layout values and writes one container file per group
        into the same hive-style directory layout the parquet writer
        produces, so planning/harvesting/reading are format-agnostic."""
        import pandas as pd

        from paimon_python_spark.avro_codec import write_avro

        data_dir = self.store.data_dir
        out_fields = [f for f in df.schema.fields if f.name not in layout_cols]
        out_schema = T.StructType(out_fields)
        names = [f.name for f in out_fields]
        layout = list(layout_cols)

        def to_rows(pdf: "pd.DataFrame") -> list:
            cols = [pdf[n].tolist() for n in names]
            rows = []
            for tup in zip(*cols) if cols else []:
                rows.append(
                    tuple(None if pd.isna(v) else v for v in tup)
                )
            return rows

        def write_batches(batches):
            groups: dict = {}
            for pdf in batches:
                if layout:
                    for key, g in pdf.groupby(layout, dropna=False, sort=False):
                        key = key if isinstance(key, tuple) else (key,)
                        groups.setdefault(key, []).append(g[names])
                else:
                    groups.setdefault((), []).append(pdf[names])
            import uuid as _uuid

            n = 0
            for key, parts in groups.items():
                subdir = data_dir
                for c, v in zip(layout, key):
                    sval = (
                        "__HIVE_DEFAULT_PARTITION__"
                        if v is None or (isinstance(v, float) and pd.isna(v))
                        else str(v)
                    )
                    subdir = os.path.join(subdir, f"{c}={sval}")
                os.makedirs(subdir, exist_ok=True)
                path = os.path.join(subdir, f"part-{_uuid.uuid4().hex}.avro")
                write_avro(
                    path,
                    to_rows(pd.concat(parts, ignore_index=True)),
                    out_schema,
                    codec=codec,
                )
                n += 1
            yield pd.DataFrame({"files": [n]})

        df.mapInPandas(write_batches, "files long").collect()

    # ---- commit handoff ----

    def prepare_commit(self) -> List[CommitMessage]:
        return [CommitMessage(list(self._pending))]

    def close(self) -> None:
        self._closed = True


class BatchTableCommit:
    def __init__(self, table, overwrite: bool, static_partition: Optional[dict]):
        self.table = table
        self.store = MetadataStore(table.table_path)
        self._overwrite = overwrite
        self._static_partition = static_partition
        self._closed = False
        self._watermark: Optional[int] = None

    def with_watermark(self, watermark) -> "BatchTableCommit":
        """Stamp this commit's event-time watermark (epoch millis, or a
        datetime/date/ISO string). The snapshot folds max(previous,
        provided) — watermarks never regress — and
        ``tag.automatic-creation=watermark`` tags the first commit of
        each watermark period. Without an explicit value, a declared
        ``tag.watermark-column`` option derives the watermark from the
        commit's own file stats (max of that column — zero extra IO)."""
        from paimon_python_spark.tags import watermark_millis

        self._watermark = watermark_millis(watermark)
        return self

    def _effective_watermark(self, new_files) -> Optional[int]:
        """Explicit watermark, else max(tag.watermark-column) across the
        new files' harvested stats (no data reads)."""
        if self._watermark is not None:
            return self._watermark
        wcol = self.table.schema.options.get("tag.watermark-column")
        if not wcol:
            return None
        from paimon_python_spark.tags import watermark_millis

        maxes = [
            watermark_millis(f.stats[wcol].get("max"))
            for f in new_files
            if f.stats.get(wcol)
        ]
        maxes = [m for m in maxes if m is not None]
        return max(maxes) if maxes else None

    def commit(self, commit_messages: List[CommitMessage]) -> None:
        if self._closed:
            raise RuntimeError("commit has been closed")
        new_files: List[DataFileMeta] = []
        for msg in commit_messages:
            new_files.extend(msg.files)
        if not new_files and not self._overwrite:
            return

        # optimistic concurrency: recompute against the fresh latest
        # snapshot and retry when another committer wins the id race
        # (SnapshotConflictError from the store's exclusive publish).
        # Manifests written by losing attempts become orphans, which
        # maintenance.remove_orphan_files reclaims.
        from paimon_python_spark.metadata import SnapshotConflictError

        last_err: Optional[Exception] = None
        for _attempt in range(20):
            if _attempt:
                # jittered backoff: lockstep retries under many-writer
                # contention re-collide; the re-plan is KB-scale
                import random as _random
                import time as _time

                _time.sleep(_random.uniform(0, 0.02 * _attempt))
            try:
                self._commit_once(new_files)
                return
            except SnapshotConflictError as err:
                last_err = err
        raise RuntimeError(
            f"commit failed after 20 conflict retries: {last_err}"
        )

    def _commit_once(self, new_files: List[DataFileMeta]) -> None:
        prev = self.store.latest_snapshot()
        scan_max = self.store.max_snapshot_id_scan()
        if scan_max is not None and (prev is None or prev.id < scan_max):
            # LATEST pointer lagging a just-published snapshot
            prev = self.store.read_snapshot(scan_max)
        prev_total = prev.total_record_count if prev else 0
        entries = [ManifestEntry("ADD", f) for f in new_files]
        commit_kind = "APPEND"
        manifests: List[str]
        deleted_rows = 0
        kept_files: Optional[List[DataFileMeta]] = None

        if self._overwrite:
            commit_kind = "OVERWRITE"
            live = self.store.live_files(prev)
            to_delete = self._overwritten_files(live, new_files)
            deleted_rows = sum(f.row_count for f in to_delete)
            gone = {f.path for f in to_delete}
            kept_files = [f for f in live if f.path not in gone]
            if to_delete or entries:
                entries = [ManifestEntry("DELETE", f) for f in to_delete] + entries
            if self._whole_table_overwrite():
                # fresh base manifest: planning stays O(live files)
                manifest = self.store.write_manifest(
                    [ManifestEntry("ADD", f) for f in new_files]
                )
                manifests = [manifest]
                deleted_rows = prev_total
            else:
                manifest = self.store.write_manifest(entries)
                manifests = (prev.manifests if prev else []) + [manifest]
        else:
            manifest = self.store.write_manifest(entries)
            manifests = (prev.manifests if prev else []) + [manifest]

        dv_index = None
        if dv_enabled(self.table.schema) and (new_files or self._overwrite):
            from paimon_python_spark.deletion_vectors import (
                build_commit_dv_df,
                prune_dv_df,
                write_dv_df,
            )

            if kept_files is None:
                kept_files = self.store.live_files(prev) if prev else []
            if new_files:
                dv_df = build_commit_dv_df(self.table, new_files, kept_files, prev)
            else:
                # overwrite that only removed files: carry forward the
                # marks on surviving files (dropping the index here
                # would resurrect their stale row versions)
                dv_df = prune_dv_df(self.table, prev, kept_files)
            sid = (prev.id + 1) if prev else 1
            dv_index = write_dv_df(self.table.table_path, sid, dv_df)

        added_rows = sum(f.row_count for f in new_files)
        # monotone watermark fold: max(previous, this commit's), never
        # regressing on a commit that carries none
        wm = self._effective_watermark(new_files)
        prev_wm = prev.watermark if prev else None
        snap_wm = (
            max(v for v in (wm, prev_wm) if v is not None)
            if (wm is not None or prev_wm is not None)
            else None
        )
        snapshot = Snapshot(
            id=(prev.id + 1) if prev else 1,
            schema_id=0,
            commit_kind=commit_kind,
            manifests=manifests,
            total_record_count=prev_total - deleted_rows + added_rows,
            delta_record_count=added_rows,
            time_millis=int(time.time() * 1000),
            dv_index=dv_index,
            watermark=snap_wm,
        )
        self.store.write_snapshot(snapshot)
        # AUTOMATIC TAG CREATION (lake twin does the same in its commit)
        if self.table.schema.options.get("tag.automatic-creation"):
            from paimon_python_spark.tags import auto_create_tag

            auto_create_tag(self.table, snapshot)

    def _dynamic_overwrite(self) -> bool:
        # Paimon's dynamic-partition-overwrite defaults to true; F6 sets it
        # to 'false' to get whole-table semantics on a partitioned table.
        return (
            self.table.schema.options.get("dynamic-partition-overwrite", "true")
            == "true"
        )

    def _whole_table_overwrite(self) -> bool:
        if self._static_partition:
            return False
        if not self.table.schema.partition_keys:
            return True
        return not self._dynamic_overwrite()

    def _overwritten_files(
        self, live: List[DataFileMeta], new_files: List[DataFileMeta]
    ) -> List[DataFileMeta]:
        if self._static_partition:
            spec = {str(k): str(v) for k, v in self._static_partition.items()}
            return [
                f
                for f in live
                if all(str(f.partition.get(k)) == v for k, v in spec.items())
            ]
        if not self.table.schema.partition_keys or not self._dynamic_overwrite():
            return list(live)
        # dynamic: only partitions present in the new data are replaced
        new_parts = {tuple(sorted(f.partition.items())) for f in new_files}
        return [
            f for f in live if tuple(sorted(f.partition.items())) in new_parts
        ]

    def close(self) -> None:
        self._closed = True


# ---- driver-side stats harvesting ----


def _json_safe(v):
    import datetime

    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        # ISO strings: JSON-safe, string-sortable (fixed-width same-
        # precision), and parseable back (tag.watermark-column
        # derivation). Predicate literals stay datetime objects, so
        # test_by_stats' mixed-type compare raises → conservative True,
        # exactly the no-stats behavior these columns had before.
        return (
            v.isoformat(sep=" ")
            if isinstance(v, datetime.datetime)
            else v.isoformat()
        )
    return None  # binary/decimal: skip stats rather than mis-compare


def _collect_parquet_stats(path: str) -> tuple[int, dict]:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    rows = md.num_rows
    agg: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested: skip
                continue
            st = col.statistics
            cur = agg.setdefault(
                name, {"min": None, "max": None, "null_count": 0, "row_count": rows}
            )
            if st is None:
                cur["null_count"] = None
                continue
            if st.null_count is not None and cur["null_count"] is not None:
                cur["null_count"] += st.null_count
            else:
                cur["null_count"] = None
            mn, mx = _json_safe(st.min if st.has_min_max else None), _json_safe(
                st.max if st.has_min_max else None
            )
            if mn is not None and (cur["min"] is None or mn < cur["min"]):
                cur["min"] = mn
            if mx is not None and (cur["max"] is None or mx > cur["max"]):
                cur["max"] = mx
    for cur in agg.values():
        cur["min"] = _truncate_min(cur["min"])
        cur["max"] = _truncate_max(cur["max"])
    return rows, agg


_STATS_MAX_LEN = 64


def _truncate_min(v):
    """Manifest-friendly string min: a prefix is always <= the full
    value, so truncation stays a SOUND lower bound. Without this, a
    documents-style table embeds whole documents in every manifest
    entry (metadata amplification that breaks planning at 100 TB)."""
    if isinstance(v, str) and len(v) > _STATS_MAX_LEN:
        return v[:_STATS_MAX_LEN]
    return v


def _truncate_max(v):
    """Sound upper bound: truncate then increment the last character
    that isn't already the max code point (parquet's truncation rule).
    Falls back to the full value if every char is U+10FFFF."""
    if not (isinstance(v, str) and len(v) > _STATS_MAX_LEN):
        return v
    t = v[:_STATS_MAX_LEN]
    for i in range(len(t) - 1, -1, -1):
        cp = ord(t[i])
        if cp < 0x10FFFF:
            return t[:i] + chr(cp + 1)
    return v


def _column_values(path: str, col: str):
    """All values of one column of a data file (for bloom building), or
    None when the format/column can't be read column-pruned. Driver-side
    like the footer stats; a production impl would fold this into the
    write tasks."""
    try:
        if path.endswith(".parquet"):
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(path)
            if col not in pf.schema_arrow.names:
                return None
            return pf.read(columns=[col]).column(col).to_pylist()
        if path.endswith(".avro"):
            from paimon_python_spark.avro_codec import read_avro_table

            with open(path, "rb") as f:
                names, rows = read_avro_table(f.read())
            if col not in names:
                return None
            i = names.index(col)
            return [r[i] for r in rows]
    except Exception:
        return None
    return None


def _collect_generic_stats(path: str, schema) -> tuple[int, dict]:
    """ORC fallback: row count via pyarrow dataset; no column stats
    (scan-planner then simply can't skip those files). Avro: decode with
    the engine codec and compute real min/max/null stats — the files are
    our own, written one commit earlier."""
    if path.endswith(".avro"):
        from paimon_python_spark.avro_codec import read_avro_table

        try:
            with open(path, "rb") as f:
                names, rows = read_avro_table(f.read())
        except Exception:
            return 0, {}
        stats: dict[str, dict] = {}
        for i, name in enumerate(names):
            col = [r[i] for r in rows]
            non_null = [v for v in col if v is not None]
            stats[name] = {
                "min": _truncate_min(_json_safe(min(non_null))) if non_null else None,
                "max": _truncate_max(_json_safe(max(non_null))) if non_null else None,
                "null_count": len(col) - len(non_null),
                "row_count": len(rows),
            }
        return len(rows), stats

    import pyarrow.dataset as ds

    try:
        dataset = ds.dataset(path, format="orc")
        return dataset.count_rows(), {}
    except Exception:
        return 0, {}
