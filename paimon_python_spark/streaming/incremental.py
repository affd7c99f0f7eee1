"""Incremental snapshot reads + changelog derivation.

A Paimon-style streaming read is "scan snapshots as they commit": each
snapshot's delta manifest lists exactly the files added by that commit,
so the incremental read between snapshots is a plain multi-file scan of
those deltas — no log replay, no state (SURVEY §3.1's planning applied
per-snapshot). At 100 TB the poll loop moves only driver-side JSON; the
data plane stays a lazy DataFrame per batch.
"""

from __future__ import annotations

from paimon_python_spark._localdf import local_df
import json
import os
import re
import time
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paimon_python_spark.metadata import MetadataStore
from paimon_python_spark.session import get_spark
from paimon_python_spark.write import ADD_KINDS, KIND_COL, SEQ_COL

ROWKIND_NAMES = {0: "+I", 1: "-U", 2: "+U", 3: "-D"}


def _delta_files(store: MetadataStore, from_snapshot: int, to_snapshot: int):
    """Files ADDed by snapshots in (from, to]."""
    files = []
    seen_manifests: set[str] = set()
    if from_snapshot > 0:
        seen_manifests = set(store.read_snapshot(from_snapshot).manifests)
    for sid in range(from_snapshot + 1, to_snapshot + 1):
        snap = store.read_snapshot(sid)
        if snap.commit_kind == "COMPACT":
            # compaction rewrites existing rows — a streaming consumer
            # must not see them again (Paimon streaming scans likewise
            # read only APPEND/OVERWRITE deltas)
            for mname in snap.manifests:
                seen_manifests.add(mname)
            continue
        for mname in snap.manifests:
            if mname in seen_manifests:
                continue
            seen_manifests.add(mname)
            for entry in store.read_manifest(mname):
                if entry.kind == "ADD":
                    files.append(entry.file)
    return files


def read_incremental(
    table, from_snapshot: int, to_snapshot: Optional[int] = None
) -> DataFrame:
    """Rows written between two snapshots (exclusive/inclusive).

    PK tables expose the raw changelog rows with ``_row_kind`` ('+I',
    '-U', '+U', '-D') and ``_SEQUENCE_NUMBER`` — the consumer applies its
    own merge, exactly like a Flink streaming read of the format.
    """
    store = MetadataStore(table.table_path)
    if to_snapshot is None:
        to_snapshot = store.latest_snapshot_id() or 0
    files = _delta_files(store, from_snapshot, to_snapshot)
    spark = get_spark()
    schema = table.schema
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
    if not files:
        out = local_df(spark, [], physical)
    else:
        import os

        paths = [os.path.join(table.table_path, f.path) for f in files]
        out = spark.read.schema(physical).format(schema.file_format()).load(paths)
    if is_pk:
        kind_name = F.element_at(
            F.array(*[F.lit(ROWKIND_NAMES[k]) for k in range(4)]),
            F.col(KIND_COL) + 1,
        )
        out = out.withColumn("_row_kind", kind_name).drop(KIND_COL)
    return out


def changelog_diff(table, from_snapshot: int, to_snapshot: int) -> DataFrame:
    """Exact changelog between two snapshots of a PK table: one row per
    changed key, tagged ``_row_kind`` ∈ {+I, +U, -D} (with -U available
    as the prior image via the ``_before_*`` columns).

    This is the Spark-first equivalent of Paimon's
    changelog-producer=full-compaction: diff the two MERGED states with
    a single full-outer join on the primary key — no per-commit log
    needed, cost is two merged scans + one co-partitioned join.
    """
    import os

    store = MetadataStore(table.table_path)
    schema = table.schema
    if not schema.is_primary_key_table():
        raise ValueError("changelog_diff requires a primary-key table")
    spark = get_spark()

    def merged_at(snapshot_id: int) -> DataFrame:
        from pyspark.sql import Window

        snap = store.read_snapshot(snapshot_id) if snapshot_id > 0 else None
        files = store.live_files(snap) if snap else []
        physical = T.StructType(
            list(schema.spark_schema.fields)
            + [
                T.StructField(SEQ_COL, T.LongType(), False),
                T.StructField(KIND_COL, T.IntegerType(), False),
            ]
        )
        if not files:
            df = local_df(spark, [], physical)
        else:
            paths = [os.path.join(table.table_path, f.path) for f in files]
            df = spark.read.schema(physical).format(schema.file_format()).load(paths)
        from paimon_python_spark.read import merge_on_read

        return merge_on_read(df, schema)

    keys = list(dict.fromkeys(schema.partition_keys + schema.primary_keys))
    vals = [c for c in schema.field_names if c not in keys]
    before = merged_at(from_snapshot)
    after = merged_at(to_snapshot)
    b = before.select(
        *keys,
        F.lit(True).alias("_in_before"),
        *[F.col(c).alias(f"_before_{c}") for c in vals],
    )
    a = after.select(*keys, F.lit(True).alias("_in_after"), *vals)
    joined = a.join(b, on=keys, how="full_outer")
    changed_val = (
        F.lit(False)
        if not vals
        else ~F.struct(*vals).eqNullSafe(
            F.struct(*[F.col(f"_before_{c}").alias(c) for c in vals])
        )
    )
    kind = (
        F.when(F.col("_in_before").isNull(), F.lit("+I"))
        .when(F.col("_in_after").isNull(), F.lit("-D"))
        .when(changed_val, F.lit("+U"))
    )
    return (
        joined.withColumn("_row_kind", kind)
        .filter(F.col("_row_kind").isNotNull())
        .select("_row_kind", *keys, *vals, *[f"_before_{c}" for c in vals])
    )


def stream_snapshots(
    table,
    poll_interval_s: float = 1.0,
    from_snapshot: int = 0,
    max_batches: Optional[int] = None,
    consumer_id: Optional[str] = None,
) -> Iterator[tuple[int, DataFrame]]:
    """Driver-side poll loop: yield (snapshot_id, delta DataFrame) as
    commits land — the micro-batch source a scheduler (or foreachBatch)
    consumes. Bounded by ``max_batches`` for testing.

    ``consumer_id`` gives the loop durable progress (Paimon's
    consumer-id option): the next snapshot to read is persisted under
    ``<table>/consumer/`` after each yield, so a restarted consumer
    resumes where it left off instead of re-reading from
    ``from_snapshot``. Progress advances when the CALLER finishes with
    the yielded batch (next iteration), so a crash mid-batch replays
    that batch — at-least-once, like Paimon's consumer."""
    store = MetadataStore(table.table_path)
    current = from_snapshot
    if consumer_id is not None:
        persisted = read_consumer_offset(table, consumer_id)
        if persisted is not None:
            current = max(current, persisted)
    emitted = 0
    while max_batches is None or emitted < max_batches:
        latest = store.latest_snapshot_id() or 0
        while current < latest:
            nxt = current + 1
            yield nxt, read_incremental(table, current, nxt)
            if consumer_id is not None:
                _write_consumer_offset(table, consumer_id, nxt)
            current = nxt
            emitted += 1
            if max_batches is not None and emitted >= max_batches:
                return
        time.sleep(poll_interval_s)


def _consumer_path(table, consumer_id: str) -> str:
    if not re.match(r"^[A-Za-z0-9][A-Za-z0-9._-]*$", consumer_id):
        raise ValueError(f"invalid consumer id {consumer_id!r}")
    return os.path.join(table.table_path, "consumer", f"consumer-{consumer_id}.json")


def read_consumer_offset(table, consumer_id: str) -> Optional[int]:
    """Last fully-consumed snapshot id for this consumer, or None."""
    try:
        with open(_consumer_path(table, consumer_id)) as f:
            return json.load(f)["next_snapshot"]
    except (FileNotFoundError, KeyError, ValueError):
        return None


def _write_consumer_offset(table, consumer_id: str, snapshot_id: int) -> None:
    path = _consumer_path(table, consumer_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"next_snapshot": snapshot_id}, f)
    os.replace(tmp, path)
