"""Spark Python Data Source for REAL Paimon lakes:
``spark.read.format("paimon_lake").option("path", lake_dir)`` and
``spark.readStream.format("paimon_lake")`` — the idiomatic Spark-4
front door onto a Flink/Spark-JVM-written (or engine-written) lake,
on the same driver-side planner every lake read uses.

- batch: one ``InputPartition`` per (partition, bucket) group for PK
  lakes (the merge unit — the executor-local merge needs no shuffle,
  same shape as ``merge_pk_entries_bucket_local``) and one per file
  for append lakes; pushed filters re-enter the engine predicate tree
  so partition pruning, manifest-stats skipping, bloom probes, and PK
  bucket pruning all fire before partitions exist.
- streaming: snapshot-id offsets; each micro-batch plans one
  ``InputPartition`` per delta file of the commits in ``(start, end]``
  (COMPACT rewrites skipped — the engine incremental contract) and
  executors read the files directly (``DataSourceStreamReader`` —
  micro-batch rows never pass through the driver, so a high-rate
  source scales with the cluster, not the driver).
- write: ``df.write.format("paimon_lake")`` on append lakes AND
  fixed-bucket PK lakes, ``mode("append")`` / ``mode("overwrite")`` —
  executors route rows (PK: the same murmur bucket hash the builder
  uses) and write spec-named data files straight into the partitioned
  lake layout; the driver commits one spec snapshot with stats (an
  OVERWRITE commit DELETEs every previously-visible file, like
  overwrite_lake). See ``PaimonLakeBatchWriter`` for the refusals
  (dynamic-bucket routing, changelog-producing PK appends).

Deletion-vector lakes read transparently: each file's (index, offset,
length) triple rides its partition spec and the executor decodes the
roaring bitmap and drops marked positions before the merge. Field-id
schema evolution reads transparently too: pre-evolution files read by
their own column names (precomputed per-schema column maps ride the
specs) and remap to the current schema, NULL-filling dropped ids.

Scope guards (clear refusals, not wrong answers): a (partition,
bucket) group over ``bucket-local.max-group-bytes`` refuses with a
pointer to ``PaimonLakeTable`` reads (exact key-window merge — the
data source has no shuffle plan to fall back to); PK-lake streaming
points at ``stream_lake_snapshots`` (changelog semantics don't fit a
plain row stream).

Reference parity: the reference exposes lakes only through its own
builder API (java_implementation.py); a native Spark ``format(...)``
entry is capability this bridge adds.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _LakeGroupPartition(InputPartition):
    def __init__(self, spec: str, predicate=None):
        self.spec = spec
        self.predicate = predicate  # engine Predicate, pickled with the partition


def _json_safe_part(info, partition: dict) -> dict:
    from paimon_python_spark.paimon_import import logical_partition_values

    out = {}
    for k, v in logical_partition_values(info, partition).items():
        out[k] = v.isoformat() if hasattr(v, "isoformat") else v
    return out


def _part_value(info, name, v):
    import datetime

    dt = info.spark_schema[name].dataType
    if v is not None and isinstance(dt, T.DateType):
        if isinstance(v, int):
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        return datetime.date.fromisoformat(v)
    return v


class PaimonLakeBatchReader(DataSourceReader):
    def __init__(
        self,
        table_path: str,
        claim_filters: bool = True,
        snapshot_id: "Optional[int]" = None,
        tag: "Optional[str]" = None,
        timestamp_millis: "Optional[int]" = None,
        audit: bool = False,
    ):
        from paimon_python_spark.paimon_lake import read_paimon_schema

        self.table_path = table_path
        self.info = read_paimon_schema(table_path)
        self._predicate = None
        # $audit_log: every STORED row, merge-free, leading rowkind;
        # DV marks NOT applied; filters never claimed (audit schema
        # leads with rowkind — Spark applies everything row-level)
        self._audit = audit
        if audit:
            claim_filters = False
        self._claim_filters = claim_filters
        # time travel (Paimon's scan.snapshot-id / scan.tag-name /
        # scan.timestamp-millis): resolved by the read builder at plan
        # time; rows project to the CURRENT schema by field id, the
        # builder-path contract (with_snapshot / with_tag /
        # with_timestamp in paimon_lake.py)
        self._tt_snapshot = snapshot_id
        self._tt_tag = tag
        self._tt_timestamp = timestamp_millis

    def pushFilters(self, filters):
        from paimon_python_spark.datasource import _filters_to_predicate

        self._predicate = None
        if not self._claim_filters:
            yield from filters
            return
        names = [f.name for f in self.info.spark_schema.fields]
        supported, unsupported = _filters_to_predicate(filters, names)
        if supported:
            from paimon_python_spark.predicate import PredicateBuilder

            pb = PredicateBuilder(names)
            self._predicate = pb.and_predicates([p for _, p in supported])
            if self.info.primary_keys:
                # merge-correctness: value predicates re-apply AFTER the
                # merge — Spark keeps them; the planner still prunes on
                # the key/partition sub-predicate
                yield from (f for f, _ in supported)
        yield from unsupported

    def _colmap(self, schema_id: int):
        from paimon_python_spark.paimon_import import field_id_colmap

        return field_id_colmap(self.table_path, self.info, schema_id)

    def partitions(self):
        from paimon_python_spark.paimon_import import plan_paimon_dv
        from paimon_python_spark.paimon_lake import (
            PaimonLakeTable,
            _pruned_entries,
        )

        info = self.info
        from paimon_python_spark.datasource import _check_ds_merge_supported

        if not self._audit:  # audit is merge-free: every engine reads
            _check_ds_merge_supported(info, "paimon_lake")
        b = PaimonLakeTable(self.table_path).new_read_builder()
        if self._tt_tag is not None:
            b = b.with_tag(self._tt_tag)
        if self._tt_snapshot is not None:
            b = b.with_snapshot(self._tt_snapshot)
        if self._tt_timestamp is not None:
            b = b.with_timestamp(self._tt_timestamp)
        # DV lakes: per-file (index file, offset, length) triples ride
        # the partition specs; executors decode the roaring bitmaps and
        # drop marked positions BEFORE the merge (the builder path's
        # contract — apply_lake_dv — without its driver-side join plan).
        # Planned under the SAME snapshot as the file set: a time-travel
        # read must see that snapshot's marks, not today's.
        dv_by_file = (
            {}  # audit shows stored rows: DV marks are NOT applied
            if self._audit
            else {
                r.data_file_name: [r.index_path, r.offset, r.length]
                for r in plan_paimon_dv(
                    self.table_path, b._snapshot_id, snapshot=b._snapshot_dict()
                )
            }
        )
        predicate, self._predicate = self._predicate, None  # consume
        if predicate is not None:
            b = b.with_filter(predicate)
        entries = _pruned_entries(self.table_path, info, b)
        part_types = [info.spark_schema[k].dataType for k in info.partition_keys]
        default_name = info.options.get("partition.default-name", None)

        def src(e):
            kw = {"default_name": default_name} if default_name else {}
            return os.path.join(
                self.table_path, e.rel_path(info.partition_keys, part_types, **kw)
            )

        fmt = info.options.get("file.format", "parquet")
        parts: List[_LakeGroupPartition] = []
        if info.primary_keys:
            from paimon_python_spark.paimon_import import (
                _BUCKET_LOCAL_MAX_GROUP_BYTES,
                max_group_bytes,
            )

            budget = int(
                info.options.get(
                    "bucket-local.max-group-bytes",
                    _BUCKET_LOCAL_MAX_GROUP_BYTES,
                )
            )
            if max_group_bytes(entries) > budget:
                # one (partition, bucket) group would merge in a single
                # task's memory — same scale guard as the builder path,
                # which falls back to its exact key-window merge; the
                # data source has no window plan to fall back to, so it
                # refuses rather than OOM a task
                raise RuntimeError(
                    "paimon_lake data source: a (partition, bucket) group "
                    f"exceeds bucket-local.max-group-bytes={budget} on disk; "
                    "read via PaimonLakeTable(path).new_read_builder() "
                    "(exact key-window merge, spills instead of OOMing)"
                )
            groups: dict = {}
            for i, e in enumerate(entries):
                key = (tuple(sorted(e.partition.items())), e.bucket)
                groups.setdefault(key, []).append((i, e))
            for (_, _b), es in sorted(groups.items()):
                parts.append(
                    _LakeGroupPartition(
                        json.dumps(
                            {
                                "kv": True,
                                "fmt": fmt,
                                "files": [
                                    [
                                        i,
                                        src(e),
                                        e.level,
                                        self._colmap(e.schema_id),
                                        dv_by_file.get(e.file_name),
                                    ]
                                    for i, e in es
                                ],
                                "partition": _json_safe_part(info, es[0][1].partition),
                            }
                        ),
                        predicate,
                    )
                )
        else:
            for e in entries:
                parts.append(
                    _LakeGroupPartition(
                        json.dumps(
                            {
                                "kv": False,
                                "fmt": fmt,
                                "files": [
                                    [
                                        0,
                                        src(e),
                                        e.level,
                                        self._colmap(e.schema_id),
                                        dv_by_file.get(e.file_name),
                                    ]
                                ],
                                "partition": _json_safe_part(info, e.partition),
                            }
                        ),
                        predicate,
                    )
                )
        return parts or [
            _LakeGroupPartition(
                json.dumps(
                    {"kv": False, "fmt": fmt, "files": [], "partition": {}}
                )
            )
        ]

    def _read_file(self, path: str, fmt: str, cols):
        if fmt == "orc":
            import pyarrow.orc as po

            f = po.ORCFile(path)
            have = [c for c in cols if c in f.schema.names]
            return f.read(columns=have)
        if fmt == "avro":
            import pyarrow as pa

            from paimon_python_spark.avro_codec import read_avro_table

            with open(path, "rb") as fh:
                names, rows = read_avro_table(fh.read())
            keep = [c for c in cols if c in names]
            idx = {c: names.index(c) for c in keep}
            return pa.table({c: [r[idx[c]] for r in rows] for c in keep})
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        have = [c for c in cols if c in pf.schema_arrow.names]
        return pf.read(columns=have)

    def _filler_pa_type(self, info, col: str):
        """Arrow type for a NULL-filled column (dropped field id in a
        pre-evolution file): value/key columns follow the current table
        schema; the two sequence system columns are fixed by the writer
        (paimon_lake._write_kv_files: int64 / int32)."""
        import pyarrow as pa

        from paimon_python_spark.types import spark_type_to_pa

        if col == "_SEQUENCE_NUMBER":
            return pa.int64()
        if col == "_VALUE_KIND":
            return pa.int32()
        base = col[5:] if col.startswith("_KEY_") else col
        for f in info.spark_schema.fields:
            if f.name == base:
                return spark_type_to_pa(f.dataType)
        return pa.null()

    def read(self, partition: _LakeGroupPartition) -> Iterator:
        import pandas as pd
        import pyarrow as pa

        from paimon_python_spark.types import spark_schema_to_pa

        info = self.info
        spec = json.loads(partition.spec)
        if not spec["files"]:
            return
        part_keys = list(info.partition_keys)
        trimmed = [k for k in info.primary_keys if k not in part_keys]
        value_names = [
            f.name for f in info.spark_schema.fields if f.name not in part_keys
        ]
        key_cols = [f"_KEY_{k}" for k in trimmed]
        sys_cols = (
            key_cols + ["_SEQUENCE_NUMBER", "_VALUE_KIND"] if spec["kv"] else []
        )
        cols = sys_cols + value_names
        frames = []
        for idx, path, level, colmap, dv in spec["files"]:
            # field-id schema evolution: read a pre-evolution file by
            # its OWN column names, then rename to the current schema
            # (renamed columns follow their field id; dropped ids
            # NULL-fill) — the pyarrow twin of _mapped_select
            if colmap:
                src_cols = sys_cols + [
                    colmap[c] for c in value_names if colmap.get(c)
                ]
            else:
                src_cols = cols
            f = self._read_file(path, spec["fmt"], src_cols).to_pandas(
                types_mapper=pd.ArrowDtype
            )
            if dv:
                # deletion vector: drop this file's marked row positions
                # BEFORE the merge (builder-path contract; the merge
                # after the drop stays exact — DV marks superseded rows)
                import numpy as np

                from paimon_python_spark.paimon_import import (
                    read_dv_index_entry,
                )

                pos = read_dv_index_entry(str(dv[0]), int(dv[1]), int(dv[2]))
                keep = np.setdiff1d(
                    np.arange(len(f), dtype=np.int64), pos.astype(np.int64)
                )
                f = f.iloc[keep].reset_index(drop=True)
            if colmap:
                f = f.rename(
                    columns={
                        colmap[c]: c
                        for c in value_names
                        if colmap.get(c) and colmap[c] != c
                    }
                )
            for c in cols:
                if c not in f.columns:
                    # dtype-explicit filler: an object all-NA column would
                    # make pd.concat's result dtype depend on pandas
                    # version (FutureWarning today, dtype shift tomorrow)
                    f[c] = pd.Series(
                        pd.NA,
                        index=f.index,
                        dtype=pd.ArrowDtype(self._filler_pa_type(info, c)),
                    )
            f["__lvl"] = level
            f["__idx"] = idx
            frames.append(f)
        g = pd.concat(frames, ignore_index=True)
        if self._audit and spec["kv"]:
            # $audit_log: merge-free, rowkind decoded from _VALUE_KIND
            g["__rowkind"] = (
                g["_VALUE_KIND"]
                .astype("int64")
                .map({0: "+I", 1: "-U", 2: "+U", 3: "-D"})
            )
        elif spec["kv"]:
            # merge-engine dispatch for the in-task-expressible engines
            # (others refused at plan time). Lake writers bake a declared
            # sequence.field into _SEQUENCE_NUMBER, so the sequence sort
            # already carries event-time order here.
            engine = info.options.get("merge-engine", "deduplicate")
            if info.options.get("ignore-delete", "false").lower() == "true":
                # retracts drop BEFORE the merge — a -D must not shadow
                # the standing row (merge_on_read's pre-merge filter)
                g = g[g["_VALUE_KIND"].isin((0, 2))]
            if engine == "first-row":
                g = g.sort_values(
                    key_cols + ["_SEQUENCE_NUMBER", "__lvl", "__idx"],
                    ascending=[True] * len(key_cols) + [True, False, True],
                    kind="mergesort",
                )
                g = g.drop_duplicates(subset=key_cols, keep="first")
                g = g[g["_VALUE_KIND"].isin((0, 2))]
            elif engine == "partial-update":
                # full partial-update surface in-task (r12): sequence
                # groups, per-field scalar aggregates,
                # remove-record-on-delete — the builder's semantics via
                # the shared pandas twin (lake seqs unique per row;
                # (lvl desc, idx asc) breaks foreign-lake collisions)
                from paimon_python_spark.agg_merge import (
                    pandas_partial_update_merge,
                )

                g = g.sort_values(
                    ["_SEQUENCE_NUMBER", "__lvl", "__idx"],
                    ascending=[True, False, True],
                    kind="mergesort",
                ).reset_index(drop=True)
                g["__ord"] = range(len(g))
                value_names_only = [
                    f.name
                    for f in info.spark_schema.fields
                    if f.name not in part_keys and f.name not in key_cols
                ]
                g = pandas_partial_update_merge(
                    g,
                    info,
                    key_cols,
                    value_names_only,
                    "__ord",
                    "_VALUE_KIND",
                )
            elif engine == "aggregation":
                # executor-local twin of the builder's one-hash-
                # aggregate fold (agg_merge.pandas_agg_merge; hll_sketch
                # fields refused at plan time). Lake seqs are unique per
                # stored row; (lvl desc, idx asc) breaks any foreign-
                # lake collision the same way the dedup sort does.
                from paimon_python_spark.agg_merge import pandas_agg_merge

                g = g.sort_values(
                    ["_SEQUENCE_NUMBER", "__lvl", "__idx"],
                    ascending=[True, False, True],
                    kind="mergesort",
                ).reset_index(drop=True)
                g["__ord"] = range(len(g))
                value_names_only = [
                    f.name
                    for f in info.spark_schema.fields
                    if f.name not in part_keys and f.name not in key_cols
                ]
                g = pandas_agg_merge(
                    g,
                    info,
                    key_cols,
                    value_names_only,
                    "__ord",
                    "_VALUE_KIND",
                )
            else:  # deduplicate
                g = g.sort_values(
                    key_cols + ["_SEQUENCE_NUMBER", "__lvl", "__idx"],
                    ascending=[True] * len(key_cols) + [False, True, False],
                    kind="mergesort",
                )
                g = g.drop_duplicates(subset=key_cols, keep="first")
                g = g[g["_VALUE_KIND"].isin((0, 2))]
        out = pd.DataFrame(index=g.index)
        if self._audit:
            out["rowkind"] = (
                g["__rowkind"].astype(object)
                if "__rowkind" in g.columns
                else pd.Series(["+I"] * len(g), index=g.index, dtype=object)
            )
        for f in info.spark_schema.fields:
            if f.name in part_keys:
                v = _part_value(info, f.name, spec["partition"].get(f.name))
                out[f.name] = pd.Series([v] * len(g), index=g.index, dtype=object)
            else:
                col = g[f.name]
                out[f.name] = col.astype(object).where(col.notna(), None)
        out_schema = info.spark_schema
        if self._audit:
            out_schema = T.StructType(
                [T.StructField("rowkind", T.StringType(), False)]
                + list(info.spark_schema.fields)
            )
        tbl = pa.Table.from_pandas(
            out,
            schema=spark_schema_to_pa(out_schema),
            preserve_index=False,
        )
        if partition.predicate is not None and not spec["kv"]:
            # append lakes: we CLAIMED these filters, so apply row-level
            import pyarrow.dataset as ds

            tbl = ds.dataset(tbl).to_table(
                filter=partition.predicate.to_arrow()
            )
        yield from tbl.to_batches(max_chunksize=4096)


class PaimonLakeStreamReader(DataSourceStreamReader):
    """PARTITION-PLANNED streaming over a live lake (the scale-correct
    ``DataSourceStreamReader`` shape — micro-batch rows never pass
    through the driver): snapshot-id offsets; ``partitions(start, end)``
    plans one ``InputPartition`` per delta file of the commits in
    ``(start, end]`` (COMPACT rewrites skipped — the engine incremental
    contract) and executors read the files directly, field-id-remapping
    pre-evolution files exactly like the batch reader.

    PK lakes stream as CHANGELOG rows: ``.option("changelog", "true")``
    appends a ``_row_kind`` column (+I/-U/+U/-D from each file's
    ``_VALUE_KIND``) and plans each commit's CHANGELOG manifests when a
    changelog-producer wrote them (the -U/+U pairs deltas alone cannot
    reconstruct), falling back to the commit's delta kv files —
    exactly ``read_lake_incremental(use_changelog=True)`` semantics,
    micro-batched. Without the option a PK lake stream refuses (a raw
    -D would resurrect the delete downstream)."""

    def __init__(
        self,
        table_path: str,
        changelog: bool = False,
        scan_mode: "Optional[str]" = None,
        scan_snapshot: "Optional[int]" = None,
        scan_timestamp: "Optional[int]" = None,
        consumer_id: "Optional[str]" = None,
    ):
        from paimon_python_spark.paimon_lake import read_paimon_schema

        self.table_path = table_path
        self.changelog = changelog
        self.info = read_paimon_schema(table_path)
        if self.info.primary_keys and not changelog:
            raise RuntimeError(
                "paimon_lake streaming source: PK lakes stream changelogs "
                "— add .option('changelog', 'true') (emits a _row_kind "
                "column), or use stream_lake_snapshots(path, "
                "use_changelog=True)"
            )
        # start position (Paimon's scan.mode / scan.snapshot-id /
        # scan.timestamp-millis): resolved EAGERLY at subscribe time
        # (initialOffset); a restart resumes from the checkpoint and
        # never re-resolves, exactly like the builder's
        # stream_lake_snapshots start modes
        self.scan_mode = scan_mode
        self.scan_snapshot = scan_snapshot
        self.scan_timestamp = scan_timestamp
        # consumer-id (Paimon's in-lake durable progress, spec
        # consumer/consumer-<id>): the registered offset takes
        # PRECEDENCE over scan-start options — real Paimon's contract —
        # and every checkpointed batch writes progress back, so a JVM
        # streaming job can resume where this stream left off (and
        # snapshot expiration protects unconsumed snapshots)
        self.consumer_id = consumer_id
        if consumer_id is not None:
            import re as _re

            from paimon_python_spark.paimon_lake import _CONSUMER_ID_RE

            if not _re.match(_CONSUMER_ID_RE, consumer_id):
                raise ValueError(f"invalid consumer id {consumer_id!r}")
        # scan.mode=latest-full on a PK lake (r12): the first batch
        # plans as MERGED (partition, bucket) GROUP partitions running
        # the batch reader's in-task merge (DV marks applied, +I row
        # kinds), then deltas stream as changelog — the same eligibility
        # gate as the batch DS, so an oversized group refuses toward
        # stream_lake_snapshots(scan_mode='latest-full').

    def _earliest(self) -> int:
        """Earliest snapshot still on disk, or 0 when the lake has no
        commits yet. Inline expiration (snapshot.num-retained.max) can
        trim history, so a fresh stream must not assume snapshot 1
        exists."""
        sdir = os.path.join(self.table_path, "snapshot")
        ids = []
        try:
            names = os.listdir(sdir)
        except FileNotFoundError:
            return 0
        for n in names:
            if n.startswith("snapshot-"):
                try:
                    ids.append(int(n.split("-")[1]))
                except ValueError:
                    continue  # stray non-numeric name must not break
                    # (or silently disable) the expiry guard
        return min(ids) if ids else 0

    def _changelog_ids(self) -> list:
        from paimon_python_spark.paimon_lake import _list_changelog_ids

        return _list_changelog_ids(self.table_path)

    def _resolved_start(self) -> "Optional[dict]":
        """Start-mode resolution (None = the default earliest replay).
        Runs once at subscribe time; restarts resume the checkpoint."""
        import json as _json

        latest = self.latestOffset()["snapshot"]
        if self.scan_mode == "latest":
            # only commits AFTER subscribe stream
            return {"snapshot": latest}
        if self.scan_mode == "latest-full":
            # first batch = the full current state, then deltas (PK
            # lakes bootstrap as merged bucket groups, see partitions)
            if latest:
                return {"snapshot": latest, "bootstrap": latest}
            return {"snapshot": 0}
        if self.scan_snapshot is not None:
            # from-snapshot: streaming starts AT that commit
            return {"snapshot": max(0, int(self.scan_snapshot) - 1)}
        if self.scan_timestamp is not None:
            # from-timestamp: first commit with timeMillis > ts streams
            # first — the offset is the newest commit at-or-before ts
            sdir = os.path.join(self.table_path, "snapshot")
            best = 0
            try:
                names = os.listdir(sdir)
            except FileNotFoundError:
                names = []
            for n in names:
                if not n.startswith("snapshot-"):
                    continue
                try:
                    with open(os.path.join(sdir, n)) as f:
                        s = _json.load(f)
                except (ValueError, OSError):
                    continue
                if (
                    int(s.get("timeMillis") or 0) <= self.scan_timestamp
                    and int(s["id"]) > best
                ):
                    best = int(s["id"])
            if not best:
                # the timestamp predates every surviving snapshot: the
                # complete answer IS the default earliest replay (which
                # bootstraps past trimmed history) — falling through
                # instead of returning offset 0, which the expired-
                # history guard would reject
                return None
            return {"snapshot": best}
        return None

    def commit(self, end: dict) -> None:
        # a CHECKPOINTED batch publishes in-lake consumer progress
        # (JVM-interoperable; expiry protection) — Structured
        # Streaming's own checkpoint stays the source of truth for
        # replay, the consumer file mirrors it for the rest of the
        # ecosystem
        if self.consumer_id is not None and end.get("snapshot", 0) >= 0:
            from paimon_python_spark.paimon_lake import write_lake_consumer

            nxt = int(end["snapshot"]) + 1
            if nxt >= 1:
                write_lake_consumer(self.table_path, self.consumer_id, nxt)

    def initialOffset(self) -> dict:
        if self.consumer_id is not None:
            from paimon_python_spark.paimon_lake import read_lake_consumer

            nxt = read_lake_consumer(self.table_path, self.consumer_id)
            if nxt is not None:
                # registered progress wins over scan-start options
                return {"snapshot": max(0, int(nxt) - 1)}
        start = self._resolved_start()
        if start is not None:
            return start
        earliest = self._earliest()
        if earliest > 1:
            if self.info.primary_keys:
                # CHANGELOG LIFECYCLE DECOUPLING: expired snapshots may
                # survive as changelog/changelog-<id> entries — replay
                # starts at the earliest one (ids missing from the dir
                # carried no changelog, so the replay is complete)
                cl_ids = self._changelog_ids() if self.changelog else []
                if cl_ids and min(cl_ids) < earliest:
                    return {"snapshot": min(cl_ids) - 1}
                # a changelog replay must see every commit's kinds in
                # order; the earliest surviving FULL state interleaves
                # superseded versions with no commit boundary — refuse
                # rather than emit an ambiguous bootstrap batch
                raise RuntimeError(
                    "paimon_lake streaming source: PK changelog stream "
                    f"cannot bootstrap from expired history (earliest "
                    f"surviving snapshot {earliest}); raise snapshot "
                    "retention, set changelog.num-retained.* to decouple "
                    "changelog history, or seed the consumer from a "
                    "batch read"
                )
            # expired history: bootstrap with the earliest surviving
            # snapshot's FULL state (its base manifests still hold every
            # live file from the expired commits), then stream deltas —
            # a delta-only replay from 0 would silently lose those rows
            return {"snapshot": earliest, "bootstrap": earliest}
        return {"snapshot": 0}

    def latestOffset(self) -> dict:
        from paimon_python_spark.paimon_import import latest_paimon_snapshot_id

        try:
            return {"snapshot": latest_paimon_snapshot_id(self.table_path)}
        except FileNotFoundError:
            return {"snapshot": 0}

    def _colmap(self, schema_id: int):
        from paimon_python_spark.paimon_import import field_id_colmap

        return field_id_colmap(self.table_path, self.info, schema_id)

    def partitions(self, start: dict, end: dict):
        from paimon_python_spark.paimon_import import (
            plan_paimon_changelog,
            plan_paimon_delta,
            plan_paimon_files,
            read_paimon_snapshot,
        )

        info = self.info
        part_keys = list(info.partition_keys)
        part_types = [info.spark_schema[k].dataType for k in part_keys]
        default_name = info.options.get("partition.default-name", None)
        fmt = info.options.get("file.format", "parquet")
        parts: List[_LakeGroupPartition] = []
        bootstrap = start.get("bootstrap")
        delta_from = start["snapshot"]
        entries: list = []
        if bootstrap is not None and info.primary_keys:
            # merged full-state bootstrap (latest-full on a PK lake):
            # the BATCH reader's group planner pins the bootstrap
            # snapshot — (partition, bucket) groups, per-file colmaps,
            # DV triples, the bucket-local size guard — and the stream
            # read() delegates each group to its in-task merge, tagging
            # rows +I
            br = PaimonLakeBatchReader(
                self.table_path,
                claim_filters=False,
                snapshot_id=int(bootstrap),
            )
            for p in br.partitions():
                spec2 = json.loads(p.spec)
                if spec2.get("files"):
                    parts.append(
                        _LakeGroupPartition(
                            json.dumps(dict(spec2, bootstrap_full=True))
                        )
                    )
            delta_from = int(bootstrap)
        elif bootstrap is not None:
            # first batch after expired history: the earliest surviving
            # snapshot's FULL live file set, then deltas after it
            entries.extend(
                (e, None)
                for e in plan_paimon_files(self.table_path, int(bootstrap))
            )
            delta_from = int(bootstrap)
        elif start["snapshot"] + 1 < self._earliest():
            # a restarted stream whose checkpoint fell behind the
            # retention window cannot replay the expired deltas — fail
            # loudly instead of silently dropping rows. Exception:
            # decoupled changelog entries still cover the gap.
            cl_ids = self._changelog_ids() if self.changelog else []
            if not cl_ids or start["snapshot"] + 1 < min(cl_ids):
                raise RuntimeError(
                    "paimon_lake streaming source: offset "
                    f"{start['snapshot']} predates the earliest surviving "
                    f"snapshot {self._earliest()} (history expired under "
                    "snapshot.num-retained.max). Restart the stream with "
                    "a fresh checkpoint, or register a consumer / raise "
                    "retention / set changelog.num-retained.* to hold "
                    "replayable history."
                )
        for sid in range(delta_from + 1, end["snapshot"] + 1):
            from paimon_python_spark.paimon_lake import (
                _read_snapshot_or_changelog,
            )

            try:
                snap, from_cl_dir = _read_snapshot_or_changelog(
                    self.table_path, sid
                )
            except FileNotFoundError:
                if self.changelog:
                    # an expired id with no decoupled entry inside a
                    # covered range carried no changelog — nothing to
                    # replay for it
                    continue
                raise
            cl = (
                plan_paimon_changelog(self.table_path, sid, snap=snap)
                if self.changelog
                else []
            )
            if from_cl_dir or str(
                snap.get("commitKind", "APPEND")
            ).upper() == "COMPACT":
                # decoupled entries replay their changelog only (delta
                # manifests died with the snapshot); a COMPACT rewrite
                # carries no new rows — EXCEPT its changelog manifests
                # under full-compaction producers, which are exactly
                # what a changelog consumer wants
                entries.extend((e, sid) for e in cl)
                continue
            entries.extend(
                (e, sid)
                for e in (cl if cl else plan_paimon_delta(self.table_path, sid))
            )
        kv = bool(info.primary_keys)
        for e, _sid in entries:
            kw = {"default_name": default_name} if default_name else {}
            path = os.path.join(
                self.table_path, e.rel_path(part_keys, part_types, **kw)
            )
            parts.append(
                _LakeGroupPartition(
                    json.dumps(
                        {
                            "fmt": fmt,
                            "path": path,
                            "kv": kv,
                            "colmap": self._colmap(e.schema_id),
                            "partition": _json_safe_part(info, e.partition),
                        }
                    )
                )
            )
        # Spark requires ≥1 partition per batch even when every commit
        # in the range was a COMPACT rewrite (no new rows)
        return parts or [
            _LakeGroupPartition(json.dumps({"fmt": fmt, "path": None}))
        ]

    def read(self, partition: _LakeGroupPartition):
        spec = json.loads(partition.spec)
        if spec.get("bootstrap_full"):
            # latest-full PK bootstrap group: the batch reader's
            # executor-local merge (engine dispatch, DV drops, schema
            # evolution) produces the merged state; every row is an
            # insert in changelog terms
            br = PaimonLakeBatchReader(self.table_path, claim_filters=False)
            names = [f.name for f in self.info.spark_schema.fields]
            for b in br.read(partition):
                for row in b.to_pylist():
                    yield tuple(row[n] for n in names) + ("+I",)
            return
        if not spec["path"]:
            return
        info = self.info
        part_keys = list(info.partition_keys)
        names = [f.name for f in info.spark_schema.fields]
        value_names = [n for n in names if n not in part_keys]
        colmap = spec.get("colmap")
        if colmap:
            src_cols = [colmap[c] for c in value_names if colmap.get(c)]
        else:
            src_cols = list(value_names)
        kv = bool(spec.get("kv")) and self.changelog
        if kv:
            src_cols = src_cols + ["_VALUE_KIND"]
        tbl = _read_one(spec["path"], spec["fmt"], src_cols)
        cols = {}
        for n in names:
            if n in part_keys:
                cols[n] = [
                    _part_value(info, n, spec["partition"].get(n))
                ] * tbl.num_rows
            else:
                src = colmap.get(n) if colmap else n
                cols[n] = (
                    tbl.column(src).to_pylist()
                    if src and src in tbl.column_names
                    else [None] * tbl.num_rows
                )
        out = [cols[n] for n in names]
        if self.changelog:
            kind_names = {0: "+I", 1: "-U", 2: "+U", 3: "-D"}
            kinds = (
                [
                    kind_names.get(int(k), "+I")
                    for k in tbl.column("_VALUE_KIND").to_pylist()
                ]
                if kv and "_VALUE_KIND" in tbl.column_names
                else ["+I"] * tbl.num_rows
            )
            out = out + [kinds]
        yield from zip(*out)




def _read_one(path: str, fmt: str, cols):
    if fmt == "orc":
        import pyarrow.orc as po

        f = po.ORCFile(path)
        return f.read(columns=[c for c in cols if c in f.schema.names])
    if fmt == "avro":
        import pyarrow as pa

        from paimon_python_spark.avro_codec import read_avro_table

        with open(path, "rb") as fh:
            names, rows = read_avro_table(fh.read())
        keep = [c for c in cols if c in names]
        idx = {c: names.index(c) for c in keep}
        return pa.table({c: [r[idx[c]] for r in rows] for c in keep})
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    return pf.read(columns=[c for c in cols if c in pf.schema_arrow.names])


class _LakeWrittenFiles(WriterCommitMessage):
    def __init__(self, files, new_hashes=None):
        #: [(relative path, {partition key: logical value}, row count)]
        self.files = files
        #: dynamic-bucket only: {(part_json, bucket): [new key hashcodes]}
        #: — the commit unions them into the buckets' HASH index files
        self.new_hashes = new_hashes


class PaimonLakeBatchWriter(DataSourceWriter):
    """``df.write.format("paimon_lake")`` — the engine as a lake
    participant through the Spark-native front door: APPEND lakes and
    fixed-bucket PRIMARY-KEY lakes, ``mode("append")`` and
    ``mode("overwrite")`` (whole-table INSERT OVERWRITE, like
    overwrite_lake).

    Executor side (``write``): each task groups its rows by partition
    values (PK lakes additionally by ``abs(murmur(BinaryRow(bucket
    key))) % num_buckets`` — the same FixedBucketRowKeyExtractor
    routing write_lake_pk_append uses) and writes one spec-named data
    file per group directly into the lake's ``<k>=<v>/bucket-<b>/``
    layout. PK groups write key-value files: ``_KEY_*`` columns, a
    fresh ``_SEQUENCE_NUMBER`` range past every live file's max
    (``sequence.field`` honored when declared), sorted by trimmed key —
    plus per-file value stats and the table's configured bloom file
    index, so front-door files prune exactly like builder-written ones.
    Driver side (``commit``): only when every task succeeded, one spec
    snapshot commits atomically (OVERWRITE commits DELETE entries for
    every previously-visible file and drop the DV index, exactly like
    overwrite_lake); ``abort`` removes the orphan files — readers only
    ever see committed snapshots either way.

    DYNAMIC-BUCKET lakes (``'bucket' = '-1'``) write through this door
    too (r12): existing keys route against a size-capped plan-time copy
    of the spec HASH index, new keys assign deterministically by
    ``|hash| % dynamic-bucket.initial-buckets`` (unshuffled tasks agree
    without coordination), and the commit unions the new hashcodes into
    the touched buckets' index files (overwrite rebuilds the index from
    the new data). avro/orc lakes write through the engine codecs with
    in-task value stats.

    Refusals (with pointers, not half-support): cross-partition PK
    lakes (the retraction protocol is a driver-side DataFrame concern —
    write_lake_pk_append / overwrite_lake), changelog-producing PK
    appends (same pointer), and dynamic lakes whose HASH index exceeds
    the serialized-copy cap.

    Scale note: each task writes one file per (partition, bucket) it
    SEES — a wide unpartitioned input can emit tasks×groups small
    level-0 files per commit. Pre-``df.repartition(partition cols)``
    to bound file counts, or use ``write_lake_pk_append``, whose
    routing shuffle lands exactly one file per group."""

    def __init__(self, table_path: str, overwrite: bool):
        from paimon_python_spark.paimon_import import plan_paimon_files
        from paimon_python_spark.paimon_lake import read_paimon_schema

        self.table_path = table_path
        self.info = read_paimon_schema(table_path)
        self.overwrite = overwrite
        info = self.info
        self.is_pk = bool(info.primary_keys)
        fmt = info.options.get("file.format", "parquet")
        if fmt not in ("parquet", "orc", "avro"):
            raise RuntimeError(
                f"paimon_lake writer: file.format={fmt!r} is not a "
                "spec data-file format (parquet/orc/avro)"
            )
        self.fmt = fmt
        self.num_buckets = 1
        self.bucket_cols = None
        self.dynamic = False
        if self.is_pk:
            self.num_buckets = int(info.options.get("bucket", "-1"))
            if self.num_buckets < 1:
                # DYNAMIC BUCKET ('bucket' = '-1'): tasks route existing
                # keys against a plan-time copy of the spec HASH index
                # (size-capped — beyond it the distributed-join routing
                # of write_lake_pk_append is the right tool); NEW keys
                # assign deterministically by |hash| % initial-buckets,
                # so unshuffled tasks seeing the same key agree without
                # coordination; commit unions the new hashcodes into the
                # touched buckets' index files. CROSS-PARTITION updates
                # (PK ⊉ partition keys) still refuse: their retraction
                # protocol is a driver-side DataFrame concern.
                if bool(info.partition_keys) and not (
                    set(info.partition_keys) <= set(info.primary_keys)
                ):
                    raise ValueError(
                        "paimon_lake writer: CROSS-PARTITION update lakes "
                        "need the retraction-emitting router — use "
                        "write_lake_pk_append() / overwrite_lake()"
                    )
                self.dynamic = True
                self._load_dyn_index()
            producer = info.options.get("changelog-producer", "none")
            if producer != "none" and not overwrite:
                raise ValueError(
                    f"paimon_lake writer: changelog-producer={producer!r} "
                    "PK appends derive changelog at commit time — use "
                    "write_lake_pk_append()"
                )
            self.bucket_cols = [
                c.strip()
                for c in info.options.get("bucket-key", "").split(",")
                if c.strip()
            ] or None
        # plan-time (driver-side) state carried to tasks/commit — only
        # the modes that need it pay the manifest plan (a plain append
        # uses neither the sequence base nor the before-set)
        self.seq_base = 0
        self.before = None
        if self.is_pk or overwrite:
            before = plan_paimon_files(table_path)
            self.seq_base = (
                max((e.max_seq for e in before), default=-1) + 1
            )
            if overwrite:
                #: overwrite replaces the WHOLE visible table — DELETE
                #: entries for every file live at plan time (same race
                #: window as overwrite_lake, which plans at call time)
                self.before = [
                    {
                        "partition": dict(e.partition),
                        "bucket": e.bucket,
                        "file_name": e.file_name,
                        "file_size": e.file_size,
                        "row_count": e.row_count,
                        "schema_id": e.schema_id,
                        "max_seq": e.max_seq,
                        "level": e.level,
                    }
                    for e in before
                ]

    def _load_dyn_index(self) -> None:
        """Driver-side snapshot of the lake's HASH index for executor
        routing: per partition, hash-sorted (hashcodes, buckets) arrays
        packed as bytes (compact to serialize into tasks), plus the old
        index file name per (partition, bucket) for the commit-time
        union. Size-capped: a serialized copy rides to every task, so
        beyond the limit the front door refuses toward the builder's
        distributed-join routing."""
        import numpy as np

        from paimon_python_spark.dynamic_bucket import (
            _part_json_of,
            read_hash_index_file,
        )
        from paimon_python_spark.paimon_import import (
            decode_binary_row,
            plan_paimon_hash_index,
        )

        info = self.info
        part_keys = list(info.partition_keys)
        part_types = [info.spark_schema[k].dataType for k in part_keys]
        entries = plan_paimon_hash_index(self.table_path)
        limit = int(
            info.options.get(
                "dynamic-bucket.frontdoor-index-limit-bytes", str(32 << 20)
            )
        )
        total = sum(int(e.get("_FILE_SIZE") or 0) for e in entries)
        if total > limit:
            raise RuntimeError(
                f"paimon_lake writer: dynamic-bucket HASH index is "
                f"{total} bytes (limit {limit}) — front-door tasks route "
                f"against a serialized copy; use write_lake_pk_append() "
                f"(distributed-join routing) or raise "
                f"'dynamic-bucket.frontdoor-index-limit-bytes'"
            )
        per: dict = {}
        self._dyn_old_files: dict = {}
        for e in entries:
            pvals_list = (
                decode_binary_row(bytes(e["_PARTITION"]), part_types)
                if part_keys
                else []
            )
            pj = _part_json_of(dict(zip(part_keys, pvals_list)), part_keys)
            b = int(e["_BUCKET"])
            h = read_hash_index_file(
                os.path.join(self.table_path, "index", e["_FILE_NAME"])
            )
            per.setdefault(pj, []).append((h, b))
            self._dyn_old_files[(pj, b)] = e["_FILE_NAME"]
        packed: dict = {}
        for pj, pairs in per.items():
            hs = np.concatenate([p[0] for p in pairs])
            bs = np.concatenate(
                [np.full(len(p[0]), p[1], dtype=np.int32) for p in pairs]
            )
            order = np.argsort(hs, kind="stable")
            hs, bs = hs[order], bs[order]
            keep = np.ones(len(hs), dtype=bool)
            keep[1:] = hs[1:] != hs[:-1]
            hs, bs = hs[keep], bs[keep]
            packed[pj] = (hs.tobytes(), bs.tobytes())
        self._dyn_index = packed
        # deterministic modulus for NEW keys: any consistent choice is
        # valid (the index records it); initial-buckets/assigner-
        # parallelism sizes the spread, the builder's capacity planner
        # grows buckets on its own writes
        init = (
            info.options.get("dynamic-bucket.initial-buckets")
            or info.options.get("dynamic-bucket.assigner-parallelism")
            or "1"
        )
        self._dyn_mod = max(1, int(init))

    def _write_pk(self, iterator) -> _LakeWrittenFiles:
        """Executor-side PK task write: route rows to (partition,
        bucket) with the writer's murmur hash, one sorted level-0
        key-value file per group (mirrors the shape
        paimon_lake._distributed_lake_write's task writes). Parallel
        tasks share the plan-time sequence base — same-key collisions
        across tasks tie-break by file order at read, exactly like real
        Paimon's per-writer sequence generators."""
        import datetime
        import os
        import uuid

        import pandas as pd
        import pyarrow as pa

        from paimon_python_spark.paimon_import import (
            DEFAULT_PARTITION_NAME,
            _value_stats_for,
            _write_fixture_data_file,
            encode_binary_row,
            format_partition_segment,
        )
        from paimon_python_spark.paimon_lake import (
            _bloom_option_cols,
            _embedded_index_payload,
            _make_lake_bucket_fn,
            _split_standalone_index,
        )
        from paimon_python_spark.types import spark_type_to_pa

        info = self.info
        part_keys = list(info.partition_keys)
        part_types = [info.spark_schema[k].dataType for k in part_keys]
        trimmed = [k for k in info.primary_keys if k not in part_keys]
        trimmed_types = [info.spark_schema[k].dataType for k in trimmed]
        names = [f.name for f in info.spark_schema.fields]
        default_name = info.options.get(
            "partition.default-name", DEFAULT_PARTITION_NAME
        )
        seq_field = info.options.get("sequence.field") or None
        (
            bloom_cols,
            bloom_spec,
            bloom_dtypes,
            bitmap_cols,
            bitmap_kinds,
            bsi_cols,
            bsi_kinds,
        ) = _bloom_option_cols(info)
        from paimon_python_spark.paimon_lake import _target_file_size

        target_bytes = _target_file_size(info)
        rows = [tuple(row[n] for n in names) for row in iterator]
        if not rows:
            return _LakeWrittenFiles([])
        pdf = pd.DataFrame(rows, columns=names)
        bcols = list(self.bucket_cols or trimmed)
        key_types = [info.spark_schema[c].dataType for c in bcols]
        # typed key series (object-dtype columns from row tuples would
        # push the router onto its per-row scalar fallback)
        typed_keys = [
            pa.array(
                pdf[c], type=spark_type_to_pa(info.spark_schema[c].dataType)
            ).to_pandas()
            for c in bcols
        ]
        if not self.dynamic:
            bfn = _make_lake_bucket_fn(key_types, self.num_buckets)
            buckets = bfn(*typed_keys).tolist()

        epoch = datetime.date(1970, 1, 1)

        def logical(v, dt):
            if v is None or (not isinstance(v, (bytes, str)) and pd.isna(v)):
                return None
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(dt, T.DateType):
                if isinstance(v, datetime.datetime):
                    v = v.date()
                if isinstance(v, datetime.date):
                    return (v - epoch).days
            return v

        part_cols = [pdf[k].tolist() for k in part_keys]
        new_by_group: dict = {}
        if self.dynamic:
            # route against the plan-time HASH index snapshot: existing
            # hashcodes keep their bucket (binary search per partition);
            # new ones assign |hash| % initial-buckets — deterministic,
            # so unshuffled tasks seeing the same key always agree
            import json as _json

            import numpy as np

            from paimon_python_spark.dynamic_bucket import (
                _make_key_hash_fn,
            )

            hashes = (
                _make_key_hash_fn(key_types)(*typed_keys)
                .to_numpy()
                .astype(np.int32)
            )
            pjs = np.array(
                [
                    _json.dumps(
                        {
                            k: logical(c[i], t)
                            for k, c, t in zip(part_keys, part_cols, part_types)
                        }
                    )
                    for i in range(len(pdf))
                ],
                dtype=object,
            )
            buckets = np.empty(len(pdf), dtype=np.int64)
            for pj in set(pjs.tolist()):
                mask = pjs == pj
                hs = hashes[mask]
                hb, bb = self._dyn_index.get(pj, (b"", b""))
                sorted_h = np.frombuffer(hb, dtype=np.int32)
                bucket_of = np.frombuffer(bb, dtype=np.int32)
                if len(sorted_h):
                    pos = np.searchsorted(sorted_h, hs).clip(
                        0, len(sorted_h) - 1
                    )
                    found = sorted_h[pos] == hs
                    assigned = np.where(
                        found,
                        bucket_of[pos],
                        np.abs(hs.astype(np.int64)) % self._dyn_mod,
                    )
                else:
                    found = np.zeros(len(hs), dtype=bool)
                    assigned = np.abs(hs.astype(np.int64)) % self._dyn_mod
                buckets[mask] = assigned
                # append: record NEW hashcodes for the commit's index
                # union; overwrite: record EVERY hashcode — the commit
                # rebuilds the index from scratch (old keys are gone)
                rec = (
                    np.ones(len(hs), dtype=bool) if self.overwrite else ~found
                )
                for b in np.unique(assigned[rec]):
                    grp = new_by_group.setdefault((pj, int(b)), set())
                    grp.update(
                        int(x)
                        for x in np.unique(hs[rec][assigned[rec] == b])
                    )
            buckets = buckets.tolist()
        groups: dict = {}
        for i in range(len(pdf)):
            key = (
                tuple(
                    logical(c[i], t) for c, t in zip(part_cols, part_types)
                ),
                int(buckets[i]),
            )
            groups.setdefault(key, []).append(i)
        written = []
        for (pvals_t, bucket), idxs in groups.items():
            # ascending row indices preserve arrival order; the stable
            # sort then sequences same-key rows in arrival order
            sub = pdf.iloc[idxs]
            if trimmed:
                sub = sub.sort_values(trimmed, kind="mergesort")
            sub = sub.reset_index(drop=True)
            n = len(sub)
            arrays = {}
            for k, t in zip(trimmed, trimmed_types):
                arrays[f"_KEY_{k}"] = pa.array(sub[k], type=spark_type_to_pa(t))
            if seq_field is not None:
                sv = sub[seq_field]
                if len(sv) and isinstance(
                    sv.iloc[0], (datetime.datetime, pd.Timestamp)
                ):
                    seqs = [int(pd.Timestamp(x).value // 1_000_000) for x in sv]
                else:
                    seqs = [int(x) for x in sv]
            else:
                seqs = list(range(self.seq_base, self.seq_base + n))
            arrays["_SEQUENCE_NUMBER"] = pa.array(seqs, pa.int64())
            # rowkind.field: kinds come from the USER column (the
            # builder's contract) — all +I otherwise
            rk_field = info.options.get("rowkind.field")
            if rk_field:
                from paimon_python_spark.datasource import _decode_rowkind

                if rk_field not in sub.columns:
                    raise ValueError(
                        f"rowkind.field {rk_field!r} is not a table column"
                    )
                kinds = [_decode_rowkind(v) for v in sub[rk_field]]
            else:
                kinds = [0] * n
            arrays["_VALUE_KIND"] = pa.array(kinds, pa.int32())
            for f in info.spark_schema.fields:
                arrays[f.name] = pa.array(
                    sub[f.name], type=spark_type_to_pa(f.dataType)
                )
            table = pa.table(arrays)
            pvals = dict(zip(part_keys, pvals_t))
            rel_parts = [
                f"{k}={format_partition_segment(pvals[k], dt, default_name)}"
                for k, dt in zip(part_keys, part_types)
            ]
            ddir = os.path.join(self.table_path, *rel_parts, f"bucket-{bucket}")
            os.makedirs(ddir, exist_ok=True)
            # target-file-size rolling, same rule as the group writer:
            # sorted chunks keep per-file key ranges disjoint
            n_files = 1
            if n > 1 and target_bytes and table.nbytes > target_bytes:
                n_files = min(n, -(-table.nbytes // target_bytes))
            rows_per = -(-n // n_files)
            for ci in range(n_files):
                lo = ci * rows_per
                hi = min(n, lo + rows_per)
                if lo >= hi:
                    continue
                sub_tbl = table.slice(lo, hi - lo)
                sub_pdf = sub.iloc[lo:hi]
                sub_seqs = seqs[lo:hi]
                name = f"data-{uuid.uuid4()}-{ci}.{self.fmt}"
                fpath = os.path.join(ddir, name)
                _write_fixture_data_file(sub_tbl, fpath, self.fmt)
                kmin = encode_binary_row(
                    [
                        logical(sub_pdf[k].iloc[0], t)
                        for k, t in zip(trimmed, trimmed_types)
                    ],
                    trimmed_types,
                )
                kmax = encode_binary_row(
                    [
                        logical(sub_pdf[k].iloc[-1], t)
                        for k, t in zip(trimmed, trimmed_types)
                    ],
                    trimmed_types,
                )
                stats = _value_stats_for(sub_tbl, info)
                emb = _embedded_index_payload(
                    sub_pdf,
                    bloom_cols,
                    bloom_spec,
                    bloom_dtypes,
                    bitmap_cols,
                    bitmap_kinds,
                    bsi_cols,
                    bsi_kinds,
                )
                emb, extra = _split_standalone_index(emb, info, ddir, name)
                written.append(
                    {
                        "rel": os.path.join(
                            *rel_parts, f"bucket-{bucket}", name
                        )
                        if rel_parts
                        else os.path.join(f"bucket-{bucket}", name),
                        "pvals": pvals,
                        "bucket": bucket,
                        "rows": hi - lo,
                        "size": os.path.getsize(fpath),
                        "min_seq": min(sub_seqs) if sub_seqs else self.seq_base,
                        "max_seq": max(sub_seqs) if sub_seqs else self.seq_base,
                        "min_key": kmin,
                        "max_key": kmax,
                        "stats": stats,
                        "emb": emb,
                        "extra": extra,
                    }
                )
        return _LakeWrittenFiles(
            written,
            new_hashes=(
                {k: sorted(v) for k, v in new_by_group.items()}
                if new_by_group
                else None
            ),
        )

    def write(self, iterator) -> _LakeWrittenFiles:
        if self.is_pk:
            return self._write_pk(iterator)
        import datetime
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from paimon_python_spark.paimon_import import (
            DEFAULT_PARTITION_NAME,
            format_partition_segment,
        )
        from paimon_python_spark.types import spark_schema_to_pa

        info = self.info
        part_keys = list(info.partition_keys)
        part_types = [info.spark_schema[k].dataType for k in part_keys]
        default_name = info.options.get(
            "partition.default-name", DEFAULT_PARTITION_NAME
        )
        value_fields = [
            f for f in info.spark_schema.fields if f.name not in part_keys
        ]
        pa_schema = spark_schema_to_pa(T.StructType(value_fields))

        def logical(v, dt):
            # on-disk logical form: DATE → epoch days (BinaryRow + dirs)
            if v is not None and isinstance(dt, T.DateType):
                if isinstance(v, datetime.datetime):
                    v = v.date()
                return (v - datetime.date(1970, 1, 1)).days
            return v

        groups: dict = {}
        for row in iterator:
            key = tuple(
                logical(row[k], dt) for k, dt in zip(part_keys, part_types)
            )
            groups.setdefault(key, []).append(
                tuple(row[f.name] for f in value_fields)
            )
        written = []
        for key, rows in groups.items():
            rel_parts = [
                f"{k}={format_partition_segment(v, dt, default_name)}"
                for k, v, dt in zip(part_keys, key, part_types)
            ]
            ddir = os.path.join(self.table_path, *rel_parts, "bucket-0")
            os.makedirs(ddir, exist_ok=True)
            name = f"data-{uuid.uuid4()}-0.{self.fmt}"
            cols = list(zip(*rows)) if rows else [[] for _ in value_fields]
            table = pa.Table.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, pa_schema)],
                schema=pa_schema,
            )
            from paimon_python_spark.paimon_import import (
                _value_stats_for,
                _write_fixture_data_file,
            )

            _write_fixture_data_file(table, os.path.join(ddir, name), self.fmt)
            # avro/orc carry no usable footer-at-commit path: compute
            # value stats in-task over the batch (parquet keeps its
            # zero-extra-IO footer fold at commit time)
            stats = (
                _value_stats_for(table, info) if self.fmt != "parquet" else None
            )
            emb, extra = None, None
            if rows:
                # honor the table's declared file indexes (bloom/bitmap
                # /bsi columns) — front-door files must prune like
                # builder-written ones
                from paimon_python_spark.paimon_lake import (
                    _bloom_option_cols,
                    _embedded_index_payload,
                    _split_standalone_index,
                )

                opts = _bloom_option_cols(info)
                if opts[0] or opts[3] or opts[5]:
                    emb = _embedded_index_payload(
                        table.to_pandas(), *opts
                    )
                    emb, extra = _split_standalone_index(
                        emb, info, ddir, name
                    )
            written.append(
                (
                    os.path.join(*rel_parts, "bucket-0", name)
                    if rel_parts
                    else os.path.join("bucket-0", name),
                    dict(zip(part_keys, key)),
                    len(rows),
                    emb,
                    extra,
                    stats,
                )
            )
        return _LakeWrittenFiles(written)

    def commit(self, messages) -> None:
        import pyarrow.parquet as pq

        from paimon_python_spark.paimon_import import (
            _spec_file_meta,
            encode_binary_row,
        )
        from paimon_python_spark.paimon_lake import (
            _commit_lake_snapshot,
            _parquet_footer_value_stats,
        )

        info = self.info
        part_keys = list(info.partition_keys)
        part_types = [info.spark_schema[k].dataType for k in part_keys]
        entries = []
        n_rows = 0
        dyn_new: dict = {}
        for m in messages:
            if m is None:
                continue
            if getattr(m, "new_hashes", None):
                for k, hs in m.new_hashes.items():
                    dyn_new.setdefault(tuple(k), set()).update(hs)
            for f in m.files:
                if self.is_pk:
                    if f["rows"] == 0:
                        continue
                    entries.append(
                        {
                            "_VERSION": 2,
                            "_KIND": 0,
                            "_PARTITION": encode_binary_row(
                                [f["pvals"][k] for k in part_keys], part_types
                            ),
                            "_BUCKET": int(f["bucket"]),
                            "_TOTAL_BUCKETS": self.num_buckets,
                            "_FILE": _spec_file_meta(
                                os.path.basename(f["rel"]),
                                int(f["size"]),
                                int(f["rows"]),
                                schema_id=info.id,
                                value_stats=f["stats"],
                                min_key=f["min_key"],
                                max_key=f["max_key"],
                                min_seq=int(f["min_seq"]),
                                max_seq=int(f["max_seq"]),
                                level=0,
                                embedded_index=f["emb"],
                                extra_files=(
                                    [f["extra"]] if f.get("extra") else None
                                ),
                            ),
                        }
                    )
                    n_rows += int(f["rows"])
                    continue
                rel, pvals, rows, emb, extra, stats = f
                if rows == 0:
                    continue
                dest = os.path.join(self.table_path, rel)
                if stats is None and rel.endswith(".parquet"):
                    md = pq.ParquetFile(dest).metadata
                    stats = _parquet_footer_value_stats(md, info)
                entries.append(
                    {
                        "_VERSION": 2,
                        "_KIND": 0,
                        "_PARTITION": encode_binary_row(
                            [pvals[k] for k in part_keys], part_types
                        ),
                        "_BUCKET": 0,
                        "_TOTAL_BUCKETS": 1,
                        "_FILE": _spec_file_meta(
                            os.path.basename(rel),
                            os.path.getsize(dest),
                            rows,
                            schema_id=info.id,
                            value_stats=stats,
                            embedded_index=emb,
                            extra_files=[extra] if extra else None,
                        ),
                    }
                )
                n_rows += rows
        if self.overwrite:
            # whole-table INSERT OVERWRITE (overwrite_lake semantics):
            # DELETE every file visible at plan time, drop the DV index
            # (nothing it marked survives), explicit new total — even an
            # empty df commits (it replaces the table with nothing)
            delete_entries = [
                {
                    "_VERSION": 2,
                    "_KIND": 1,
                    "_PARTITION": encode_binary_row(
                        [e["partition"][k] for k in part_keys], part_types
                    ),
                    "_BUCKET": e["bucket"],
                    "_TOTAL_BUCKETS": int(info.options.get("bucket", "1")),
                    "_FILE": _spec_file_meta(
                        e["file_name"],
                        e["file_size"],
                        e["row_count"],
                        schema_id=e["schema_id"],
                        max_seq=e["max_seq"],
                        level=e["level"],
                    ),
                }
                for e in self.before
            ]
            overwrite_index = None
            if self.dynamic and dyn_new:
                # dynamic overwrite REBUILDS the HASH index from the new
                # data alone — dropping it would let a later write
                # re-assign an existing key to a different bucket
                # (key split across buckets = wrong merge); carrying the
                # old entries would resurrect deleted keys' assignments
                import json as _json
                import uuid as _uuid

                import numpy as np

                from paimon_python_spark.dynamic_bucket import (
                    pending_to_entries,
                    write_hash_index_file,
                    write_index_manifest,
                )

                os.makedirs(
                    os.path.join(self.table_path, "index"), exist_ok=True
                )
                pending = []
                for (pj, bucket), hs in sorted(dyn_new.items()):
                    merged = np.array(sorted(hs), dtype=np.int32)
                    idx_file = f"index-{_uuid.uuid4().hex}-0"
                    size = write_hash_index_file(
                        os.path.join(self.table_path, "index", idx_file),
                        merged,
                    )
                    pvals = _json.loads(pj)
                    pending.append(
                        {
                            "part_json": pj,
                            "part_values": [pvals[k] for k in part_keys],
                            "bucket": int(bucket),
                            "file": idx_file,
                            "size": size,
                            "rows": len(merged),
                        }
                    )
                fresh, _replaced = pending_to_entries(info, pending)
                overwrite_index = write_index_manifest(
                    self.table_path, fresh
                )
            _commit_lake_snapshot(
                self.table_path,
                info,
                delete_entries + entries,
                n_rows,
                commit_kind="OVERWRITE",
                index_manifest=overwrite_index,
                total_record_count=n_rows,
            )
            return
        if not entries:
            return  # empty append is a successful no-op, like every
            # standard Spark sink (parquet/JDBC) — no snapshot commits
        from paimon_python_spark.paimon_lake import _INHERIT_INDEX

        index_manifest = _INHERIT_INDEX
        if self.dynamic and dyn_new:
            # union each touched bucket's NEW key hashcodes into a fresh
            # index file; the merged index manifest carries every other
            # entry (DVs included) forward verbatim
            import json as _json
            import uuid as _uuid

            import numpy as np

            from paimon_python_spark.dynamic_bucket import (
                read_hash_index_file,
                write_hash_index_file,
                write_merged_index_manifest,
            )

            os.makedirs(
                os.path.join(self.table_path, "index"), exist_ok=True
            )
            pending = []
            for (pj, bucket), hs in sorted(dyn_new.items()):
                new = np.array(sorted(hs), dtype=np.int32)
                old_name = self._dyn_old_files.get((pj, bucket))
                if old_name is not None:
                    old = read_hash_index_file(
                        os.path.join(self.table_path, "index", old_name)
                    )
                    merged = np.concatenate([old, np.setdiff1d(new, old)])
                else:
                    merged = new
                idx_file = f"index-{_uuid.uuid4().hex}-0"
                size = write_hash_index_file(
                    os.path.join(self.table_path, "index", idx_file), merged
                )
                pvals = _json.loads(pj)
                pending.append(
                    {
                        "part_json": pj,
                        "part_values": [pvals[k] for k in part_keys],
                        "bucket": int(bucket),
                        "file": idx_file,
                        "size": size,
                        "rows": len(merged),
                    }
                )
            name = write_merged_index_manifest(
                self.table_path, info, pending
            )
            if name is not None:
                index_manifest = name
        _commit_lake_snapshot(
            self.table_path,
            info,
            entries,
            n_rows,
            index_manifest=index_manifest,
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                rel = f["rel"] if self.is_pk else f[0]
                p = os.path.join(self.table_path, rel)
                if os.path.exists(p):
                    os.remove(p)
                extra = f.get("extra") if self.is_pk else f[4]
                if extra:
                    xp = os.path.join(os.path.dirname(p), extra)
                    if os.path.exists(xp):
                        os.remove(xp)


class PaimonLakeSystemReader(DataSourceReader):
    """Reader for ``.load("<lake dir>$<system table>")`` — Paimon's
    system-table suffix through the Spark-native front door. The rows
    are the SAME pure metadata walk the builder methods wrap
    (lake_system_table_data); metadata-sized, one partition."""

    def __init__(self, table_path: str, name: str, snapshot_id=None):
        self.table_path = table_path
        self.sys_name = name
        self.snapshot_id = snapshot_id

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition) -> Iterator:
        from paimon_python_spark.paimon_lake import lake_system_table_data

        _, rows = lake_system_table_data(
            self.table_path, self.sys_name, self.snapshot_id
        )
        yield from rows


class PaimonLakeIncrementalReader(DataSourceReader):
    """Batch ``incremental-between`` reads (Paimon's incremental query:
    rows of the commits in ``(start, end]``) — reuses the STREAMING
    reader's per-delta-file partition planning and executor read
    verbatim, so batch windows and micro-batches are the same code
    path. PK lakes need ``.option("changelog", "true")`` (rows carry
    ``_row_kind``), exactly like the stream."""

    def __init__(
        self, table_path: str, start_id: int, end_id: int, changelog: bool
    ):
        self._sr = PaimonLakeStreamReader(table_path, changelog=changelog)
        self.start_id = int(start_id)
        self.end_id = int(end_id)

    def partitions(self):
        return self._sr.partitions(
            {"snapshot": self.start_id}, {"snapshot": self.end_id}
        )

    def read(self, partition) -> Iterator:
        return self._sr.read(partition)


def _resolve_inc_bound(table_path: str, token: str) -> int:
    """A bound of ``incremental-between``: a snapshot id, or a TAG name
    (Paimon accepts both)."""
    token = token.strip()
    if token.lstrip("-").isdigit():
        return int(token)
    from paimon_python_spark.paimon_import import read_paimon_tag

    return int(read_paimon_tag(table_path, token)["id"])


class PaimonLakeDataSource(DataSource):
    """``spark.dataSource.register(PaimonLakeDataSource)`` then
    ``spark.read.format("paimon_lake").option("path", lake_dir)``.
    A ``$<name>`` path suffix serves the system tables
    (``.load(f"{lake_dir}$snapshots")`` etc.), like Paimon's own Spark
    connector."""

    @classmethod
    def name(cls) -> str:
        return "paimon_lake"

    def _split_path(self):
        from paimon_python_spark.datasource import _split_ds_path

        return _split_ds_path(self.options, "paimon_lake")

    def _table_path(self) -> str:
        return self._split_path()[0]

    def _changelog(self) -> bool:
        return self.options.get("changelog", "false").lower() == "true"

    def _time_travel(self):
        """snapshot-id / tag / timestamp-millis batch read options
        (at most one) — shared parser, see datasource._parse_time_travel."""
        from paimon_python_spark.datasource import _parse_time_travel

        return _parse_time_travel(self.options, "paimon_lake")

    def schema(self):
        from paimon_python_spark.paimon_lake import read_paimon_schema

        path, sys_name = self._split_path()
        if sys_name == "audit_log":
            return T.StructType(
                [T.StructField("rowkind", T.StringType(), False)]
                + list(read_paimon_schema(path).spark_schema.fields)
            )
        if sys_name is not None:
            from paimon_python_spark.paimon_lake import (
                lake_system_table_schema,
            )

            # O(1): schema() must not walk manifests (the rows walk
            # runs once, in the reader)
            return lake_system_table_schema(sys_name)
        spark_schema = read_paimon_schema(path).spark_schema
        if self._changelog():
            # streaming changelog mode: rows carry their RowKind
            return T.StructType(
                list(spark_schema.fields)
                + [T.StructField("_row_kind", T.StringType(), False)]
            )
        return spark_schema

    def reader(self, schema: T.StructType):
        path, sys_name = self._split_path()
        inc = self.options.get("incremental-between")
        if inc is not None:
            # batch incremental query (Paimon's incremental-between):
            # '3,7' or 'tagA,tagB' — rows of the commits in (start, end]
            if sys_name is not None or any(
                v is not None for v in self._time_travel()
            ):
                raise ValueError(
                    "paimon_lake: incremental-between does not combine "
                    "with system tables or time-travel options"
                )
            lo, _, hi = inc.partition(",")
            if not hi:
                raise ValueError(
                    "incremental-between takes 'start,end' (snapshot ids "
                    "or tag names)"
                )
            return PaimonLakeIncrementalReader(
                path,
                _resolve_inc_bound(path, lo),
                _resolve_inc_bound(path, hi),
                changelog=self._changelog(),
            )
        if self._changelog():
            raise ValueError(
                "paimon_lake: option('changelog') applies to readStream "
                "and incremental-between batch reads"
            )
        sid, tag, ts = self._time_travel()
        if sys_name == "audit_log":
            # data-scale: planned like a normal read (one partition per
            # bucket group), merge-free with a leading rowkind column
            return PaimonLakeBatchReader(
                path,
                snapshot_id=sid,
                tag=tag,
                timestamp_millis=ts,
                audit=True,
            )
        if sys_name is not None:
            if tag is not None or ts is not None:
                raise ValueError(
                    "paimon_lake system tables time-travel with "
                    "snapshot-id only"
                )
            return PaimonLakeSystemReader(path, sys_name, snapshot_id=sid)
        claim = self.options.get("claim-filters", "true").lower() != "false"
        return PaimonLakeBatchReader(
            path,
            claim_filters=claim,
            snapshot_id=sid,
            tag=tag,
            timestamp_millis=ts,
        )

    def streamReader(self, schema) -> PaimonLakeStreamReader:
        if self._split_path()[1] is not None:
            raise ValueError(
                "paimon_lake: system tables ($snapshots, $files, ...) are "
                "batch reads"
            )
        if any(v is not None for v in self._time_travel()):
            raise ValueError(
                "paimon_lake: snapshot-id / tag / timestamp-millis are "
                "batch read options; streaming start positions are "
                "scan.mode / scan.snapshot-id / scan.timestamp-millis"
            )
        mode, sid, ts = self._scan_start()
        return PaimonLakeStreamReader(
            self._table_path(),
            changelog=self._changelog(),
            scan_mode=mode,
            scan_snapshot=sid,
            scan_timestamp=ts,
            consumer_id=self.options.get("consumer-id"),
        )

    def _scan_start(self):
        from paimon_python_spark.datasource import _parse_scan_start

        return _parse_scan_start(self.options)

    def writer(self, schema, overwrite: bool) -> PaimonLakeBatchWriter:
        if self._split_path()[1] is not None:
            raise ValueError(
                "paimon_lake: system tables ($snapshots, $files, ...) are "
                "read-only"
            )
        if any(v is not None for v in self._time_travel()):
            raise ValueError(
                "paimon_lake: snapshot-id / tag / timestamp-millis are "
                "read options — a write always commits past the latest "
                "snapshot (rewind with rollback_lake)"
            )
        return PaimonLakeBatchWriter(self._table_path(), overwrite)


def register_lake(spark) -> None:
    # Spark 4 hard-errors (DATA_SOURCE_PUSHDOWN_DISABLED) at plan time
    # when a Python data source implements pushFilters() but the session
    # conf is off; it is runtime-settable, so flip it here so the source
    # works in ANY session, not just ones built via session.get_spark().
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PaimonLakeDataSource)
