"""Driver-side scan planning: snapshot → manifests → pruned splits.

Replaces the reference's JVM planning (snapshot → manifest list →
manifest entries → DataSplits with stats-based file skipping,
java_implementation.py:154-205). All pruning happens here on the driver
BEFORE any Spark job launches — at 100 TB this is the difference between
"read 3 files" and "list 3 million":

- partition pruning: predicate evaluated against partition values,
- file skipping: predicate evaluated against per-column min/max/null
  stats from the manifest (append tables: the full predicate; PK tables:
  only the primary-key sub-predicate — value columns may be stale in old
  LSM runs, so value predicates must wait until after the merge; this is
  the reference's filter-placement rule, pyarrow_dataset_reader.py:40-42 +
  predicate_utils.py:22-56),
- limit pushdown: split planning stops once Σ row_count ≥ limit
  (split-granular semantics, test_pynative_reader.py:166-181).

Split granularity mirrors the reference: PK tables → one split per
(partition, bucket) (the merge unit); append tables → one split per file
(commit order preserved).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

from paimon_python_spark.metadata import DataFileMeta, MetadataStore
from paimon_python_spark.predicate import Predicate


@dataclass
class Split:
    """Unit of scan parallelism (pypaimon/api/split.py:24-35): exposes
    row_count / file_size / file_paths like the reference's Split
    (test_object_metadata.py:48-73)."""

    files: List[DataFileMeta]
    partition: dict = field(default_factory=dict)
    bucket: int = 0
    table_path: str = ""

    def row_count(self) -> int:
        return sum(f.row_count for f in self.files)

    def file_size(self) -> int:
        return sum(f.file_size for f in self.files)

    def file_paths(self) -> List[str]:
        return [os.path.join(self.table_path, f.path) for f in self.files]


@dataclass
class Plan:
    _splits: List[Split]

    def splits(self) -> List[Split]:
        return self._splits


class TableScan:
    def __init__(self, read_builder):
        self.read_builder = read_builder
        self.table = read_builder.table
        self.store = MetadataStore(self.table.table_path)

    def plan(self) -> Plan:
        schema = self.table.schema
        predicate: Optional[Predicate] = self.read_builder._predicate
        limit: Optional[int] = self.read_builder._limit

        snapshot_id = self.read_builder._snapshot_id
        if snapshot_id is not None:
            files = self.store.live_files(self.store.read_snapshot(snapshot_id))
        else:
            files = self.store.live_files()

        if predicate is not None:
            part_keys = set(schema.partition_keys)
            # partition pruning: only the partition-key sub-predicate can
            # eliminate a partition.
            part_pred = predicate.keep_only_fields(part_keys) if part_keys else None
            # file-stats pruning: append → full predicate; PK → key-field
            # predicate only (filter-placement rule: a value predicate
            # may hold for a stale version and fail for the live one, so
            # value stats of one run say nothing about the merged row).
            # EXCEPT in deletion-vector mode: the merge was resolved at
            # commit time, every visible row comes verbatim from one
            # file, so the full predicate can skip files again — value
            # predicates prune PK tables exactly like append tables.
            from paimon_python_spark.deletion_vectors import dv_enabled

            if schema.is_primary_key_table() and not dv_enabled(schema):
                stats_pred = predicate.keep_only_fields(
                    set(schema.trimmed_primary_keys) | part_keys
                )
            else:
                stats_pred = predicate

            # exact file indexes (bitmap/bsi spec containers) only serve
            # equal/IN leaves — decode them lazily and only for probed
            # columns, same gate as the lake planner
            eq_fields = (
                stats_pred.equality_fields() if stats_pred is not None else set()
            )

            kept = []
            for f in files:
                if part_pred is not None and not part_pred.test_by_value(f.partition):
                    continue
                if stats_pred is not None:
                    st = f.stats
                    probes = (
                        self._file_index_probes(f, schema, eq_fields)
                        if eq_fields
                        else None
                    )
                    if probes:
                        st = dict(st or {})
                        for c, pr in probes.items():
                            ent = dict(
                                st.get(c)
                                or {
                                    "min": None,
                                    "max": None,
                                    "null_count": None,
                                    "row_count": f.row_count,
                                }
                            )
                            ent["bloom"] = pr  # duck-typed probe slot
                            st[c] = ent
                    if not stats_pred.test_by_stats(st):
                        continue
                kept.append(f)
            files = kept

            # bucket pruning: an equality (or small IN) constraint on the
            # full trimmed primary key pins the writer's pmod(hash, n)
            # bucket — a point lookup opens 1/n of the surviving files.
            buckets = self._candidate_buckets(predicate, schema)
            if buckets is not None:
                files = [f for f in files if f.bucket in buckets]

        splits = self._group(files, schema)

        if limit is not None:
            trimmed, total = [], 0
            for s in splits:
                if total >= limit:
                    break
                trimmed.append(s)
                total += s.row_count()
            splits = trimmed

        return Plan(splits)

    def _file_index_probes(self, f, schema, fields):
        """{column: probe} from a data file's spec index container
        (bitmap/bsi exact indexes written by DataFileHarvester) —
        inline base64 or a standalone .index beside the data file.
        None when the file carries none; decode failures leave the
        file unprunable (correct, merely unskipped)."""
        import base64
        import os

        raw = None
        if getattr(f, "file_index_b64", None):
            try:
                raw = base64.b64decode(f.file_index_b64)
            except Exception:
                return None
        elif getattr(f, "extra_files", None):
            for n in f.extra_files:
                if not str(n).endswith(".index"):
                    continue
                p = os.path.join(
                    self.table.table_path, os.path.dirname(f.path), n
                )
                if os.path.exists(p):
                    with open(p, "rb") as xf:
                        raw = xf.read()
                    break
        if raw is None:
            return None
        from paimon_python_spark.paimon_lake import _spec_blooms_typed

        return _spec_blooms_typed(schema, raw, fields=fields)

    @staticmethod
    def _candidate_buckets(predicate, schema) -> Optional[set]:
        """Buckets the predicate's rows can live in, or None when the
        predicate doesn't pin every trimmed-PK field to a finite set
        (or the combination count would explode)."""
        if predicate is None or not schema.is_primary_key_table():
            return None
        nb = schema.num_buckets()
        if nb < 1:
            return None
        keys = schema.trimmed_primary_keys
        eq = predicate.equality_sets()
        if not all(k in eq and eq[k] for k in keys):
            return None
        combos = 1
        for k in keys:
            combos *= len(eq[k])
            if combos > 256:
                return None

        from itertools import product

        from paimon_python_spark.bucketing import bucket_of

        dtypes = [schema.spark_schema[k].dataType for k in keys]
        try:
            return {
                bucket_of(list(vals), dtypes, nb)
                for vals in product(*[sorted(eq[k], key=repr) for k in keys])
            }
        except TypeError:
            # unsupported key type for the driver-side hash — skip pruning
            return None

    def _group(self, files: List[DataFileMeta], schema) -> List[Split]:
        table_path = self.table.table_path
        if not schema.is_primary_key_table():
            # one split per file, commit order (ConcatRecordReader parity)
            return [
                Split([f], partition=f.partition, bucket=f.bucket, table_path=table_path)
                for f in files
            ]
        groups: dict[tuple, Split] = {}
        for f in files:
            key = (tuple(sorted(f.partition.items())), f.bucket)
            if key not in groups:
                groups[key] = Split([], partition=f.partition, bucket=f.bucket, table_path=table_path)
            groups[key].files.append(f)
        return list(groups.values())
