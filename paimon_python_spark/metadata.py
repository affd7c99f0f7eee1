"""Snapshot / manifest persistence — the table format's commit protocol.

Replaces the reference's JVM-side snapshot+manifest machinery (the Python
side only sees planned splits, pypaimon/py4j/java_implementation.py:154-205;
each commit produces snapshot files, pypaimon/api/table_commit.py:28-32).

Layout under a table path::

    <table>/schema/schema-0.json
    <table>/snapshot/snapshot-<N>.json     # one per commit
    <table>/snapshot/LATEST                # atomic pointer (write-tmp+rename)
    <table>/manifest/manifest-<uuid>.json  # ADD/DELETE file entries
    <table>/data/<part dirs>/<bucket dirs>/part-*.parquet

A snapshot lists the manifest files whose folded ADD/DELETE entries form
the live file set. Commits are atomic via write-to-temp-then-rename (the
same trick the reference's gateway handshake uses,
PythonGatewayServer.java:58-76). Designed for driver-side planning at
scale: manifests carry per-file row counts, sizes, sequence ranges and
per-column min/max/null-count stats so partition pruning, file skipping
and limit pushdown all happen before any Spark job is launched.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class DataFileMeta:
    """One data file tracked by a manifest entry."""

    path: str  # relative to table root
    row_count: int
    file_size: int
    partition: dict[str, Any] = field(default_factory=dict)
    bucket: int = 0
    min_seq: Optional[int] = None
    max_seq: Optional[int] = None
    stats: dict[str, dict] = field(default_factory=dict)  # col -> {min,max,null_count,row_count}
    # spec file-index container (bitmap/bsi exact indexes): inline
    # base64 at or under file-index.in-manifest-threshold, else a
    # standalone <data-stem>.index beside the data file (extra_files).
    # Old manifests lack both keys — from_dict defaults cover them.
    file_index_b64: Optional[str] = None
    extra_files: Optional[list] = None

    def to_dict(self) -> dict:
        d = {
            "path": self.path,
            "row_count": self.row_count,
            "file_size": self.file_size,
            "partition": self.partition,
            "bucket": self.bucket,
            "min_seq": self.min_seq,
            "max_seq": self.max_seq,
            "stats": self.stats,
        }
        # only when set: keeps index-free manifests byte-stable with
        # every pre-r10 reader/fixture
        if self.file_index_b64 is not None:
            d["file_index_b64"] = self.file_index_b64
        if self.extra_files:
            d["extra_files"] = self.extra_files
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "DataFileMeta":
        return cls(**d)


@dataclass
class ManifestEntry:
    kind: str  # "ADD" | "DELETE"
    file: DataFileMeta

    def to_dict(self) -> dict:
        return {"kind": self.kind, "file": self.file.to_dict()}

    @classmethod
    def from_dict(cls, d: dict) -> "ManifestEntry":
        return cls(kind=d["kind"], file=DataFileMeta.from_dict(d["file"]))


@dataclass
class Snapshot:
    id: int
    schema_id: int
    commit_kind: str  # "APPEND" | "OVERWRITE" | "COMPACT"
    manifests: list[str]  # manifest file names, in commit order
    total_record_count: int
    delta_record_count: int
    commit_user: str = "paimon_python_spark"
    time_millis: int = 0
    # deletion-vector index file under index/ (None = no DVs at this
    # snapshot); see deletion_vectors.py
    dv_index: Optional[str] = None
    # table-statistic file under statistics/ (only an ANALYZE commit
    # carries one; ordinary commits leave it None and readers walk
    # back — mirrors the lake/spec semantics in lake_statistics)
    statistics: Optional[str] = None
    # event-time watermark (epoch millis) carried by this commit; None
    # = never progressed. Monotone: commits fold max(prev, provided).
    # Drives tag.automatic-creation=watermark (tags.auto_create_tag)
    watermark: Optional[int] = None

    def to_dict(self) -> dict:
        d = {
            "version": 1,
            "id": self.id,
            "schema_id": self.schema_id,
            "commit_kind": self.commit_kind,
            "manifests": self.manifests,
            "total_record_count": self.total_record_count,
            "delta_record_count": self.delta_record_count,
            "commit_user": self.commit_user,
            "time_millis": self.time_millis,
        }
        if self.dv_index:
            d["dv_index"] = self.dv_index
        if self.statistics:
            d["statistics"] = self.statistics
        if self.watermark is not None:
            d["watermark"] = self.watermark
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Snapshot":
        return cls(
            id=d["id"],
            schema_id=d["schema_id"],
            commit_kind=d["commit_kind"],
            manifests=d["manifests"],
            total_record_count=d["total_record_count"],
            delta_record_count=d["delta_record_count"],
            commit_user=d.get("commit_user", ""),
            time_millis=d.get("time_millis", 0),
            dv_index=d.get("dv_index"),
            statistics=d.get("statistics"),
            watermark=d.get("watermark"),
        )


class SnapshotConflictError(RuntimeError):
    """Another committer published this snapshot id first. Recompute the
    commit against the new latest snapshot and retry."""


def _atomic_write(path: str, text: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def _exclusive_write(path: str, text: str) -> None:
    """Atomic create-if-absent: write a temp file, hardlink it to the
    final name (fails if the name exists — the filesystem CAS), unlink
    the temp. On filesystems without hardlinks, O_EXCL open is the
    fallback."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(text)
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise SnapshotConflictError(f"snapshot already exists: {path}")
    except OSError:
        # no hardlink support: O_EXCL create, then replace content
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise SnapshotConflictError(f"snapshot already exists: {path}")
        with os.fdopen(fd, "w") as f:
            f.write(text)
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


class MetadataStore:
    """Snapshot/manifest IO for one table path (local/posix filesystem;
    an object-store backend would swap these ~10 calls)."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.snapshot_dir = os.path.join(table_path, "snapshot")
        self.manifest_dir = os.path.join(table_path, "manifest")
        self.data_dir = os.path.join(table_path, "data")

    def init_dirs(self) -> None:
        for d in (self.snapshot_dir, self.manifest_dir, self.data_dir):
            os.makedirs(d, exist_ok=True)

    # -- snapshots --

    def latest_snapshot_id(self) -> Optional[int]:
        p = os.path.join(self.snapshot_dir, "LATEST")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def read_snapshot(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.snapshot_dir, f"snapshot-{snapshot_id}.json")) as f:
            return Snapshot.from_dict(json.load(f))

    def latest_snapshot(self) -> Optional[Snapshot]:
        sid = self.latest_snapshot_id()
        return None if sid is None else self.read_snapshot(sid)

    def max_snapshot_id_scan(self) -> Optional[int]:
        """Authoritative latest id by scanning snapshot files — O(commits),
        used only on the commit-conflict retry path where the LATEST
        pointer may be momentarily stale."""
        best: Optional[int] = None
        for name in os.listdir(self.snapshot_dir):
            if name.startswith("snapshot-") and name.endswith(".json"):
                try:
                    sid = int(name[len("snapshot-") : -len(".json")])
                except ValueError:
                    continue
                best = sid if best is None else max(best, sid)
        return best

    def write_snapshot(self, snapshot: Snapshot) -> None:
        """Publish a snapshot with compare-and-swap semantics: creating
        ``snapshot-<id>.json`` is EXCLUSIVE (hardlink-from-temp fails if
        the id is taken), so two committers racing for the same id cannot
        silently overwrite each other — the loser gets
        :class:`SnapshotConflictError` and must recompute against the
        winner's snapshot (optimistic concurrency, the same protocol as
        Paimon/Iceberg/Delta). The LATEST pointer is a monotonic cache:
        it only moves forward, and readers fall back to a directory scan
        on the retry path."""
        _exclusive_write(
            os.path.join(self.snapshot_dir, f"snapshot-{snapshot.id}.json"),
            json.dumps(snapshot.to_dict(), indent=2),
        )
        cur = self.latest_snapshot_id()
        if cur is None or cur < snapshot.id:
            _atomic_write(os.path.join(self.snapshot_dir, "LATEST"), str(snapshot.id))

    # -- manifests --

    def write_manifest(self, entries: list[ManifestEntry]) -> str:
        name = f"manifest-{uuid.uuid4().hex}.json"
        _atomic_write(
            os.path.join(self.manifest_dir, name),
            json.dumps({"entries": [e.to_dict() for e in entries]}, indent=2),
        )
        return name

    def read_manifest(self, name: str) -> list[ManifestEntry]:
        with open(os.path.join(self.manifest_dir, name)) as f:
            return [ManifestEntry.from_dict(e) for e in json.load(f)["entries"]]

    # -- live file resolution --

    def live_files(self, snapshot: Optional[Snapshot] = None) -> list[DataFileMeta]:
        """Fold ADD/DELETE entries of the snapshot's manifests (in commit
        order) into the live file set, preserving ADD (commit) order —
        append-table reads come back in commit order like the reference's
        ConcatRecordReader (concat_record_reader.py:27-57)."""
        if snapshot is None:
            snapshot = self.latest_snapshot()
        if snapshot is None:
            return []
        live: dict[str, DataFileMeta] = {}
        for mname in snapshot.manifests:
            for entry in self.read_manifest(mname):
                if entry.kind == "ADD":
                    live[entry.file.path] = entry.file
                else:
                    live.pop(entry.file.path, None)
        return list(live.values())

    def known_data_paths(self) -> set[str]:
        """Every file path ever referenced by any manifest (committed or
        not yet folded); used to detect the new files a Spark write job
        just produced."""
        known: set[str] = set()
        if not os.path.isdir(self.manifest_dir):
            return known
        for name in os.listdir(self.manifest_dir):
            if name.startswith("manifest-"):
                for entry in self.read_manifest(name):
                    known.add(entry.file.path)
                    # standalone file-index extras live beside the data
                    # file and are pinned exactly as long as it is
                    for x in entry.file.extra_files or []:
                        known.add(
                            os.path.join(os.path.dirname(entry.file.path), x)
                        )
        return known
