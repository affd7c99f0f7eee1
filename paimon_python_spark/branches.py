"""Branches: isolated snapshot chains over shared data and manifests.

Paimon's branching surface (``CREATE BRANCH b [FROM TAG t]``, reads and
writes against ``table$branch_b``, ``fast_forward`` to publish a branch
back to main) re-expressed for this engine's filesystem metadata layer.
The reference SDK predates branches but exposes the same
snapshot-per-commit model they build on (table_commit.py:28-32).

Design: a branch is a directory ``<table>/branch/<name>/`` holding its
OWN ``snapshot/`` chain (and tags), while ``data/``, ``manifest/``,
``index/`` and ``schema/`` are shared with the main table via relative
symlinks. Because every engine component addresses state as
``MetadataStore(table_path)``, a branch Table is just the same Table
with ``table_path`` pointing into the branch dir — scans, writes,
commits, compaction, deletion vectors and time travel all work on a
branch unmodified. Data/manifest/DV-index files are immutable and
uuid-named, so chains never collide in the shared dirs.

Scale notes: branching is O(1) metadata (one snapshot copy, zero data
movement), exactly like the real format. On an object store the
symlinks become prefix indirection in the store layer — the layout
contract (branch-local snapshot chain, shared immutable file pool) is
unchanged. Fast-forward is a metadata swap: main's next snapshot reuses
the branch head's manifest list verbatim.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

from paimon_python_spark.metadata import MetadataStore, Snapshot

_SHARED_DIRS = ("data", "manifest", "index", "schema")


def _branch_root(table_path: str) -> str:
    return os.path.join(table_path, "branch")


def _branch_path(table_path: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid branch name {name!r}")
    return os.path.join(_branch_root(table_path), name)


def _main_path(table) -> str:
    """The main table path, whether ``table`` is main or a branch view."""
    p = table.table_path
    parent = os.path.dirname(p)
    if os.path.basename(parent) == "branch":
        return os.path.dirname(parent)
    return p


def create_branch(
    table, name: str, snapshot_id: Optional[int] = None, tag: Optional[str] = None
) -> None:
    """Create branch ``name`` starting from a snapshot (default: latest),
    or from a tag. O(1): links the shared dirs and seeds the branch's
    snapshot chain with a copy of the starting snapshot."""
    main = _main_path(table)
    bpath = _branch_path(main, name)
    if os.path.isdir(bpath):
        raise ValueError(f"Branch {name!r} already exists.")
    if tag is not None:
        from paimon_python_spark.tags import resolve_tag

        snapshot_id = resolve_tag(table, tag)
    store = MetadataStore(main)
    if snapshot_id is None:
        snapshot_id = store.latest_snapshot_id()
    if snapshot_id is None:
        raise ValueError("cannot branch an empty table (no snapshots)")
    base = store.read_snapshot(snapshot_id)

    os.makedirs(bpath)
    for d in _SHARED_DIRS:
        # ensure the shared target exists up front (index/ is lazy on
        # main) so branch-side writes land in the shared pool and
        # fast-forward never references branch-local files
        os.makedirs(os.path.join(main, d), exist_ok=True)
        # relative link: the warehouse stays relocatable
        os.symlink(os.path.join("..", "..", d), os.path.join(bpath, d))
    bstore = MetadataStore(bpath)
    os.makedirs(bstore.snapshot_dir, exist_ok=True)
    bstore.write_snapshot(
        Snapshot(
            id=base.id,
            schema_id=base.schema_id,
            commit_kind=base.commit_kind,
            manifests=list(base.manifests),
            total_record_count=base.total_record_count,
            delta_record_count=base.delta_record_count,
            commit_user=f"branch:{name}",
            time_millis=int(time.time() * 1000),
            dv_index=base.dv_index,
        )
    )


def as_branch(table, name: str):
    """A Table view addressing the branch's snapshot chain. Every
    read/write builder obtained from it operates on the branch."""
    from paimon_python_spark.table import Table

    main = _main_path(table)
    bpath = _branch_path(main, name)
    if not os.path.isdir(bpath):
        raise ValueError(f"Branch {name!r} does not exist.")
    return Table(f"{table.identifier}$branch_{name}", bpath, table.schema)


def list_branches(table) -> List[str]:
    root = _branch_root(_main_path(table))
    if not os.path.isdir(root):
        return []
    return sorted(
        n for n in os.listdir(root) if os.path.isdir(os.path.join(root, n))
    )


def branch_info(table) -> List[tuple]:
    """(branch_name, created_from_snapshot) rows for the branches system
    table. The seed snapshot a branch was created from is the smallest id
    in its chain (create_branch copies it in verbatim)."""
    main = _main_path(table)
    out = []
    for name in list_branches(table):
        sdir = MetadataStore(_branch_path(main, name)).snapshot_dir
        ids = [
            int(f[len("snapshot-") : -len(".json")])
            for f in os.listdir(sdir)
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        out.append((name, min(ids) if ids else None))
    return out


def delete_branch(table, name: str) -> None:
    import shutil

    bpath = _branch_path(_main_path(table), name)
    if not os.path.isdir(bpath):
        raise ValueError(f"Branch {name!r} does not exist.")
    # shared dirs are symlinks; rmtree removes the links, not the targets
    shutil.rmtree(bpath)


def fast_forward(table, name: str) -> int:
    """Publish branch ``name``'s head to main as main's next snapshot
    (Paimon's ``fast_forward`` procedure). Metadata-only: the branch's
    manifest list — already expressed against the shared file pool — is
    committed verbatim. Returns the new main snapshot id."""
    main = _main_path(table)
    bstore = MetadataStore(_branch_path(main, name))
    head_id = bstore.latest_snapshot_id()
    if head_id is None:
        raise ValueError(f"Branch {name!r} has no snapshots.")
    head = bstore.read_snapshot(head_id)
    store = MetadataStore(main)
    latest = store.latest_snapshot_id() or 0
    new_id = latest + 1
    prev_total = store.read_snapshot(latest).total_record_count if latest else 0
    store.write_snapshot(
        Snapshot(
            id=new_id,
            schema_id=head.schema_id,
            commit_kind="APPEND",
            manifests=list(head.manifests),
            total_record_count=head.total_record_count,
            delta_record_count=head.total_record_count - prev_total,
            commit_user=f"fast_forward:{name}",
            time_millis=int(time.time() * 1000),
            dv_index=head.dv_index,
        )
    )
    return new_id
