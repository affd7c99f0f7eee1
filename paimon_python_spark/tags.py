"""Tags: durable named references to snapshots.

Paimon tags give a snapshot a stable name ("v1.2", "daily-2026-08-13")
that survives snapshot expiration — the lakehouse equivalent of a git
tag, used for reproducible training runs and auditable releases. The
reference exposes no tag API in Python (snapshot/commit only,
pypaimon/api/table_commit.py:24-36); this follows Paimon's table-format
concept: one tiny JSON per tag under ``<table>/tag/``.

Driver-side metadata only — no Spark job, O(1) per operation.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

from paimon_python_spark.metadata import MetadataStore, _atomic_write

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _tag_dir(table_path: str) -> str:
    return os.path.join(table_path, "tag")


def _tag_path(table_path: str, name: str) -> str:
    return os.path.join(_tag_dir(table_path), f"tag-{name}.json")


def create_tag(table, name: str, snapshot_id: Optional[int] = None) -> int:
    """Tag ``snapshot_id`` (default: latest) as ``name``. Returns the
    tagged snapshot id. Errors if the tag exists or the snapshot
    doesn't."""
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid tag name {name!r}")
    store = MetadataStore(table.table_path)
    if snapshot_id is None:
        snapshot_id = store.latest_snapshot_id()
        if snapshot_id is None:
            raise ValueError("cannot tag: table has no snapshots")
    store.read_snapshot(snapshot_id)  # raises if missing/expired
    path = _tag_path(table.table_path, name)
    if os.path.exists(path):
        raise ValueError(f"tag {name!r} already exists")
    os.makedirs(_tag_dir(table.table_path), exist_ok=True)
    _atomic_write(path, json.dumps({"name": name, "snapshot_id": snapshot_id}))
    return snapshot_id


def delete_tag(table, name: str) -> bool:
    """Remove a tag; returns whether it existed. The snapshot itself is
    untouched (it becomes expirable again if outside the keep window)."""
    path = _tag_path(table.table_path, name)
    if not os.path.exists(path):
        return False
    os.remove(path)
    return True


def list_tags(table) -> Dict[str, int]:
    """name -> snapshot_id for every tag on the table."""
    d = _tag_dir(table.table_path)
    out: Dict[str, int] = {}
    if not os.path.isdir(d):
        return out
    for fn in sorted(os.listdir(d)):
        if fn.startswith("tag-") and fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                rec = json.load(f)
            out[rec["name"]] = rec["snapshot_id"]
    return out


def resolve_tag(table, name: str) -> int:
    """Tag name -> snapshot id (ValueError if absent)."""
    tags = list_tags(table)
    if name not in tags:
        raise ValueError(f"unknown tag {name!r}; have {sorted(tags)}")
    return tags[name]
