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


#: tag.creation-period → (strftime pattern, matching regex) — Paimon's
#: default date-format names; shared with the lake twin
#: (paimon_lake._auto_create_lake_tag imports this table)
AUTO_TAG_PERIODS = {
    "daily": ("%Y-%m-%d", r"^\d{4}-\d{2}-\d{2}$"),
    "hourly": ("%Y-%m-%d %H", r"^\d{4}-\d{2}-\d{2} \d{2}$"),
}


def auto_create_tag(table, snapshot) -> None:
    """Tag-on-commit for ENGINE tables (lake twin:
    ``paimon_lake._auto_create_lake_tag``): if no tag exists for the
    commit's period (named from the snapshot's own ``time_millis``),
    pin THIS snapshot; ``tag.num-retained-max`` then reaps the oldest
    AUTO tags (name-format match — manual tags untouched). Concurrent
    committers race idempotently on O_EXCL."""
    import re
    from datetime import datetime, timezone

    opts = table.schema.options
    mode = opts["tag.automatic-creation"]
    if mode != "process-time":
        raise ValueError(
            f"tag.automatic-creation={mode!r}: only 'process-time' is "
            "supported (watermark creation needs a watermark-carrying "
            "writer)"
        )
    period = opts.get("tag.creation-period", "daily")
    if period not in AUTO_TAG_PERIODS:
        raise ValueError(
            f"tag.creation-period={period!r}: one of {sorted(AUTO_TAG_PERIODS)}"
        )
    fmt, pat = AUTO_TAG_PERIODS[period]
    name = datetime.fromtimestamp(
        snapshot.time_millis / 1000.0, tz=timezone.utc
    ).strftime(fmt)
    tdir = _tag_dir(table.table_path)
    os.makedirs(tdir, exist_ok=True)
    try:
        fd = os.open(
            _tag_path(table.table_path, name),
            os.O_WRONLY | os.O_CREAT | os.O_EXCL,
        )
    except FileExistsError:
        return  # this period already has its tag
    with os.fdopen(fd, "w") as f:
        f.write(json.dumps({"name": name, "snapshot_id": snapshot.id}))
    retain = opts.get("tag.num-retained-max")
    if retain is not None:
        auto = sorted(
            n[len("tag-") : -len(".json")]
            for n in os.listdir(tdir)
            if n.startswith("tag-")
            and n.endswith(".json")
            and re.match(pat, n[len("tag-") : -len(".json")])
        )
        for stale in auto[: max(0, len(auto) - int(retain))]:
            try:
                os.remove(_tag_path(table.table_path, stale))
            except FileNotFoundError:
                pass  # concurrent retention pass got it first
