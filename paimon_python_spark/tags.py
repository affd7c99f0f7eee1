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

#: modes a table may DECLARE; commit-time never raises on others — the
#: snapshot is already durable by then (real Paimon's 'none' default and
#: foreign-lake values must not fail every commit; ADVICE r11)
AUTO_TAG_MODES = {"none", "process-time", "watermark"}

#: real Paimon's "no watermark yet" sentinel (Long.MIN_VALUE)
NO_WATERMARK = -9223372036854775808


def validate_auto_tag_options(options: dict) -> None:
    """Validate ``tag.automatic-creation`` options at table-create /
    option-set time — the only place a bad value may raise. Commit-time
    (:func:`auto_create_tag`) skips anything it can't act on instead:
    the snapshot is durably published by then and raising would make a
    retrying caller write duplicate data."""
    mode = options.get("tag.automatic-creation")
    if mode is not None and mode not in AUTO_TAG_MODES:
        raise ValueError(
            f"tag.automatic-creation={mode!r}: one of {sorted(AUTO_TAG_MODES)}"
        )
    period = options.get("tag.creation-period")
    if period is not None and period not in AUTO_TAG_PERIODS:
        raise ValueError(
            f"tag.creation-period={period!r}: one of {sorted(AUTO_TAG_PERIODS)}"
        )


def watermark_millis(v) -> Optional[int]:
    """Normalize a user watermark value to epoch millis: int/float pass
    through (already millis), datetime/date/ISO-string convert (naive
    values read as UTC, matching the engine's session timezone). None
    or unconvertible → None (no watermark)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return int(v)
    if isinstance(v, str):
        try:
            v = _dt.datetime.fromisoformat(v)
        except ValueError:
            return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, _dt.date):
        return int(
            _dt.datetime(
                v.year, v.month, v.day, tzinfo=_dt.timezone.utc
            ).timestamp()
            * 1000
        )
    return None


def _publish_tag_exclusive(path: str, text: str) -> bool:
    """Create-if-absent tag publish: temp file + hardlink CAS (O_EXCL
    fallback), so a crash can never leave a permanently empty tag file
    blocking the period (ADVICE r11). Returns False when the tag
    already exists — the idempotent-loser case."""
    from paimon_python_spark.metadata import (
        SnapshotConflictError,
        _exclusive_write,
    )

    try:
        _exclusive_write(path, text)
    except SnapshotConflictError:
        return False
    return True


def auto_create_tag(table, snapshot, watermark: Optional[int] = None) -> None:
    """Tag-on-commit for ENGINE tables (lake twin:
    ``paimon_lake._auto_create_lake_tag``): if no tag exists for the
    commit's period, pin THIS snapshot; ``tag.num-retained-max`` then
    reaps the oldest AUTO tags (name-format match — manual tags
    untouched). ``process-time`` names the period from the snapshot's
    own ``time_millis``; ``watermark`` from the commit's watermark
    (no watermark → no tag, real Paimon's TagAutoManager behavior).
    Unknown modes/periods skip silently — the commit is already
    durable; validation happens at create time
    (:func:`validate_auto_tag_options`). Concurrent committers race
    idempotently on the hardlink CAS."""
    import re
    from datetime import datetime, timezone

    opts = table.schema.options
    mode = opts.get("tag.automatic-creation") or "none"
    period = opts.get("tag.creation-period", "daily")
    if (
        mode == "none"
        or mode not in AUTO_TAG_MODES
        or period not in AUTO_TAG_PERIODS
    ):
        return
    if mode == "watermark":
        if watermark is None:
            watermark = getattr(snapshot, "watermark", None)
        if watermark is None or watermark == NO_WATERMARK:
            return  # no watermark progressed yet → no tag
        t_millis = watermark
    else:
        t_millis = snapshot.time_millis
    fmt, pat = AUTO_TAG_PERIODS[period]
    name = datetime.fromtimestamp(
        t_millis / 1000.0, tz=timezone.utc
    ).strftime(fmt)
    tdir = _tag_dir(table.table_path)
    os.makedirs(tdir, exist_ok=True)
    if not _publish_tag_exclusive(
        _tag_path(table.table_path, name),
        json.dumps({"name": name, "snapshot_id": snapshot.id}),
    ):
        return  # this period already has its tag
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
