"""Lake maintenance: snapshot expiration, rollback.

Paimon expires old snapshots to bound metadata growth and reclaim the
space of files that are no longer live anywhere (overwritten partitions,
compacted-away sorted runs, deleted keys). The invariant: every KEPT
snapshot must stay fully readable — so a data file is deletable only
when it is live in NO kept snapshot, and a manifest only when NO kept
snapshot's replay references it. Expired snapshot ids stop being valid
time-travel targets (as in Paimon).

Everything here is driver-side metadata work plus filesystem deletes —
O(files released), no Spark job.
"""

from __future__ import annotations

import os

from paimon_python_spark.metadata import MetadataStore


def parse_paimon_duration(value) -> float:
    """A Paimon/Flink duration option value → milliseconds.

    Accepts ``'7 d'``/``'7d'``, ``'1 h'``, ``'30 min'``/``'30 m'``,
    ``'45 s'``, ``'500 ms'``, a bare number (milliseconds, Flink's
    TimeUtils default), or a ``datetime.timedelta``."""
    import datetime as _dt
    import re as _re

    if isinstance(value, _dt.timedelta):
        return value.total_seconds() * 1000.0
    s = str(value).strip().lower()
    m = _re.fullmatch(r"([0-9]*\.?[0-9]+)\s*([a-z]*)", s)
    if not m:
        raise ValueError(f"bad duration {value!r}")
    num, unit = float(m.group(1)), m.group(2)
    # the full Flink TimeUtils unit vocabulary (singular/plural/long
    # forms) — a real Paimon table may carry any of them
    ms = {
        "": 1,
        "ms": 1,
        "milli": 1,
        "millis": 1,
        "millisecond": 1,
        "milliseconds": 1,
        "s": 1000,
        "sec": 1000,
        "secs": 1000,
        "second": 1000,
        "seconds": 1000,
        "m": 60_000,
        "min": 60_000,
        "mins": 60_000,
        "minute": 60_000,
        "minutes": 60_000,
        "h": 3_600_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
        "d": 86_400_000,
        "day": 86_400_000,
        "days": 86_400_000,
    }.get(unit)
    if ms is None:
        raise ValueError(f"bad duration unit in {value!r}")
    return num * ms


def retention_cutoff(
    latest: int,
    snapshot_times,
    num_retained_min: int,
    num_retained_max,
    time_retained_ms: float,
    now_ms: float,
) -> int:
    """First snapshot id to KEEP under Paimon's retention triple
    (ExpireSnapshotsImpl): never expire into the newest
    ``num_retained_min``; force-expire beyond ``num_retained_max``;
    otherwise expire snapshots whose commit time fell out of
    ``time_retained_ms``. ``snapshot_times`` is ``{id: timeMillis}``
    for existing snapshots (missing/0 times count as ancient)."""
    guard = latest - max(1, int(num_retained_min)) + 1
    count_cut = (
        latest - int(num_retained_max) + 1
        if num_retained_max is not None
        else 1
    )
    boundary = now_ms - time_retained_ms
    time_cut = 1
    for sid in sorted(snapshot_times):
        if float(snapshot_times[sid] or 0) >= boundary:
            time_cut = sid
            break
        time_cut = sid + 1
    return min(guard, max(count_cut, time_cut))


def expire_snapshots(table, keep_last_n=None, now_ms=None) -> dict:
    """Expire old snapshots. With ``keep_last_n`` set, all but the
    newest N go. Without it, the table's own retention options drive
    the policy exactly like real Paimon's ExpireSnapshotsImpl:
    ``snapshot.num-retained.min`` (default 10) snapshots always stay,
    anything beyond ``snapshot.num-retained.max`` goes, and in between
    a snapshot expires once its commit time is older than
    ``snapshot.time-retained`` (default 1 h).

    Returns ``{"snapshots_deleted": n, "manifests_deleted": n,
    "data_files_deleted": n}``.
    """
    from paimon_python_spark.tags import list_tags

    store = MetadataStore(table.table_path)
    latest = store.latest_snapshot_id() or 0
    if keep_last_n is not None:
        if keep_last_n < 1:
            raise ValueError("keep_last_n must be >= 1")
        cutoff = latest - keep_last_n + 1
    else:
        opts = table.schema.options
        import time as _time

        times = {}
        for sid in range(1, latest + 1):
            if os.path.exists(
                os.path.join(store.snapshot_dir, f"snapshot-{sid}.json")
            ):
                times[sid] = store.read_snapshot(sid).time_millis
        nmax = opts.get("snapshot.num-retained.max")
        cutoff = retention_cutoff(
            latest,
            times,
            int(opts.get("snapshot.num-retained.min", "10")),
            int(nmax) if nmax is not None else None,
            parse_paimon_duration(opts.get("snapshot.time-retained", "1 h")),
            now_ms if now_ms is not None else _time.time() * 1000,
        )
    if cutoff <= 1:
        return {"snapshots_deleted": 0, "manifests_deleted": 0, "data_files_deleted": 0}

    # tagged snapshots are pinned: they stay readable (snapshot file,
    # manifests, data files) no matter how old they are
    tagged_ids = set(list_tags(table).values())

    def _exists(sid: int) -> bool:
        return os.path.exists(os.path.join(store.snapshot_dir, f"snapshot-{sid}.json"))

    kept_ids = (set(range(cutoff, latest + 1)) | tagged_ids) & {
        sid for sid in range(1, latest + 1) if _exists(sid)
    }
    kept = [store.read_snapshot(sid) for sid in sorted(kept_ids)]
    expired = [
        store.read_snapshot(sid)
        for sid in range(1, cutoff)
        if sid not in kept_ids and _exists(sid)
    ]

    kept_manifests = {m for s in kept for m in s.manifests}
    live_paths = {f.path for s in kept for f in store.live_files(s)}

    # every file any expired manifest ever ADDed, minus what's still live
    expired_manifests = {m for s in expired for m in s.manifests} - kept_manifests
    dead_paths = set()
    for mname in expired_manifests | kept_manifests:
        for entry in store.read_manifest(mname):
            if entry.kind == "ADD" and entry.file.path not in live_paths:
                dead_paths.add(entry.file.path)
                # a dead data file takes its standalone index extras
                # with it (they are unreadable without the data file)
                for x in entry.file.extra_files or []:
                    dead_paths.add(
                        os.path.join(os.path.dirname(entry.file.path), x)
                    )

    n_files = 0
    for rel in dead_paths:
        p = os.path.join(table.table_path, rel)
        if os.path.exists(p):
            os.remove(p)
            n_files += 1
    n_manifests = 0
    for mname in expired_manifests:
        p = os.path.join(store.manifest_dir, mname)
        if os.path.exists(p):
            os.remove(p)
            n_manifests += 1
    n_snapshots = 0
    for s in expired:
        p = os.path.join(store.snapshot_dir, f"snapshot-{s.id}.json")
        if os.path.exists(p):
            os.remove(p)
            n_snapshots += 1

    return {
        "snapshots_deleted": n_snapshots,
        "manifests_deleted": n_manifests,
        "data_files_deleted": n_files,
    }


def rollback_to(table, snapshot_id: int = None, tag: str = None) -> int:
    """Roll the table back to an earlier state — by snapshot id or tag —
    by committing a REVERT snapshot that reuses the target's manifest
    list verbatim. History stays linear and append-only (time travel to
    the in-between states keeps working until they expire), the revert
    itself is O(1) metadata, and no data file is touched — expiration
    reclaims whatever the revert orphaned, later, under its usual
    every-kept-snapshot-stays-readable invariant.

    Returns the new snapshot id.
    """
    import time as _time

    from paimon_python_spark.metadata import Snapshot
    from paimon_python_spark.tags import resolve_tag

    if (snapshot_id is None) == (tag is None):
        raise ValueError("rollback_to: pass exactly one of snapshot_id / tag")
    if tag is not None:
        snapshot_id = resolve_tag(table, tag)
    store = MetadataStore(table.table_path)
    target = store.read_snapshot(snapshot_id)  # raises if expired/absent
    latest = store.latest_snapshot_id() or 0
    new_id = latest + 1
    store.write_snapshot(
        Snapshot(
            id=new_id,
            schema_id=target.schema_id,
            commit_user="rollback",
            commit_kind="OVERWRITE",
            time_millis=int(_time.time() * 1000),
            manifests=list(target.manifests),
            dv_index=target.dv_index,  # DV state travels with the manifests
            total_record_count=target.total_record_count,
            delta_record_count=target.total_record_count
            - (store.read_snapshot(latest).total_record_count if latest else 0),
        )
    )
    return new_id


def remove_orphan_files(table, older_than_seconds: float = 3600.0) -> dict:
    """Delete data files in ``data/`` that NO manifest references —
    debris from failed/abandoned write jobs whose prepare_commit never
    committed (Paimon's ``remove_orphan_files`` procedure).

    A grace period (default 1h) protects files an in-flight writer has
    just produced but not yet committed: only orphans whose mtime is
    older than ``older_than_seconds`` are removed. Driver-side walk —
    O(files in data/) stat calls, no Spark job; at object-store scale
    the walk becomes a LIST + the same mtime filter.

    Returns ``{"orphans_deleted": n, "bytes_reclaimed": n}``.
    """
    import time as _time

    store = MetadataStore(table.table_path)
    known = store.known_data_paths()
    now = _time.time()
    n, reclaimed = 0, 0
    for dirpath, _dirnames, filenames in os.walk(store.data_dir):
        for fname in filenames:
            if fname.startswith(("_", ".")):  # spark markers (_SUCCESS)
                continue
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, table.table_path)
            if rel in known:
                continue
            st = os.stat(full)
            if now - st.st_mtime < older_than_seconds:
                continue
            reclaimed += st.st_size
            os.remove(full)
            n += 1
    # statistic files: pinned while ANY existing snapshot file (tagged
    # snapshots keep theirs) names them in its `statistics` field;
    # expired-ANALYZE leftovers and CAS-loser debris are reaped here
    stdir = os.path.join(table.table_path, "statistics")
    if os.path.isdir(stdir):
        known_stats = set()
        for name in os.listdir(store.snapshot_dir):
            if name.startswith("snapshot-") and name.endswith(".json"):
                s = store.read_snapshot(
                    int(name[len("snapshot-") : -len(".json")])
                )
                if s.statistics:
                    known_stats.add(s.statistics)
        for fname in os.listdir(stdir):
            if fname.startswith(("_", ".")) or fname in known_stats:
                continue
            full = os.path.join(stdir, fname)
            st = os.stat(full)
            if now - st.st_mtime < older_than_seconds:
                continue
            reclaimed += st.st_size
            os.remove(full)
            n += 1
    return {"orphans_deleted": n, "bytes_reclaimed": reclaimed}


def compact_manifests(table) -> "int | None":
    """Roll every manifest the latest snapshot references into ONE base
    manifest holding the folded live-file set (in ADD/commit order, so
    append-table read order is unchanged).

    Why it matters at scale: each commit appends a delta manifest and
    every scan folds the whole chain on the driver — after 100k commits
    planning reads 100k JSON files before a single Spark task runs.
    Manifest compaction resets the chain to length 1 (Paimon's
    full-compaction of the manifest list); commit growth restarts from
    there, and `expire_snapshots` reclaims the superseded manifests
    once no kept snapshot references them.

    The snapshot is `commit_kind="COMPACT"`, which streaming/
    incremental readers already skip — no consumer sees replayed rows.
    Returns the new snapshot id, or None when the chain is already
    minimal.

    Concurrency mirrors ``BatchTableCommit``: ``prev`` consults
    ``max_snapshot_id_scan()`` (the LATEST pointer can lag a
    just-published snapshot) and a losing id race
    (``SnapshotConflictError``) recomputes the live set against the
    new latest and retries — up to 5 attempts, like data commits.
    Losing attempts leave orphan manifests, which
    ``remove_orphan_files`` reclaims."""
    import time

    from paimon_python_spark.metadata import (
        ManifestEntry,
        Snapshot,
        SnapshotConflictError,
    )

    store = MetadataStore(table.table_path)
    last_err = None
    for _attempt in range(5):
        prev = store.latest_snapshot()
        scan_max = store.max_snapshot_id_scan()
        if scan_max is not None and (prev is None or prev.id < scan_max):
            prev = store.read_snapshot(scan_max)
        if prev is None or len(prev.manifests) <= 1:
            return None
        live = store.live_files(prev)  # folded, ADD-order preserved
        base = store.write_manifest([ManifestEntry("ADD", f) for f in live])
        snapshot = Snapshot(
            id=prev.id + 1,
            schema_id=prev.schema_id,
            commit_kind="COMPACT",
            manifests=[base],
            total_record_count=prev.total_record_count,
            delta_record_count=0,
            time_millis=int(time.time() * 1000),
            dv_index=prev.dv_index,
        )
        try:
            store.write_snapshot(snapshot)
            return snapshot.id
        except SnapshotConflictError as err:
            last_err = err  # recompute against the new latest and retry
    raise RuntimeError(
        f"compact_manifests failed after 5 conflict retries: {last_err}"
    )
