"""Retention-option parity: ``snapshot.num-retained.min/max`` +
``snapshot.time-retained`` drive option-only snapshot expiry on both
table kinds (Paimon's ExpireSnapshotsImpl policy),
``consumer.expiration-time`` drops stale consumers before they hold
expiry back (ConsumerManager.expire), and
``full-compaction.delta-commits`` gives trigger-based compaction the
periodic-FULL cadence. ``now_ms`` is injected everywhere for
determinism."""

import json
import os

import pytest
from pyspark.sql import types as T

from paimon_python_spark import Schema
from paimon_python_spark.maintenance import (
    expire_snapshots,
    parse_paimon_duration,
    retention_cutoff,
)

HOUR = 3_600_000.0


def test_parse_paimon_duration():
    assert parse_paimon_duration("1 h") == HOUR
    # Flink TimeUtils long/plural forms a real Paimon table may carry
    assert parse_paimon_duration("2 hours") == 2 * HOUR
    assert parse_paimon_duration("7 days") == 7 * 86_400_000
    assert parse_paimon_duration("1 minute") == 60_000
    assert parse_paimon_duration("10 seconds") == 10_000
    assert parse_paimon_duration("5 milliseconds") == 5
    assert parse_paimon_duration("7d") == 7 * 86_400_000
    assert parse_paimon_duration("30 min") == 30 * 60_000
    assert parse_paimon_duration("45 s") == 45_000
    assert parse_paimon_duration("500 ms") == 500
    assert parse_paimon_duration("250") == 250  # bare millis
    import datetime

    assert parse_paimon_duration(datetime.timedelta(hours=2)) == 2 * HOUR
    with pytest.raises(ValueError):
        parse_paimon_duration("1 fortnight")


def test_retention_cutoff_policy():
    times = {i: i * 1000 for i in range(1, 11)}  # ids 1..10
    # min guard wins: everything old, but the newest 4 must stay
    assert retention_cutoff(10, times, 4, None, 0.0, 10_000_000) == 7
    # time boundary: ids with time >= now - retained stay (id 5 at 5000)
    assert retention_cutoff(10, times, 1, None, 5_000.0, 10_000) == 5
    # max cap forces expiry even inside the time window
    assert retention_cutoff(10, times, 1, 3, HOUR, 10_000) == 8
    # nothing to expire on a short history
    assert retention_cutoff(2, {1: 0, 2: 0}, 10, None, 0.0, HOUR) == -7


def _commit_n(t, st, n, spark):
    for i in range(n):
        wb = t.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        w.write_dataframe(spark.createDataFrame([(i, f"v{i}")], st))
        c.commit(w.prepare_commit())
        w.close()
        c.close()


def test_engine_option_driven_expiry(catalog, spark):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.StringType())]
    )
    catalog.create_table(
        "default.ret",
        Schema(
            st,
            primary_keys=["k"],
            options={
                "bucket": "1",
                "snapshot.num-retained.min": "2",
                "snapshot.time-retained": "1 h",
            },
        ),
        False,
    )
    t = catalog.get_table("default.ret")
    _commit_n(t, st, 5, spark)
    # everything is within the hour → nothing expires
    assert expire_snapshots(t)["snapshots_deleted"] == 0
    # jump the clock two hours: all are stale, min guard keeps 2
    import time

    res = expire_snapshots(t, now_ms=time.time() * 1000 + 2 * HOUR)
    assert res["snapshots_deleted"] == 3
    # num-retained.max caps regardless of freshness
    catalog.create_table(
        "default.ret_max",
        Schema(
            st,
            primary_keys=["k"],
            options={
                "bucket": "1",
                "snapshot.num-retained.min": "1",
                "snapshot.num-retained.max": "3",
                "snapshot.time-retained": "9999 d",
            },
        ),
        False,
    )
    t2 = catalog.get_table("default.ret_max")
    _commit_n(t2, st, 5, spark)
    assert expire_snapshots(t2)["snapshots_deleted"] == 2


def test_lake_option_driven_expiry_and_consumer_ttl(tmp_path, spark):
    import time

    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        expire_lake_snapshots,
        list_lake_consumers,
        write_lake_append,
        write_lake_consumer,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "ret_lake")
    create_lake_table(
        p,
        [("k", "INT"), ("v", "STRING")],
        options={
            "snapshot.num-retained.min": "2",
            "snapshot.time-retained": "1 h",
            "consumer.expiration-time": "1 h",
        },
    )
    for i in range(4):
        write_lake_append(p, spark.createDataFrame([(i, "x")], "k int, v string"))
    # a consumer parked at snapshot 1 holds everything back...
    write_lake_consumer(p, "lagger", 1)
    future = time.time() * 1000 + 2 * HOUR
    # ...but it is STALE (file mtime is now, TTL 1h, clock jumped 2h):
    # expiry drops it first, then the retention policy applies
    res = expire_lake_snapshots(p, now_ms=future)
    assert list_lake_consumers(p) == {}
    assert res["snapshots_deleted"] == 2  # min guard keeps snapshots 3,4
    # a FRESH consumer still protects: register at 3, touch mtime to now
    write_lake_consumer(p, "live", 3)
    os.utime(
        os.path.join(p, "consumer", "consumer-live"),
        (future / 1000, future / 1000),
    )
    res2 = expire_lake_snapshots(p, keep_last_n=1, now_ms=future)
    assert res2["snapshots_deleted"] == 0  # snapshot 3 is protected


def test_full_compaction_delta_commits(tmp_path, spark):
    from paimon_python_spark.paimon_import import read_paimon_snapshot
    from paimon_python_spark.paimon_lake import (
        compact_lake_auto,
        create_lake_table,
        write_lake_pk_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "fcdc_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "STRING")],
        primary_keys=["k"],
        options={
            "bucket": "1",
            "full-compaction.delta-commits": "3",
            # run-count trigger far away: the delta cadence must fire it
            "num-sorted-run.compaction-trigger": "99",
        },
    )
    for i in range(2):
        write_lake_pk_append(p, spark.createDataFrame([(1, f"v{i}")], "k int, v string"))
    assert compact_lake_auto(p) is None  # 2 commits < 3
    write_lake_pk_append(p, spark.createDataFrame([(1, "v2")], "k int, v string"))
    sid = compact_lake_auto(p)  # 3 commits since start → FULL compact
    assert sid is not None
    assert read_paimon_snapshot(p, sid)["commitKind"] == "COMPACT"
    assert compact_lake_auto(p) is None  # 0 commits since the compact
    for i in range(3):
        write_lake_pk_append(p, spark.createDataFrame([(1, f"w{i}")], "k int, v string"))
    assert compact_lake_auto(p) is not None  # cadence fires again


def test_partial_compacts_do_not_reset_full_cadence(tmp_path, spark):
    """Trigger-based PARTIAL compactions also commit COMPACT snapshots;
    the full-compaction.delta-commits cadence must count from the last
    FULL compaction (the engine-private marker), or a busy lake would
    starve the periodic full forever."""
    from paimon_python_spark.paimon_import import read_paimon_snapshot
    from paimon_python_spark.paimon_lake import (
        _read_full_compaction_marker,
        compact_lake,
        compact_lake_auto,
        create_lake_table,
        write_lake_pk_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "fcdc_partial")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "STRING")],
        primary_keys=["k"],
        options={"bucket": "1", "full-compaction.delta-commits": "4"},
    )
    write_lake_pk_append(p, spark.createDataFrame([(1, "a")], "k int, v string"))
    compact_lake(p)  # FULL at snapshot 2 → marker
    assert _read_full_compaction_marker(p) == 2
    for i in range(2):
        write_lake_pk_append(p, spark.createDataFrame([(1, f"b{i}")], "k int, v string"))
    # run-count trigger fires a PARTIAL compact (snapshot 5): COMPACT
    # kind, but it must NOT move the cadence baseline
    sid = compact_lake_auto(p, trigger=2)
    assert sid is not None
    assert read_paimon_snapshot(p, sid)["commitKind"] == "COMPACT"
    assert _read_full_compaction_marker(p) == 2
    write_lake_pk_append(p, spark.createDataFrame([(1, "c")], "k int, v string"))
    # latest=6, marker=2 → 4 commits since the FULL → the cadence fires
    # even with the run trigger out of reach
    sid2 = compact_lake_auto(p, trigger=99)
    assert sid2 is not None
    assert _read_full_compaction_marker(p) == sid2
