#!/usr/bin/env python
"""Per-query profiling harness for optimization rounds (guide §1).

Runs named headline queries exactly like bench.py (same session confs,
same noop sink, same warm pass), but additionally:

- labels every Spark job with the query name + run index
  (``setJobDescription``), and parses the event log afterwards into a
  per-query job breakdown (#jobs, per-job wall time, task time,
  shuffle bytes) — the local-mode stand-in for the Spark UI;
- optionally wraps one run in cProfile to split DRIVER-side Python cost
  (metadata/commit/harvest work, py4j chatter) from executor time.

Usage:
  python tools/profile_bench.py [--profile] [--runs N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/spark-events-profile"


def build_session(cpus: str, sf_dir: str):
    from pyspark.sql import SparkSession

    from paimon_python_spark.session import configure_builder, set_spark

    os.makedirs(EVENT_DIR, exist_ok=True)
    total_mb = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    ) // (1024 * 1024)
    shuffle_parts = max(8, min(int(cpus), int(total_mb) // 64))
    spark = (
        configure_builder(
            SparkSession.builder.master(f"local[{cpus}]").appName("profile_bench"),
            shuffle_partitions=shuffle_parts,
        )
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVENT_DIR)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    set_spark(spark)
    return spark


def parse_event_log(app_id: str):
    """Job rows: (description, wall_ms, n_stages, task_time_ms,
    shuffle_read_mb, shuffle_write_mb, n_tasks)."""
    path = os.path.join(EVENT_DIR, app_id)
    if not os.path.exists(path):
        cand = [
            p
            for p in os.listdir(EVENT_DIR)
            if app_id in p
        ]
        if not cand:
            return []
        path = os.path.join(EVENT_DIR, cand[0])
    if os.path.isdir(path):
        # Spark 4 rolling event log: eventlog_v2_<app>/events_N_<app>[.codec]
        parts = sorted(
            p for p in os.listdir(path) if p.startswith("events_")
        )
        if not parts:
            return []
        path = os.path.join(path, parts[0])
    jobs = {}
    stage_to_job = {}
    stage_metrics = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties", {})
                desc = props.get("spark.job.description", "")
                call = props.get("callSite.short", "")
                if call:
                    desc = f"{desc} @{call}" if desc else call
                jobs[jid] = {
                    "desc": desc,
                    "start": ev["Submission Time"],
                    "end": None,
                    "stages": ev.get("Stage IDs", []),
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif kind == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                sm = stage_metrics.setdefault(
                    sid, {"task_ms": 0, "sr": 0, "sw": 0, "n": 0}
                )
                sm["task_ms"] += (m.get("Executor Run Time") or 0)
                sm["sr"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                sm["sw"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                sm["n"] += 1
    rows = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["end"] is None:
            continue
        t_ms = sr = sw = nt = 0
        for sid in j["stages"]:
            sm = stage_metrics.get(sid)
            if sm:
                t_ms += sm["task_ms"]
                sr += sm["sr"]
                sw += sm["sw"]
                nt += sm["n"]
        rows.append(
            {
                "job": jid,
                "desc": j["desc"],
                "wall_ms": j["end"] - j["start"],
                "n_stages": len(j["stages"]),
                "task_ms": t_ms,
                "shuffle_read_kb": sr // 1024,
                "shuffle_write_kb": sw // 1024,
                "n_tasks": nt,
            }
        )
    return rows


def main():
    args = [a for a in sys.argv[1:]]
    do_profile = "--profile" in args
    if do_profile:
        args.remove("--profile")
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(cpus, sf_dir)
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entrymod
    from paimon_python_spark.operators._cache import release_cached

    qs = entrymod.queries()

    # bench-identical generic warm
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    results = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"!! {name}: not registered")
            continue
        # per-family warm at sf0.001 (bench does the same)
        if os.path.isdir(warm_dir):
            spark.sparkContext.setJobDescription(f"warm::{name}")
            try:
                fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass
            release_cached()
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name}::run{r}")
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
            release_cached()
        if do_profile:
            import cProfile
            import pstats

            spark.sparkContext.setJobDescription(f"{name}::cprof")
            pr = cProfile.Profile()
            pr.enable()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            pr.disable()
            release_cached()
            st = pstats.Stats(pr)
            st.sort_stats("cumulative")
            print(f"\n==== cProfile {name} (top 30 cumulative) ====")
            st.print_stats(30)
        results[name] = times
        print(f"{name}: {[round(t, 3) for t in times]}")
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    time.sleep(1.0)
    rows = parse_event_log(app_id)
    print("\n==== per-job breakdown (from event log) ====")
    cur = None
    for row in rows:
        d = row["desc"]
        qname = d.split("::")[0] if "::" in d else d
        if qname != cur:
            cur = qname
            print(f"\n-- {d}")
        print(
            f"  job {row['job']:>4} wall={row['wall_ms']:>6}ms stages={row['n_stages']} "
            f"tasks={row['n_tasks']:>4} taskTime={row['task_ms']:>7}ms "
            f"sr={row['shuffle_read_kb']}KB sw={row['shuffle_write_kb']}KB  "
            f"{d.split('::')[-1] if '::' in d else ''}"
        )
    # per-query totals
    print("\n==== per-query totals ====")
    agg = {}
    for row in rows:
        d = row["desc"]
        if "::" not in d:
            continue
        qname, run = d.rsplit("::", 1)
        a = agg.setdefault((qname, run), {"jobs": 0, "wall": 0, "task": 0})
        a["jobs"] += 1
        a["wall"] += row["wall_ms"]
        a["task"] += row["task_ms"]
    for (qname, run), a in agg.items():
        print(
            f"  {qname} {run}: {a['jobs']} jobs, sum-wall {a['wall']}ms, "
            f"task-time {a['task']}ms"
        )


if __name__ == "__main__":
    main()
