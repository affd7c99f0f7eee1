#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/$PLANS_ROUND/ (default r13).

Usage: python tools/capture_plans.py <suffix: before|after> query [query ...]

Roundtrip queries execute their write/commit protocol while BUILDING
the returned DataFrame, so the captured plan is the final read plan —
the part the formatted explain can show. Plans land in
plans/<round>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from paimon_python_spark.session import configure_builder, set_spark

    total_mb = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    ) // (1024 * 1024)
    shuffle_parts = max(8, min(int(cpus), int(total_mb) // 64))
    spark = configure_builder(
        SparkSession.builder.master(f"local[{cpus}]").appName("capture_plans"),
        shuffle_partitions=shuffle_parts,
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    set_spark(spark)

    import __spark_entry__ as entrymod
    from paimon_python_spark.operators._cache import release_cached

    qs = entrymod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"!! {name}: not registered")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        finally:
            release_cached()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        joins = [
            j
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct")
            if j in plan
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                      "MapInPandas", "FlatMapGroupsInPandas")
            if p in plan
        ]
        print(f"{name}: Exchange×{n_exch} joins={joins} python={py} -> {path}")


if __name__ == "__main__":
    main()
