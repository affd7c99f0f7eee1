#!/usr/bin/env python
"""DuckDB side of the bench: run the ORACLE SQL of every bench.py
headline query on the same parquet at the same scale factor, best-of-2,
and print one JSON line — the apples-to-apples single-node comparison
for BENCH_r{N}.json.

Context for reading the ratio: DuckDB is an in-process OLAP engine with
no job-scheduling floor; Spark local[32] pays ~0.3-0.5s per query in
driver/job overhead at toy scale. That floor amortizes away on a real
cluster / larger SF — the plan-quality comparison is what matters.

Usage: python tools/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import duckdb

    from bench import HEADLINE
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()

    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            skipped.append(name)
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "duckdb_oracle_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if skipped:
        out["skipped_no_oracle"] = skipped
    print(json.dumps(out))


if __name__ == "__main__":
    main()
