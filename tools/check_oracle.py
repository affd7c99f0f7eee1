#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB at sf0.01, compare row count + column names + order-insensitive
values.

STRICT by default since r11: the driver's value hash is string-level
(CORRECTNESS_r10 flagged 6 queries whose values were numerically equal
but rendered differently — duckdb HUGEINT sums come back float64, Spark
DECIMAL sums keep trailing-zero cents), so cells are compared as
``str(value)`` exactly. Pass --tolerant for the old numeric-equality
diagnostic mode when debugging a strict failure.

Usage: python tools/check_oracle.py [--tolerant] [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(df):
    """Canonical form: columns sorted by name, rows sorted by repr."""
    import pandas as pd

    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r)), list(df.columns)


def values_equal_strict(a, b) -> tuple[bool, str]:
    """Driver-faithful compare: per-cell ``str()`` must match exactly."""
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            sa, sb = str(va), str(vb)
            if sa != sb:
                return False, (
                    f"row {i}: {sa!r} vs {sb!r} "
                    f"({type(va).__name__} vs {type(vb).__name__}) — strict "
                    "string mismatch; re-run with --tolerant to see whether "
                    "the values are numerically equal (a dtype-alignment "
                    "bug) or genuinely different (a correctness bug)"
                )
    return True, ""


def values_equal(a, b) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if va != vb:
                    if abs(va - vb) < 1e-9 * max(1.0, abs(va)):
                        return False, f"row {i}: float near-miss {va!r} vs {vb!r} (EPSILON ONLY — would fail strict hash)"
                    return False, f"row {i}: {va!r} vs {vb!r}"
            elif va != vb:
                # cross-type numeric (int64 vs int32) tolerated if equal
                try:
                    if float(va) == float(vb):
                        continue
                except (TypeError, ValueError):
                    pass
                return False, f"row {i}: {va!r} ({type(va).__name__}) vs {vb!r} ({type(vb).__name__})"
    return True, ""


def main():
    argv = [a for a in sys.argv[1:] if a != "--tolerant"]
    tolerant = "--tolerant" in sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    only = [a for a in argv if "/" not in a]

    import duckdb

    import __spark_entry__ as entrymod
    from paimon_python_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from paimon_python_spark.operators._cache import release_cached

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            release_cached()
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        va, _ = canon(sdf)
        vb, _ = canon(odf)
        cmp = values_equal if tolerant else values_equal_strict
        ok, why = cmp(va, vb)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) {why}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match the DuckDB oracle")


if __name__ == "__main__":
    main()
