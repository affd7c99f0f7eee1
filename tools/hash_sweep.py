#!/usr/bin/env python
"""STRICT replica of the driver's value-hash comparison.

The r10 driver gate proved the hash is string-level: DuckDB's
``sum(BIGINT)`` comes back HUGEINT -> pandas float64 (``'374250.0'``)
while Spark returns int64 (``'374250'``); a Spark ``DECIMAL`` sum
renders ``'223001.00'`` while DuckDB's float64 renders ``'223001.0'``.
Values equal, strings differ, hash red. ``tools/check_oracle.py``
tolerates cross-type numeric equality, so it stayed green while the
driver flagged 6 queries in CORRECTNESS_r10.json.

This tool compares per-cell ``str()`` EXACTLY (no numeric tolerance,
no cross-type casts) and additionally WARNs when the two sides'
pandas dtypes differ even if every current string matches (a lucky
value set away from red).

Usage: python tools/hash_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def canon_rows(df):
    df = df[sorted(df.columns)]
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows), list(df.columns), {c: str(t) for c, t in df.dtypes.items()}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

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
    failures, warns = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
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
        sa, cols, sdt = canon_rows(sdf)
        oa, _, odt = canon_rows(odf)
        dt_mismatch = {
            c: (sdt[c], odt[c]) for c in cols
            if sdt[c] != odt[c]
            # object-vs-object (str/Decimal/date) can't be told apart
            # by dtype alone; string compare below is the arbiter
        }
        if len(sa) != len(oa):
            failures.append(name)
            print(f"FAIL {name}: rows {len(sa)} vs {len(oa)}")
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(sa, oa)):
            if ra != rb:
                diff = [
                    (cols[j], ra[j], rb[j])
                    for j in range(len(cols))
                    if ra[j] != rb[j]
                ]
                bad = (i, diff[:3])
                break
        if bad is not None:
            failures.append(name)
            print(f"FAIL {name}: row {bad[0]} strict-str diff {bad[1]} ({time.time()-t0:.1f}s)")
        elif dt_mismatch:
            warns.append(name)
            print(f"WARN {name}: str-equal but dtypes differ {dt_mismatch} ({time.time()-t0:.1f}s)")
        else:
            print(f"OK   {name}: {len(sa)} rows ({time.time()-t0:.1f}s)")

    print()
    if warns:
        print(f"{len(warns)} WARNINGS (dtype divergence, currently lucky): {warns}")
    if failures:
        print(f"{len(failures)} STRICT FAILURES: {failures}")
        sys.exit(1)
    print("all queries strict-str match the DuckDB oracle")


if __name__ == "__main__":
    main()
