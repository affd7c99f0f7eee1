"""Analysis-time smoke test over EVERY registered ``queries()`` entry
against the live driver fixtures at sf0.001.

Motivation (round-2 postmortem): the driver regenerated
``events.parquet`` with a different parquet physical type for ``ts``
(timestamp[us] instead of TIMESTAMP(NANOS)), and every event-time query
failed at *analysis* time — while the full unit suite stayed green,
because unit tests synthesize their fixtures in-test.  This test closes
that gap: it builds each registered query's plan against the real
testdata files and forces analysis via ``df.schema`` (plus a
``.explain`` no-op), so any schema drift in the fixtures breaks CI
immediately.  No job execution for plain read queries — analysis only —
so the whole sweep stays cheap even as the registry grows.

Note: a handful of entries (paimon_* roundtrips, trained-IVF) do real
work *while building* their DataFrame (write/commit protocol, k-means
fit).  That is inherent to their contract; at sf0.001 each stays well
under a second.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata not present at {SF_DIR}"
)


def _query_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@needs_testdata
@pytest.mark.parametrize("name", _query_names())
def test_query_analyzes_against_live_fixtures(spark, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    # forcing .schema runs Catalyst analysis (column resolution, type
    # checking) against the real fixture schemas without executing a job
    assert df.schema is not None
    assert len(df.schema.fields) > 0


@needs_testdata
def test_entry_flagship_analyzes(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle_or_documented_exemption():
    """Every queries() entry should have an oracle_sql() twin; genuinely
    non-SQL-expressible ops are allowed to omit it but must say why in
    their docstring (the driver then records a weaker rows-only check)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unexplained = []
    for name, fn in qs.items():
        if name in oracles:
            continue
        doc = (fn.__doc__ or "").lower()
        if "oracle" not in doc:
            unexplained.append(name)
    assert not unexplained, (
        f"queries without oracle_sql() and without a docstring explaining "
        f"why: {unexplained}"
    )
