"""All 16 predicate ops against append AND primary-key tables, expected
values computed as pandas row-slices — modeled on the reference's
pypaimon/py4j/tests/test_preicates.py (F2 fixture)."""

import pandas as pd
import pyarrow as pa
import pytest

from paimon_python_spark import Schema

F2 = pa.schema([("f0", pa.int64()), ("f1", pa.string())])
DATA = pd.DataFrame({"f0": [1, 2, 3, 4, 5], "f1": ["abc", "abbc", "bc", "d", None]})


@pytest.fixture(params=["append", "pk"])
def table(request, catalog):
    if request.param == "append":
        schema = Schema(F2)
    else:
        schema = Schema(
            pa.schema([pa.field("f0", pa.int64(), False), ("f1", pa.string())]),
            primary_keys=["f0"],
            options={"bucket": "1"},
        )
    name = f"default.t_{request.param}"
    catalog.create_table(name, schema, False)
    t = catalog.get_table(name)
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(DATA)
    c.commit(w.prepare_commit())
    w.close()
    c.close()
    return t


def _read(table, pred):
    rb = table.new_read_builder().with_filter(pred)
    return (
        rb.new_read()
        .to_pandas(rb.new_scan().plan().splits())
        .sort_values("f0")
        .reset_index(drop=True)
    )


CASES = [
    ("equal", lambda pb: pb.equal("f0", 1), [1]),
    ("not_equal_int", lambda pb: pb.not_equal("f0", 1), [2, 3, 4, 5]),
    # not_equal on a nullable column drops the NULL row too (3-valued
    # logic, test_pynative_reader.py:140-153)
    ("not_equal_null", lambda pb: pb.not_equal("f1", "abc"), [2, 3, 4]),
    ("less_than", lambda pb: pb.less_than("f0", 3), [1, 2]),
    ("less_or_equal", lambda pb: pb.less_or_equal("f0", 3), [1, 2, 3]),
    ("greater_than", lambda pb: pb.greater_than("f0", 3), [4, 5]),
    ("greater_or_equal", lambda pb: pb.greater_or_equal("f0", 3), [3, 4, 5]),
    ("is_null", lambda pb: pb.is_null("f1"), [5]),
    ("is_not_null", lambda pb: pb.is_not_null("f1"), [1, 2, 3, 4]),
    ("startswith", lambda pb: pb.startswith("f1", "ab"), [1, 2]),
    ("endswith", lambda pb: pb.endswith("f1", "bc"), [1, 2, 3]),
    ("contains", lambda pb: pb.contains("f1", "bb"), [2]),
    ("is_in", lambda pb: pb.is_in("f0", [1, 4]), [1, 4]),
    ("is_not_in", lambda pb: pb.is_not_in("f0", [1, 4]), [2, 3, 5]),
    ("is_not_in_null", lambda pb: pb.is_not_in("f1", ["abc"]), [2, 3, 4]),
    ("between", lambda pb: pb.between("f0", 2, 4), [2, 3, 4]),
    (
        "and",
        lambda pb: pb.and_predicates([pb.greater_than("f0", 1), pb.less_than("f0", 4)]),
        [2, 3],
    ),
    (
        "or",
        lambda pb: pb.or_predicates([pb.equal("f0", 1), pb.equal("f0", 5)]),
        [1, 5],
    ),
]


@pytest.mark.parametrize("name,build,expected", CASES, ids=[c[0] for c in CASES])
def test_predicate(table, name, build, expected):
    pb = table.new_read_builder().new_predicate_builder()
    result = _read(table, build(pb))
    assert list(result["f0"]) == expected


def test_predicate_to_sql_roundtrip_duckdb(table):
    """Every predicate's SQL rendering agrees with the Spark result when
    DuckDB runs it over the same raw data (mini oracle gate)."""
    import duckdb

    con = duckdb.connect()
    con.register("t", DATA)
    pb = table.new_read_builder().new_predicate_builder()
    for name, build, expected in CASES:
        pred = build(pb)
        rows = con.execute(
            f"SELECT f0 FROM t WHERE {pred.to_sql()} ORDER BY f0"
        ).fetchall()
        assert [r[0] for r in rows] == expected, name


def test_all_types_equality(catalog):
    # F3 (test_preicates.py:123-156): equality on every supported type
    schema = Schema(
        pa.schema(
            [
                ("_tinyint", pa.int8()),
                ("_smallint", pa.int16()),
                ("_int", pa.int32()),
                ("_bigint", pa.int64()),
                ("_float32", pa.float32()),
                ("_double", pa.float64()),
                ("_string", pa.string()),
                ("_boolean", pa.bool_()),
            ]
        )
    )
    catalog.create_table("default.types", schema, False)
    t = catalog.get_table("default.types")
    df = pd.DataFrame(
        {
            "_tinyint": [1, 2],
            "_smallint": [10, 20],
            "_int": [100, 200],
            "_bigint": [1000, 2000],
            "_float32": [1.0, 2.0],
            "_double": [1.0, 2.0],
            "_string": ["A", "B"],
            "_boolean": [True, False],
        }
    )
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(df)
    c.commit(w.prepare_commit())
    pb = t.new_read_builder().new_predicate_builder()
    for col, lit in [
        ("_tinyint", 1),
        ("_smallint", 10),
        ("_int", 100),
        ("_bigint", 1000),
        ("_float32", 1.0),
        ("_double", 1.0),
        ("_string", "A"),
        ("_boolean", True),
    ]:
        rb = t.new_read_builder().with_filter(pb.equal(col, lit))
        assert len(rb.new_read().to_pandas()) == 1, col


def test_stats_file_skipping(catalog):
    """Two commits with disjoint f0 ranges → an equality predicate plans
    only one split (manifest min/max skipping, SURVEY §4)."""
    catalog.create_table("default.t", Schema(F2), False)
    t = catalog.get_table("default.t")
    for lo in (0, 100):
        wb = t.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        w.write_pandas(pd.DataFrame({"f0": [lo + 1, lo + 2], "f1": ["a", "b"]}))
        c.commit(w.prepare_commit())
        w.close()
        c.close()
    pb = t.new_read_builder().new_predicate_builder()
    rb = t.new_read_builder().with_filter(pb.equal("f0", 101))
    splits = rb.new_scan().plan().splits()
    assert len(splits) == 1
    assert list(rb.new_read().to_pandas(splits)["f0"]) == [101]


def test_equality_fields_collection():
    """equality_fields(): only equal/in leaves — the shapes a file
    index can prune — are collected, through and/or trees."""
    from paimon_python_spark.predicate import PredicateBuilder
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    pb = PredicateBuilder(
        StructType(
            [
                StructField("a", IntegerType()),
                StructField("b", StringType()),
                StructField("c", IntegerType()),
            ]
        )
    )
    p = pb.and_predicates(
        [
            pb.equal("a", 1),
            pb.or_predicates(
                [pb.is_in("b", ["x", "y"]), pb.greater_than("c", 5)]
            ),
        ]
    )
    assert p.equality_fields() == {"a", "b"}
    assert pb.between("c", 1, 2).equality_fields() == set()
    assert pb.less_than("a", 9).equality_fields() == set()
    assert pb.is_in("c", [1]).equality_fields() == {"c"}


def test_large_in_list_single_expr(spark):
    """IN lists past the SQL-compilation threshold (>16 scalars) produce
    the same rows and the same Catalyst ``In`` node as ``Column.isin``
    — including strings needing quote escaping — while costing ONE py4j
    round-trip instead of one per literal."""
    from paimon_python_spark.predicate import PredicateBuilder

    df = spark.createDataFrame(
        [(i, f"s{i}" if i % 3 else "o'q\\x") for i in range(40)], "f0 long, f1 string"
    )
    pb = PredicateBuilder(["f0", "f1"])

    big_ints = pb.is_in("f0", list(range(2, 25)))
    got = sorted(r.f0 for r in df.filter(big_ints.to_column()).collect())
    assert got == list(range(2, 25))
    # same Catalyst node as the isin form -> pushdown unchanged
    plan = (
        df.filter(big_ints.to_column())._jdf.queryExecution().optimizedPlan().toString()
    )
    ref_plan = (
        df.filter(df.f0.isin(list(range(2, 25))))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan == ref_plan

    tricky = ["o'q\\x"] + [f"s{i}" for i in range(1, 20)]
    big_strs = pb.is_in("f1", tricky)
    got_s = {r.f0 for r in df.filter(big_strs.to_column()).collect()}
    ref_s = {r.f0 for r in df.filter(df.f1.isin(tricky)).collect()}
    assert got_s == ref_s and 0 in got_s  # the escaped-quote row matched

    not_in = pb.is_not_in("f0", list(range(0, 30)))
    assert sorted(r.f0 for r in df.filter(not_in.to_column()).collect()) == list(
        range(30, 40)
    )
