"""Parity tests for the Arrow-native driver-local frame builder.

r12 optimization: ``local_df`` constructs metadata frames through
``spark.createDataFrame(pyarrow.Table)`` so that evaluating them never
touches a Python worker. These tests pin the Arrow path to the classic
pickled-row path bit-for-bit across the value types the engine's call
sites use (strings, ints, binary, arrays, structs, maps, timestamps,
decimals, nulls), plus the empty-frame and fallback behaviors.
"""

import datetime
import decimal

from pyspark.sql import Row
from pyspark.sql import types as T

from paimon_python_spark._localdf import _arrow_local_df, local_df


def _classic(spark, rows, schema):
    n = max(1, len(rows)) if rows else 1
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=min(n, 4)), schema
    )


def _assert_parity(spark, rows, schema):
    got = local_df(spark, rows, schema)
    want = _classic(spark, rows, schema)
    assert got.schema == want.schema
    assert got.collect() == want.collect()
    return got


def test_scalar_and_binary_parity(spark):
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BinaryType()),
            T.StructField("f", T.BooleanType()),
        ]
    )
    rows = [
        ("a", 1, 2**40, 1.5, b"\x00\xff", True),
        (None, None, None, None, None, None),
        ("", 0, -1, float("inf"), bytearray(b"xy"), False),
    ]
    df = _assert_parity(spark, rows, schema)
    # the whole point: no Python-evaluated node anywhere in the lineage
    assert "Python" not in df._jdf.queryExecution().executedPlan().toString()


def test_nested_parity(spark):
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("positions", T.ArrayType(T.LongType())),
            T.StructField(
                "st",
                T.StructType(
                    [
                        T.StructField("x", T.IntegerType()),
                        T.StructField("y", T.StringType()),
                    ]
                ),
            ),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    rows = [
        ("f1", [1, 5, 9], Row(x=1, y="a"), {"k": 1, "j": 2}),
        ("f2", [], (2, None), {}),
        ("f3", None, None, None),
    ]
    _assert_parity(spark, rows, schema)


def test_temporal_decimal_parity(spark):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("dt", T.DateType()),
            T.StructField("dec", T.DecimalType(12, 2)),
        ]
    )
    rows = [
        (
            datetime.datetime(2024, 3, 1, 12, 30, 45, 123456),
            datetime.date(2024, 3, 1),
            decimal.Decimal("1234.56"),
        ),
        (None, None, None),
    ]
    _assert_parity(spark, rows, schema)


def test_ddl_string_schema(spark):
    rows = [(1, [0.5, 1.5], 2.0), (2, None, None)]
    _assert_parity(spark, rows, "cell int, cvec array<double>, half_sq double")


def test_empty_frame(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.ArrayType(T.IntegerType())),
        ]
    )
    df = local_df(spark, [], schema)
    assert df.schema == schema
    assert df.collect() == []
    assert df.count() == 0


def test_dict_rows(spark):
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    rows = [{"a": 1, "b": "x"}, {"a": None, "b": None}]
    got = local_df(spark, rows, schema)
    assert [(r.a, r.b) for r in got.collect()] == [(1, "x"), (None, None)]


def test_fan_out_keeps_slices(spark):
    rows = [(f"f{i}",) for i in range(3)]
    df = local_df(spark, rows, "f string", fan_out=True)
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r.f for r in df.collect()) == ["f0", "f1", "f2"]


def test_fallback_on_unconvertible(spark):
    # a value Arrow cannot coerce for the declared type falls back to
    # the classic path instead of raising
    class Weird:
        def __str__(self):
            return "w"

    schema = T.StructType([T.StructField("s", T.StringType())])
    try:
        df = local_df(spark, [(Weird(),)], schema)
        rows = df.collect()
        assert len(rows) == 1
    except Exception:
        # classic path may also reject it — either way local_df must
        # behave exactly like createDataFrame would, so only assert
        # that the arrow path did not change the failure mode
        import pytest

        with pytest.raises(Exception):
            _classic(spark, [(Weird(),)], schema).collect()
