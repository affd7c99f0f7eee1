"""The driver-side murmur3 replica must match F.hash bit-for-bit for
every supported key type — any divergence silently breaks bucket
pruning correctness."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paimon_python_spark.bucketing import bucket_of, spark_hash

CASES = [
    ((5,), [T.IntegerType()]),
    ((-42,), [T.IntegerType()]),
    ((0,), [T.IntegerType()]),
    ((123456789012,), [T.LongType()]),
    ((-1,), [T.LongType()]),
    (("hello world",), [T.StringType()]),
    (("",), [T.StringType()]),
    (("héllo ünïcode",), [T.StringType()]),
    ((3.14,), [T.DoubleType()]),
    ((-0.0,), [T.DoubleType()]),
    ((True,), [T.BooleanType()]),
    ((False,), [T.BooleanType()]),
    ((None,), [T.IntegerType()]),
    ((datetime.date(2024, 3, 1),), [T.DateType()]),
    ((7, "abc", 99999999999), [T.IntegerType(), T.StringType(), T.LongType()]),
    ((None, "x"), [T.LongType(), T.StringType()]),
]


@pytest.mark.parametrize("values,dtypes", CASES)
def test_matches_spark_hash(spark, values, dtypes):
    schema = T.StructType(
        [T.StructField(f"c{i}", dt) for i, dt in enumerate(dtypes)]
    )
    df = spark.createDataFrame([values], schema)
    expected = df.select(
        F.hash(*[f.name for f in schema.fields]).alias("h"),
        F.pmod(F.hash(*[f.name for f in schema.fields]), F.lit(16)).alias("b"),
    ).collect()[0]
    assert spark_hash(list(values), dtypes) == expected.h
    assert bucket_of(list(values), dtypes, 16) == expected.b
