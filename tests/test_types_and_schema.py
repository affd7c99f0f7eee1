"""Type-bridge suite — modeled on pypaimon/py4j/tests/test_data_types.py."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from paimon_python_spark import Schema
from paimon_python_spark.predicate import Predicate, PredicateBuilder
from paimon_python_spark.types import (
    pa_schema_to_spark,
    pa_type_to_spark,
    spark_schema_to_pa,
)


def test_supported_primitive_mappings():
    cases = [
        (pa.int8(), T.ByteType()),
        (pa.int16(), T.ShortType()),
        (pa.int32(), T.IntegerType()),
        (pa.int64(), T.LongType()),
        (pa.float16(), T.FloatType()),
        (pa.float32(), T.FloatType()),
        (pa.float64(), T.DoubleType()),
        (pa.string(), T.StringType()),
        (pa.bool_(), T.BooleanType()),
    ]
    for pa_t, spark_t in cases:
        assert pa_type_to_spark(pa_t) == spark_t


def test_null_type_coerces_to_string_with_warning():
    with pytest.warns(UserWarning):
        assert pa_type_to_spark(pa.null(), field_name="f0") == T.StringType()


@pytest.mark.parametrize(
    "bad",
    [
        pa.list_(pa.int32()),
        pa.map_(pa.string(), pa.int32()),
        pa.struct([("a", pa.int32())]),
        pa.decimal128(10, 2),
        pa.date32(),
        pa.timestamp("ms"),
    ],
)
def test_reference_unsupported_types_raise(bad):
    with pytest.raises(ValueError, match="Found unsupported data type"):
        pa_type_to_spark(bad, field_name="f")


def test_extended_types_allowed_when_opted_in():
    assert pa_type_to_spark(pa.list_(pa.float32()), True) == T.ArrayType(T.FloatType())
    assert pa_type_to_spark(pa.timestamp("us"), True) == T.TimestampType()
    schema = Schema(
        pa.schema([("emb", pa.list_(pa.float32()))]), options={"extended-types": "true"}
    )
    assert schema.spark_schema["emb"].dataType == T.ArrayType(T.FloatType())


def test_schema_roundtrip_json():
    s = Schema(
        pa.schema([("f0", pa.int32()), ("f1", pa.string())]),
        partition_keys=["f0"],
        primary_keys=["f0", "f1"],
        options={"bucket": "2"},
        comment="c",
    )
    s2 = Schema.from_json(s.to_json())
    assert s2.spark_schema == s.spark_schema
    assert s2.partition_keys == ["f0"]
    assert s2.primary_keys == ["f0", "f1"]
    assert s2.options == {"bucket": "2"}


def test_arrow_spark_schema_roundtrip():
    spark_schema = pa_schema_to_spark(
        pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())])
    )
    back = spark_schema_to_pa(spark_schema)
    assert back.names == ["a", "b", "c"]
    assert back.types == [pa.int64(), pa.string(), pa.float64()]


def test_pk_equals_partition_keys_rejected():
    with pytest.raises(ValueError):
        Schema(
            pa.schema([("f0", pa.int32()), ("f1", pa.string())]),
            partition_keys=["f0"],
            primary_keys=["f0"],
        )


# ---- predicate unit coverage (driver-side evaluators) ----


def test_predicate_stats_pruning_logic():
    pb = PredicateBuilder()
    stats = {"f0": {"min": 10, "max": 20, "null_count": 0, "row_count": 5}}
    assert pb.equal("f0", 15).test_by_stats(stats)
    assert not pb.equal("f0", 5).test_by_stats(stats)
    assert not pb.greater_than("f0", 20).test_by_stats(stats)
    assert pb.greater_or_equal("f0", 20).test_by_stats(stats)
    assert not pb.between("f0", 1, 9).test_by_stats(stats)
    assert pb.is_not_null("f0").test_by_stats(stats)
    assert not pb.is_null("f0").test_by_stats(stats)
    # unknown column → can't prune
    assert pb.equal("other", 1).test_by_stats(stats)


def test_predicate_partition_value_eval():
    pb = PredicateBuilder()
    assert pb.equal("dt", "p-1").test_by_value({"dt": "p-1"})
    assert not pb.equal("dt", "p-1").test_by_value({"dt": "p-2"})
    assert pb.is_in("dt", ["p-1", "p-2"]).test_by_value({"dt": "p-2"})
    # field not present → unknown → keep
    assert pb.equal("other", 1).test_by_value({"dt": "p-1"})


def test_keep_only_fields():
    pb = PredicateBuilder()
    p = pb.and_predicates([pb.equal("k", 1), pb.equal("v", 2)])
    kept = p.keep_only_fields({"k"})
    assert kept.to_sql() == "k = 1"
    # OR with a non-key branch cannot be narrowed
    p2 = pb.or_predicates([pb.equal("k", 1), pb.equal("v", 2)])
    assert p2.keep_only_fields({"k"}) is None
