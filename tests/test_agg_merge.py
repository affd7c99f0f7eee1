"""Aggregation merge-engine function surface — the full Paimon list
(paimon.apache.org "Aggregation" merge engine; the reference delegates
the engine to its bundled JVM writer, pypaimon/api/table_write.py:27-48,
so these tests pin the table-format semantics directly): container
folds (collect / merge_map / nested_update), sketch unions
(rbm32 / rbm64 / hll_sketch), count/product retraction, and the
non-retractable-field guard."""

import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paimon_python_spark import Schema
from paimon_python_spark.roaring import (
    deserialize_roaring32,
    deserialize_roaring64,
    serialize_roaring32,
    serialize_roaring64,
)

KIND = "_kind"


def _write(table, rows, spark_schema, kinds=None):
    """Commit rows (list of tuples) with optional per-row RowKinds."""
    from paimon_python_spark.session import get_spark

    wb = table.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    if kinds is None:
        w.write_dataframe(get_spark().createDataFrame(rows, spark_schema))
    else:
        full = T.StructType(
            list(spark_schema.fields) + [T.StructField(KIND, T.IntegerType(), False)]
        )
        w.write_dataframe(
            get_spark().createDataFrame(
                [r + (k,) for r, k in zip(rows, kinds)], full
            ),
            row_kind_col=KIND,
        )
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def _agg_table(catalog, name, spark_schema, field_opts):
    catalog.create_table(
        f"default.{name}",
        Schema(
            spark_schema,
            primary_keys=["k"],
            options={"bucket": "1", "merge-engine": "aggregation", **field_opts},
        ),
        False,
    )
    return catalog.get_table(f"default.{name}")


def _read(table):
    return table.new_read_builder().new_read().to_df()


def test_sum_count_retract(catalog):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.IntegerType()),
            T.StructField("n", T.LongType()),
        ]
    )
    t = _agg_table(
        catalog,
        "agg_ret",
        st,
        {
            "fields.v.aggregate-function": "sum",
            "fields.n.aggregate-function": "count",
        },
    )
    _write(t, [(1, 5, 9), (1, 3, 9), (2, 7, None)], st)
    # retract one of k=1's adds; k=2 gets another add
    _write(t, [(1, 3, 9), (2, 1, 4)], st, kinds=[3, 0])
    out = {r["k"]: r for r in _read(t).collect()}
    assert out[1]["v"] == 5 and out[1]["n"] == 1  # 2 adds - 1 retract
    assert out[2]["v"] == 8 and out[2]["n"] == 1  # None never counted
    # sum over int field keeps the declared int dtype
    assert dict(_read(t).dtypes)["v"] == "int"


def test_key_of_only_retracts_vanishes(catalog):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.IntegerType())]
    )
    t = _agg_table(catalog, "agg_gone", st, {"fields.v.aggregate-function": "sum"})
    _write(t, [(1, 5)], st, kinds=[3])
    _write(t, [(2, 7)], st)
    rows = _read(t).collect()
    assert [r["k"] for r in rows] == [2]


def test_product_retract_divides(catalog):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("p", T.DoubleType())]
    )
    t = _agg_table(catalog, "agg_prod_ret", st, {"fields.p.aggregate-function": "product"})
    _write(t, [(1, 2.0), (1, 6.0)], st)
    _write(t, [(1, 3.0)], st, kinds=[3])
    assert _read(t).collect()[0]["p"] == pytest.approx(4.0)


def test_first_non_null_value(catalog):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.StringType())]
    )
    t = _agg_table(
        catalog, "agg_fnn", st, {"fields.v.aggregate-function": "first_non_null_value"}
    )
    _write(t, [(1, None)], st)
    _write(t, [(1, "early")], st)
    _write(t, [(1, "late")], st)
    assert _read(t).collect()[0]["v"] == "early"


def test_listagg_delimiter(catalog):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.StringType())]
    )
    t = _agg_table(
        catalog,
        "agg_lga",
        st,
        {
            "fields.v.aggregate-function": "listagg",
            "fields.v.list-agg-delimiter": "|",
        },
    )
    _write(t, [(1, "a")], st)
    _write(t, [(1, "b")], st)
    assert _read(t).collect()[0]["v"] == "a|b"


def test_collect_retract_removes_one_occurrence(catalog):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.ArrayType(T.IntegerType())),
        ]
    )
    t = _agg_table(catalog, "agg_coll", st, {"fields.v.aggregate-function": "collect"})
    _write(t, [(1, [1, 2]), (1, [2, 3])], st)
    _write(t, [(1, [2])], st, kinds=[3])
    got = sorted(_read(t).collect()[0]["v"])
    assert got == [1, 2, 3]  # one of the two 2s removed, not both


def test_collect_distinct(catalog):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.ArrayType(T.IntegerType())),
        ]
    )
    t = _agg_table(
        catalog,
        "agg_colld",
        st,
        {"fields.v.aggregate-function": "collect", "fields.v.distinct": "true"},
    )
    _write(t, [(1, [1, 2, 2]), (1, [2, 3])], st)
    _write(t, [(1, [3])], st, kinds=[3])
    assert sorted(_read(t).collect()[0]["v"]) == [1, 2]


def test_merge_map_seq_order_and_retract(catalog):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.MapType(T.StringType(), T.IntegerType())),
        ]
    )
    t = _agg_table(catalog, "agg_mm", st, {"fields.v.aggregate-function": "merge_map"})
    _write(t, [(1, {"a": 1, "b": 5})], st)
    _write(t, [(1, {"a": 2})], st)  # newest a wins
    _write(t, [(1, {"b": 0})], st, kinds=[3])  # retract removes key b
    assert _read(t).collect()[0]["v"] == {"a": 2}


def test_nested_update_upsert_and_retract(catalog):
    elem = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("rows", T.ArrayType(elem)),
        ]
    )
    t = _agg_table(
        catalog,
        "agg_nu",
        st,
        {
            "fields.rows.aggregate-function": "nested_update",
            "fields.rows.nested-key": "id",
        },
    )
    _write(t, [(1, [(1, "x"), (2, "y")])], st)
    _write(t, [(1, [(1, "x2")])], st)  # upsert id=1
    _write(t, [(1, [(2, None)])], st, kinds=[3])  # delete id=2
    got = _read(t).collect()[0]["rows"]
    assert [(r["id"], r["v"]) for r in got] == [(1, "x2")]


def test_nested_update_requires_nested_key(catalog):
    elem = T.StructType([T.StructField("id", T.IntegerType())])
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("rows", T.ArrayType(elem)),
        ]
    )
    t = _agg_table(
        catalog, "agg_nu_bad", st, {"fields.rows.aggregate-function": "nested_update"}
    )
    _write(t, [(1, [(1,)])], st)
    with pytest.raises(ValueError, match="nested-key"):
        _read(t).collect()


def test_rbm32_rbm64_union(catalog):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("b32", T.BinaryType()),
            T.StructField("b64", T.BinaryType()),
        ]
    )
    t = _agg_table(
        catalog,
        "agg_rbm",
        st,
        {
            "fields.b32.aggregate-function": "rbm32",
            "fields.b64.aggregate-function": "rbm64",
        },
    )
    _write(
        t,
        [(1, bytearray(serialize_roaring32([1, 5])), bytearray(serialize_roaring64([1, 2**40])))],
        st,
    )
    _write(
        t,
        [(1, bytearray(serialize_roaring32([5, 9])), bytearray(serialize_roaring64([7])))],
        st,
    )
    row = _read(t).collect()[0]
    assert list(deserialize_roaring32(bytes(row["b32"]))) == [1, 5, 9]
    assert list(deserialize_roaring64(bytes(row["b64"]))) == [1, 7, 2**40]


def test_hll_sketch_union(catalog, spark):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("h", T.BinaryType())]
    )
    t = _agg_table(catalog, "agg_hll", st, {"fields.h.aggregate-function": "hll_sketch"})
    sk1 = spark.range(1000).agg(F.hll_sketch_agg("id")).collect()[0][0]
    sk2 = spark.range(500, 1500).agg(F.hll_sketch_agg("id")).collect()[0][0]
    _write(t, [(1, bytearray(sk1))], st)
    _write(t, [(1, bytearray(sk2))], st)
    merged = bytes(_read(t).collect()[0]["h"])
    est = (
        spark.createDataFrame([(merged,)], "h binary")
        .select(F.hll_sketch_estimate("h"))
        .collect()[0][0]
    )
    assert abs(est - 1500) / 1500 < 0.05


def test_all_null_inputs_merge_to_null_not_empty(catalog, spark):
    """Paimon's container/listagg accumulators stay NULL until the
    first non-null input: a key whose rows are all NULL for the column
    merges to NULL, not []/{}/'' (the fold-init must not leak)."""
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("arr", T.ArrayType(T.StringType())),
            T.StructField("mp", T.MapType(T.StringType(), T.IntegerType())),
            T.StructField("lg", T.StringType()),
        ]
    )
    t = _agg_table(
        catalog,
        "agg_nulls",
        st,
        {
            "fields.arr.aggregate-function": "collect",
            "fields.mp.aggregate-function": "merge_map",
            "fields.lg.aggregate-function": "listagg",
        },
    )
    _write(t, [(1, None, None, None), (2, ["x"], {"a": 1}, "s")], st)
    _write(t, [(1, None, None, None)], st)
    rows = {r["k"]: r for r in _read(t).collect()}
    assert rows[1]["arr"] is None
    assert rows[1]["mp"] is None
    assert rows[1]["lg"] is None
    assert rows[2]["arr"] == ["x"] and rows[2]["mp"] == {"a": 1}
    assert rows[2]["lg"] == "s"


def test_theta_sketch_union(catalog):
    """theta_sketch union through the merge engine: shard sketches stay
    exact below k=4096, so the merged estimate equals the true distinct
    count; overlap dedups through the union like the JVM's
    FieldThetaSketchAgg (DataSketches set union)."""
    import numpy as np

    from paimon_python_spark import theta_sketch as ts

    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("th", T.BinaryType())]
    )
    t = _agg_table(
        catalog, "agg_theta", st, {"fields.th.aggregate-function": "theta_sketch"}
    )
    _write(t, [(1, bytearray(ts.sketch_of_longs(np.arange(0, 700))))], st)
    _write(t, [(1, bytearray(ts.sketch_of_longs(np.arange(500, 1200))))], st)
    _write(t, [(2, bytearray(ts.sketch_of_longs(np.array([], dtype=np.int64))))], st)
    rows = {r["k"]: r["th"] for r in _read(t).collect()}
    assert ts.estimate_theta(bytes(rows[1])) == 1200.0
    assert ts.estimate_theta(bytes(rows[2])) == 0.0
    # theta is non-retractable in Paimon — the generic guard applies
    _write(t, [(1, bytearray(ts.sketch_of_longs(np.arange(3))))], st, kinds=[3])
    with pytest.raises(Exception, match="does not support retraction"):
        _read(t).collect()


def test_non_retractable_guard_and_ignore_retract(catalog):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.IntegerType())]
    )
    t = _agg_table(catalog, "agg_guard", st, {"fields.v.aggregate-function": "max"})
    _write(t, [(1, 5)], st)
    _write(t, [(1, 5)], st, kinds=[3])
    with pytest.raises(Exception, match="does not support retraction"):
        _read(t).collect()
    # same shape with ignore-retract: retract row is dropped, max stands
    t2 = _agg_table(
        catalog,
        "agg_guard_ok",
        st,
        {
            "fields.v.aggregate-function": "max",
            "fields.v.ignore-retract": "true",
        },
    )
    _write(t2, [(1, 5)], st)
    _write(t2, [(1, 5)], st, kinds=[3])
    assert _read(t2).collect()[0]["v"] == 5


def test_unknown_agg_function_rejected(catalog):
    st = T.StructType(
        [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.IntegerType())]
    )
    t = _agg_table(catalog, "agg_bad_fn", st, {"fields.v.aggregate-function": "median"})
    _write(t, [(1, 1)], st)
    with pytest.raises(ValueError, match="aggregate-function"):
        _read(t).collect()


def test_roaring64_codec_roundtrip():
    vals = [0, 1, 2**16, 2**32 - 1, 2**32, 2**40 + 3, 2**63, 2**64 - 1]
    assert list(deserialize_roaring64(serialize_roaring64(vals))) == sorted(vals)
    assert list(deserialize_roaring64(serialize_roaring64([]))) == []
    with pytest.raises(ValueError):
        serialize_roaring64([-1])


def test_partial_update_sequence_group_aggregation(catalog):
    """Paimon's sequence-group aggregation: a partial-update column
    with fields.<c>.aggregate-function folds with the aggregate instead
    of last-non-null; plain columns keep partial-update semantics."""
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("total", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("g", T.IntegerType()),
        ]
    )
    catalog.create_table(
        "default.pu_agg",
        Schema(
            st,
            primary_keys=["k"],
            options={
                "bucket": "1",
                "merge-engine": "partial-update",
                "fields.g.sequence-group": "total,name",
                "fields.total.aggregate-function": "sum",
            },
        ),
        False,
    )
    t = catalog.get_table("default.pu_agg")
    _write(t, [(1, 10, "a", 1)], st)
    _write(t, [(1, 5, None, 2)], st)   # total accumulates, name keeps 'a'
    _write(t, [(1, None, "b", 3)], st)  # null adds nothing, name updates
    row = _read(t).collect()[0]
    assert row["total"] == 15 and row["name"] == "b"


def test_partial_update_container_agg_rejected(catalog):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.ArrayType(T.IntegerType())),
        ]
    )
    catalog.create_table(
        "default.pu_bad",
        Schema(
            st,
            primary_keys=["k"],
            options={
                "bucket": "1",
                "merge-engine": "partial-update",
                "fields.v.aggregate-function": "collect",
            },
        ),
        False,
    )
    t = catalog.get_table("default.pu_bad")
    _write(t, [(1, [1])], st)
    with pytest.raises(ValueError, match="partial-update"):
        _read(t).collect()
