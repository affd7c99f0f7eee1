"""``rowkind.field`` table option — Paimon's RowKindGenerator parity.

A declared user column carries the row kind (paimon.apache.org
CoreOptions ``rowkind.field``; RowKindGenerator accepts the short
strings +I/-U/+U/-D on a string column or the byte values 0-3 on an
integer column, and throws on null/unknown). The column is a regular
table column: it is written with the row and merges like any value.
The reference SDK inherits this from its bundled JVM writer — here
every write path (write_dataframe, write_pandas/arrow, the lake PK
append) derives kinds from the option when no explicit
``row_kind_col`` is passed; an explicit column always wins."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from paimon_python_spark import Schema


def _pk_table(catalog, name, rk_type=T.StringType(), options=None):
    st = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.StringType()),
            T.StructField("rk", rk_type),
        ]
    )
    catalog.create_table(
        f"default.{name}",
        Schema(
            st,
            primary_keys=["k"],
            options={"bucket": "2", "rowkind.field": "rk", **(options or {})},
        ),
        False,
    )
    return catalog.get_table(f"default.{name}"), st


def _commit(table, df):
    wb = table.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_dataframe(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def test_engine_rowkind_field_strings(catalog, spark):
    t, st = _pk_table(catalog, "rkf")
    _commit(t, spark.createDataFrame([(1, "a", "+I"), (2, "b", "+I"), (3, "c", "+I")], st))
    _commit(t, spark.createDataFrame([(2, "B", "+U"), (3, "c", "-D")], st))
    rows = {r["k"]: r for r in t.new_read_builder().new_read().to_df().collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["v"] == "B"
    # the rowkind column is ordinary data: latest surviving value stands
    assert rows[2]["rk"] == "+U"


def test_engine_rowkind_field_byte_values(catalog, spark):
    t, st = _pk_table(catalog, "rkf_int", rk_type=T.IntegerType())
    _commit(t, spark.createDataFrame([(1, "a", 0), (2, "b", 0)], st))
    _commit(t, spark.createDataFrame([(1, "A", 2), (2, "b", 3)], st))
    rows = {r["k"]: r["v"] for r in t.new_read_builder().new_read().to_df().collect()}
    assert rows == {1: "A"}


def test_engine_rowkind_field_via_write_pandas(catalog):
    t, _ = _pk_table(catalog, "rkf_pd")
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(
        pd.DataFrame({"k": [1, 2, 2], "v": ["a", "b", None], "rk": ["+I", "+I", "-D"]})
    )
    c.commit(w.prepare_commit())
    w.close()
    c.close()
    rows = {r["k"]: r["v"] for r in t.new_read_builder().new_read().to_df().collect()}
    assert rows == {1: "a"}


def test_invalid_and_null_rowkind_raise(catalog, spark):
    t, st = _pk_table(catalog, "rkf_bad")
    with pytest.raises(Exception, match="invalid row kind"):
        _commit(t, spark.createDataFrame([(1, "a", "++I")], st))
    with pytest.raises(Exception, match="invalid row kind"):
        _commit(t, spark.createDataFrame([(1, "a", None)], st))
    t2, st2 = _pk_table(catalog, "rkf_bad_int", rk_type=T.IntegerType())
    with pytest.raises(Exception, match="invalid row kind"):
        _commit(t2, spark.createDataFrame([(1, "a", 7)], st2))
    # a bigint far outside int range must hit the SAME descriptive
    # error (validation happens before any cast — no overflow, no
    # silent wrap to a valid kind on non-ANSI sessions)
    t3, st3 = _pk_table(catalog, "rkf_bad_big", rk_type=T.LongType())
    with pytest.raises(Exception, match="invalid row kind"):
        _commit(t3, spark.createDataFrame([(1, "a", 2**32)], st3))


def test_explicit_row_kind_col_overrides_option(catalog, spark):
    t, _ = _pk_table(catalog, "rkf_override")
    full = "k int, v string, rk string, __kind int"
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    # rk says -D, explicit column says +I — the explicit column wins
    w.write_dataframe(
        spark.createDataFrame([(1, "a", "-D", 0)], full), row_kind_col="__kind"
    )
    c.commit(w.prepare_commit())
    w.close()
    c.close()
    rows = t.new_read_builder().new_read().to_df().collect()
    assert [(r["k"], r["v"], r["rk"]) for r in rows] == [(1, "a", "-D")]


def test_lake_pk_append_honors_rowkind_field(tmp_path, spark):
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        create_lake_table,
        write_lake_pk_append,
    )
    from paimon_python_spark.session import set_spark

    set_spark(spark)
    p = str(tmp_path / "rkf_lake")
    create_lake_table(
        p,
        [("k", "INT NOT NULL"), ("v", "STRING"), ("rk", "STRING")],
        primary_keys=["k"],
        options={"bucket": "2", "rowkind.field": "rk"},
    )
    write_lake_pk_append(
        p, spark.createDataFrame([(1, "a", "+I"), (2, "b", "+I")], "k int, v string, rk string")
    )
    write_lake_pk_append(
        p, spark.createDataFrame([(1, "A", "+U"), (2, "b", "-D")], "k int, v string, rk string")
    )
    out = {
        r["k"]: r["v"]
        for r in PaimonLakeTable(p).new_read_builder().new_read().to_df().collect()
    }
    assert out == {1: "A"}


def test_non_string_non_int_rowkind_field_rejected(catalog, spark):
    t, st = _pk_table(catalog, "rkf_double", rk_type=T.DoubleType())
    with pytest.raises(ValueError, match="must be a string"):
        _commit(t, spark.createDataFrame([(1, "a", 0.0)], st))
