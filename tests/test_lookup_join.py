"""Lookup join — Paimon's dim-table enrichment (Flink connector
`FOR SYSTEM_TIME AS OF`; the reference SDK has no join surface), as a
broadcast-by-metadata join over the merged PK snapshot plus a
snapshot-cached streaming variant."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from paimon_python_spark import Schema
from paimon_python_spark.operators.joins import (
    SnapshotCachedLookup,
    lookup_join,
)

import pyarrow as pa


def _dim(catalog, name="dim"):
    schema = pa.schema([("id", pa.int64()), ("seg", pa.string()), ("bal", pa.float64())])
    catalog.create_table(
        f"default.{name}",
        Schema(schema, primary_keys=["id"], options={"bucket": "2"}),
        False,
    )
    t = catalog.get_table(f"default.{name}")
    _write(t, pd.DataFrame({"id": [1, 2, 3], "seg": ["A", "B", "C"], "bal": [1.0, 2.0, 3.0]}))
    return t


def _write(t, pdf):
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(pdf)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


def _facts(spark):
    return spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2), (13, 9)], "fid long, cust long"
    )


def test_lookup_join_merged_state_and_broadcast(spark, catalog):
    t = _dim(catalog)
    # upsert: id=2's segment changes; lookup must see the MERGED state
    _write(t, pd.DataFrame({"id": [2], "seg": ["B2"], "bal": [2.5]}))
    out = lookup_join(_facts(spark), t, on={"cust": "id"}, select=["seg"])
    got = {r["fid"]: r["seg"] for r in out.collect()}
    assert got == {10: "A", 11: "B2", 12: "B2", 13: None}
    # dim key column dropped, fact columns intact
    assert set(out.columns) == {"fid", "cust", "seg"}
    # tiny dim => metadata-decided broadcast in the physical plan
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_lookup_join_inner_and_shared_names(spark, catalog):
    t = _dim(catalog, "dim2")
    facts = _facts(spark).withColumnRenamed("cust", "id")
    out = lookup_join(facts, t, on=["id"], select=["seg", "bal"], how="inner")
    assert out.count() == 3  # fid=13 has no dim row
    assert set(out.columns) == {"fid", "id", "seg", "bal"}


def test_lookup_join_collision_raises(spark, catalog):
    t = _dim(catalog, "dim3")
    facts = _facts(spark).withColumn("seg", F.lit("clash"))
    with pytest.raises(ValueError, match="collide"):
        lookup_join(facts, t, on={"cust": "id"})


def test_lookup_join_no_broadcast_when_over_budget(spark, catalog):
    t = _dim(catalog, "dim4")
    out = lookup_join(
        _facts(spark), t, on={"cust": "id"}, select=["seg"], broadcast_bytes=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_snapshot_cached_lookup_invalidates_on_commit(spark, catalog):
    t = _dim(catalog, "dim5")
    lk = SnapshotCachedLookup(t, on={"cust": "id"}, select=["seg"])
    first = {r["fid"]: r["seg"] for r in lk.join(_facts(spark)).collect()}
    assert first[11] == "B" and lk.rebuilds == 1
    # unchanged snapshot -> no rebuild
    lk.join(_facts(spark)).collect()
    assert lk.rebuilds == 1
    # dim advances -> exactly one rebuild, new state visible
    _write(t, pd.DataFrame({"id": [2], "seg": ["B9"], "bal": [0.0]}))
    second = {r["fid"]: r["seg"] for r in lk.join(_facts(spark)).collect()}
    assert second[11] == "B9" and lk.rebuilds == 2
    lk.close()


def test_lookup_join_statistics_refine_broadcast(spark, catalog):
    """r12: ANALYZE statistics feed the broadcast decision — a wide dim
    whose FILE bytes exceed the budget (a fat payload column) still
    broadcasts when the projected columns' rows x avgLen estimate fits:
    file sizes alone would mis-decide a narrow projection."""
    import pyarrow as pa

    from paimon_python_spark import Schema
    from paimon_python_spark.lake_statistics import analyze_table

    schema = pa.schema(
        [("id", pa.int64()), ("seg", pa.string()), ("fat", pa.string())]
    )
    catalog.create_table(
        "default.dim_stats",
        Schema(schema, primary_keys=["id"], options={"bucket": "1"}),
        False,
    )
    t = catalog.get_table("default.dim_stats")
    _write(
        t,
        pd.DataFrame(
            {
                "id": list(range(50)),
                "seg": [f"s{i % 4}" for i in range(50)],
                # incompressible ~20 KB per row (~1 MB on disk): unique
                # random hex defeats parquet's dictionary/RLE encoding
                "fat": [
                    __import__("os").urandom(10_000).hex() for _ in range(50)
                ],
            }
        ),
    )
    facts = spark.range(100).select(F.col("id").alias("id"))
    budget = 64 * 1024  # 64 KB: file bytes (~1 MB) are over, the
    # projected (id, seg) estimate (~50 x ~16 B) is far under

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # WITHOUT statistics: file bytes are the only basis → no hint
        before = lookup_join(
            facts, t, on={"id": "id"}, select=["seg"], broadcast_bytes=budget
        )
        assert "BroadcastHashJoin" not in before._jdf.queryExecution().executedPlan().toString()

        analyze_table(t)
        after = lookup_join(
            facts, t, on={"id": "id"}, select=["seg"], broadcast_bytes=budget
        )
        plan = after._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # correctness unchanged
        got = {r.id: r.seg for r in after.filter(F.col("id") < 50).collect()}
        assert got == {i: f"s{i % 4}" for i in range(50)}

        # a projection including the fat column stays un-broadcast:
        # rows x avgLen(fat) blows the budget
        fatp = lookup_join(
            facts, t, on={"id": "id"}, select=["fat"], broadcast_bytes=budget
        )
        assert "BroadcastHashJoin" not in fatp._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
