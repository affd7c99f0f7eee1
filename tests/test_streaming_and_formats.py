"""Streaming (incremental / changelog / structured), compaction, ORC
format, and schema-evolution suites."""

import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from paimon_python_spark import Schema

PK3 = pa.schema(
    [pa.field("k", pa.int32(), False), ("v", pa.string()), ("v2", pa.string())]
)


def _write(table, df):
    wb = table.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_pandas(df)
    c.commit(w.prepare_commit())
    w.close()
    c.close()


# ---- incremental reads ----


def test_read_incremental_per_snapshot(catalog):
    from paimon_python_spark.streaming import read_incremental

    catalog.create_table("default.t", Schema(pa.schema([("f0", pa.int32()), ("f1", pa.string())])), False)
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"f0": [1, 2], "f1": ["a", "b"]}))
    _write(t, pd.DataFrame({"f0": [3], "f1": ["c"]}))
    _write(t, pd.DataFrame({"f0": [4], "f1": ["d"]}))

    assert sorted(read_incremental(t, 0, 1).toPandas()["f0"]) == [1, 2]
    assert sorted(read_incremental(t, 1, 2).toPandas()["f0"]) == [3]
    assert sorted(read_incremental(t, 1, 3).toPandas()["f0"]) == [3, 4]
    assert read_incremental(t, 3, 3).count() == 0


def test_read_incremental_pk_changelog_rows(catalog):
    from paimon_python_spark.streaming import read_incremental

    catalog.create_table(
        "default.t", Schema(PK3, primary_keys=["k"], options={"bucket": "1"}), False
    )
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"k": [1, 2], "v": ["a", "b"], "v2": ["A", "B"]}))
    _write(t, pd.DataFrame({"k": [2], "v": ["b2"], "v2": ["B2"]}))
    inc = read_incremental(t, 1, 2).toPandas()
    assert list(inc["k"]) == [2]
    assert list(inc["_row_kind"]) == ["+I"]
    assert "_SEQUENCE_NUMBER" in inc.columns


def test_stream_snapshots_generator(catalog):
    from paimon_python_spark.streaming import stream_snapshots

    catalog.create_table("default.t", Schema(pa.schema([("f0", pa.int32()), ("f1", pa.string())])), False)
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"f0": [1], "f1": ["a"]}))
    _write(t, pd.DataFrame({"f0": [2], "f1": ["b"]}))
    batches = list(stream_snapshots(t, max_batches=2))
    assert [sid for sid, _ in batches] == [1, 2]
    assert [int(df.toPandas()["f0"].iloc[0]) for _, df in batches] == [1, 2]


def test_changelog_diff(catalog):
    from paimon_python_spark.streaming import changelog_diff

    catalog.create_table(
        "default.t", Schema(PK3, primary_keys=["k"], options={"bucket": "1"}), False
    )
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"], "v2": ["A", "B", "C"]}))
    # snapshot 2: update k=2, add k=4; snapshot 3: delete k=3 via changelog write
    _write(t, pd.DataFrame({"k": [2, 4], "v": ["b2", "d"], "v2": ["B", "D"]}))

    diff = changelog_diff(t, 1, 2).toPandas().set_index("k")
    assert diff.loc[2, "_row_kind"] == "+U"
    assert diff.loc[2, "v"] == "b2"
    assert diff.loc[2, "_before_v"] == "b"
    assert diff.loc[4, "_row_kind"] == "+I"
    assert len(diff) == 2

    # delete via write_dataframe changelog column
    from pyspark.sql import types as T

    from paimon_python_spark.session import get_spark

    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    schema = T.StructType(
        list(t.schema.spark_schema.fields) + [T.StructField("_kind", T.IntegerType())]
    )
    w.write_dataframe(
        get_spark().createDataFrame(
            pd.DataFrame({"k": [3], "v": ["c"], "v2": ["C"], "_kind": [3]}), schema=schema
        ),
        row_kind_col="_kind",
    )
    c.commit(w.prepare_commit())
    diff2 = changelog_diff(t, 2, 3).toPandas()
    assert list(diff2["_row_kind"]) == ["-D"]
    assert list(diff2["k"]) == [3]


# ---- structured streaming ----


def test_structured_streaming_tumbling(spark, tmp_path):
    from paimon_python_spark.streaming import tumbling_counts

    src = str(tmp_path / "stream_src")
    events = spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", "click", 1.0),
            ("2024-01-01 00:02:00", "click", 2.0),
            ("2024-01-01 00:07:00", "view", 3.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = tumbling_counts(stream, window_len="5 minutes", watermark="10 minutes")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        res = spark.sql(
            "SELECT event_type, n, sum_value FROM tumbling_out ORDER BY window_start, event_type"
        ).collect()
    finally:
        q.stop()
    assert [(r.event_type, r.n, r.sum_value) for r in res] == [
        ("click", 2, 3.0),
        ("view", 1, 3.0),
    ]


def test_structured_streaming_dedup(spark, tmp_path):
    from paimon_python_spark.streaming import streaming_dedup

    src = str(tmp_path / "dedup_src")
    events = spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", 1),
            ("2024-01-01 00:02:00", 1),
            ("2024-01-01 00:03:00", 2),
        ],
        "ts_s string, id int",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "id")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_dedup(stream, ["id"], watermark="10 minutes")
    q = out.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try:
        q.processAllAvailable()
        res = spark.sql("SELECT id FROM dedup_out ORDER BY id").collect()
    finally:
        q.stop()
    assert [r.id for r in res] == [1, 2]


# ---- compaction ----


def test_compaction_pk_collapses_runs(catalog):
    from paimon_python_spark.compaction import compact_table

    catalog.create_table(
        "default.t", Schema(PK3, primary_keys=["k"], options={"bucket": "1"}), False
    )
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"k": [1, 2], "v": ["a", "b"], "v2": ["A", "B"]}))
    _write(t, pd.DataFrame({"k": [2, 3], "v": ["b2", "c"], "v2": ["B2", "C"]}))
    before = t.new_read_builder().new_read().to_pandas()

    snap_id = compact_table(t)
    assert snap_id == 3

    splits = t.new_read_builder().new_scan().plan().splits()
    assert sum(len(s.files) for s in splits) == 1  # two runs → one file
    after = t.new_read_builder().new_read().to_pandas()
    pd.testing.assert_frame_equal(before, after)

    # post-compaction writes still win over compacted rows
    _write(t, pd.DataFrame({"k": [2], "v": ["b3"], "v2": ["B3"]}))
    final = t.new_read_builder().new_read().to_pandas().set_index("k")
    assert final.loc[2, "v"] == "b3"


def test_compaction_append_small_files(catalog):
    from paimon_python_spark.compaction import compact_table

    catalog.create_table("default.t", Schema(pa.schema([("f0", pa.int32()), ("f1", pa.string())])), False)
    t = catalog.get_table("default.t")
    for i in range(3):
        _write(t, pd.DataFrame({"f0": [i], "f1": [str(i)]}))
    assert compact_table(t) == 4
    splits = t.new_read_builder().new_scan().plan().splits()
    assert sum(len(s.files) for s in splits) == 1
    assert sorted(t.new_read_builder().new_read().to_pandas()["f0"]) == [0, 1, 2]


# ---- ORC format ----


def test_orc_round_trip_append_and_pk(catalog):
    schema = Schema(
        pa.schema([("f0", pa.int64()), ("f1", pa.string())]),
        options={"file.format": "orc"},
    )
    catalog.create_table("default.t_orc", schema, False)
    t = catalog.get_table("default.t_orc")
    _write(t, pd.DataFrame({"f0": [1, 2, 3], "f1": ["a", "b", None]}))
    out = t.new_read_builder().new_read().to_pandas()
    assert sorted(out["f0"]) == [1, 2, 3]

    pb = t.new_read_builder().new_predicate_builder()
    rb = t.new_read_builder().with_filter(pb.is_null("f1"))
    assert list(rb.new_read().to_pandas()["f0"]) == [3]

    pk = Schema(
        pa.schema([pa.field("k", pa.int64(), False), ("v", pa.string())]),
        primary_keys=["k"],
        options={"bucket": "1", "file.format": "orc"},
    )
    catalog.create_table("default.t_orc_pk", pk, False)
    t2 = catalog.get_table("default.t_orc_pk")
    _write(t2, pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    _write(t2, pd.DataFrame({"k": [2], "v": ["b2"]}))
    out = t2.new_read_builder().new_read().to_pandas()
    assert list(out["v"]) == ["a", "b2"]


# ---- schema evolution ----


def test_schema_evolution_add_column(catalog):
    catalog.create_table("default.t", Schema(pa.schema([("f0", pa.int32()), ("f1", pa.string())])), False)
    t = catalog.get_table("default.t")
    _write(t, pd.DataFrame({"f0": [1], "f1": ["a"]}))

    catalog.alter_table_add_column("default.t", "f2", pa.string())
    t = catalog.get_table("default.t")
    assert t.schema.field_names == ["f0", "f1", "f2"]
    _write(t, pd.DataFrame({"f0": [2], "f1": ["b"], "f2": ["new"]}))

    out = t.new_read_builder().new_read().to_pandas().sort_values("f0")
    # old file NULL-fills the new column (index_mapping equivalent)
    assert list(out["f2"]) == [None, "new"]

    with pytest.raises(ValueError):
        catalog.alter_table_add_column("default.t", "f2", pa.string())


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key state persists across
    micro-batches (second batch continues the first batch's totals)."""
    from paimon_python_spark.streaming.stateful import running_totals

    src = str(tmp_path / "stateful_src")
    batch1 = spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("view", 5.0)],
        "event_type string, value double",
    )
    batch1.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals(stream, key_col="event_type", value_col="value")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_out")
        .start()
    )
    try:
        q.processAllAvailable()
        batch2 = spark.createDataFrame(
            [("click", 10.0)], "event_type string, value double"
        )
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
        res = spark.sql(
            "SELECT event_type, n, sum_value FROM running_out"
        ).collect()
    finally:
        q.stop()
    # last emitted row per key reflects cumulative state
    latest = {}
    for r in res:
        latest[r.event_type] = (r.n, r.sum_value)
    assert latest["click"] == (3, 13.0)
    assert latest["view"] == (1, 5.0)


def test_avro_round_trip_append_and_pk(catalog):
    """file.format=avro: distributed write (mapInPandas + engine codec)
    and read (binaryFile + codec decode), same semantics as parquet."""
    schema = Schema(
        pa.schema([("f0", pa.int64()), ("f1", pa.string())]),
        options={"file.format": "avro"},
    )
    catalog.create_table("default.t_avro", schema, False)
    t = catalog.get_table("default.t_avro")
    _write(t, pd.DataFrame({"f0": [1, 2, 3], "f1": ["a", "b", None]}))
    out = t.new_read_builder().new_read().to_pandas()
    assert sorted(out["f0"]) == [1, 2, 3]
    assert out.sort_values("f0")["f1"].tolist() == ["a", "b", None]

    # predicate + projection through the avro scan
    pb = t.new_read_builder().new_predicate_builder()
    rb = t.new_read_builder().with_filter(pb.is_null("f1"))
    assert list(rb.new_read().to_pandas()["f0"]) == [3]
    rb2 = t.new_read_builder().with_projection(["f1"])
    assert sorted(rb2.new_read().to_df().columns) == ["f1"]

    # PK avro: bucketed writes + merge-on-read
    pk = Schema(
        pa.schema([pa.field("k", pa.int64(), False), ("v", pa.string())]),
        primary_keys=["k"],
        options={"bucket": "2", "file.format": "avro"},
    )
    catalog.create_table("default.t_avro_pk", pk, False)
    t2 = catalog.get_table("default.t_avro_pk")
    _write(t2, pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    _write(t2, pd.DataFrame({"k": [2], "v": ["b2"]}))
    out = t2.new_read_builder().new_read().to_pandas().sort_values("k")
    assert out["v"].tolist() == ["a", "b2", "c"]


def test_avro_partitioned_and_stats_pruning(catalog):
    """Partitioned avro table: hive-style dirs from the task-side
    writer; codec-computed file stats let the planner skip files."""
    schema = Schema(
        pa.schema([("k", pa.int64()), ("part", pa.string())]),
        partition_keys=["part"],
        options={"file.format": "avro"},
    )
    catalog.create_table("default.t_avro_part", schema, False)
    t = catalog.get_table("default.t_avro_part")
    _write(t, pd.DataFrame({"k": [1, 2], "part": ["x", "y"]}))
    _write(t, pd.DataFrame({"k": [3], "part": ["x"]}))

    pb = t.new_read_builder().new_predicate_builder()
    rb = t.new_read_builder().with_filter(pb.equal("part", "x"))
    splits = rb.new_scan().plan().splits()
    # partition pruning on the directory-derived partition values
    assert all(s.partition.get("part") == "x" for s in splits)
    out = rb.new_read().to_pandas(splits)
    assert sorted(out["k"].tolist()) == [1, 3]

    # stats pruning: k=3 lives only in the second commit's file
    rb2 = t.new_read_builder().with_filter(pb.equal("k", 3))
    splits2 = rb2.new_scan().plan().splits()
    assert sum(s.row_count() for s in splits2) == 1
    assert rb2.new_read().to_pandas(splits2)["k"].tolist() == [3]


def test_avro_deflate_codec_unit():
    """Codec-level deflate round trip: compressed blocks, smaller file,
    spec-compliant raw-DEFLATE (readable back without the engine)."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from paimon_python_spark.avro_codec import read_avro_table, write_avro

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("s", T.StringType())]
    )
    rows = [(i, "x" * 50) for i in range(500)] + [(None, None)]
    d = tempfile.mkdtemp()
    raw, comp = os.path.join(d, "raw.avro"), os.path.join(d, "c.avro")
    write_avro(raw, rows, schema, codec="null")
    write_avro(comp, rows, schema, codec="deflate")
    assert os.path.getsize(comp) < os.path.getsize(raw) / 5  # repetitive data
    with open(comp, "rb") as f:
        names, got = read_avro_table(f.read())
    assert names == ["a", "s"]
    assert got == rows

    import pytest as _pytest

    with _pytest.raises(ValueError, match="codec"):
        write_avro(os.path.join(d, "bad.avro"), rows, schema, codec="snappy")


def test_parquet_compression_option(catalog):
    """file.compression flows to the parquet writer (zstd extension)."""
    import glob
    import os

    schema = Schema(
        pa.schema([("f0", pa.int64())]), options={"file.compression": "zstd"}
    )
    catalog.create_table("default.t_zstd", schema, False)
    t = catalog.get_table("default.t_zstd")
    _write(t, pd.DataFrame({"f0": [1, 2, 3]}))
    files = glob.glob(os.path.join(t.table_path, "data", "**", "*.parquet"), recursive=True)
    assert files and all(f.endswith(".zstd.parquet") for f in files)
    assert sorted(t.new_read_builder().new_read().to_pandas()["f0"]) == [1, 2, 3]


def test_avro_deflate_table_round_trip(catalog):
    """file.compression=deflate on an avro PK table: distributed write
    compresses inside tasks; merge-on-read decodes transparently."""
    schema = Schema(
        pa.schema([pa.field("k", pa.int64(), False), ("v", pa.string())]),
        primary_keys=["k"],
        options={"bucket": "2", "file.format": "avro", "file.compression": "deflate"},
    )
    catalog.create_table("default.t_avro_defl", schema, False)
    t = catalog.get_table("default.t_avro_defl")
    _write(t, pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    _write(t, pd.DataFrame({"k": [2], "v": ["b2"]}))
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert out["v"].tolist() == ["a", "b2", "c"]


def test_streaming_sink_upsert(catalog, spark, tmp_path):
    """foreachBatch sink: micro-batches become atomic PK commits;
    restarts with the same checkpoint continue batch numbering; a
    replayed batch id is skipped (idempotent)."""
    from paimon_python_spark.streaming import StreamingTableSink

    pk = Schema(
        pa.schema([pa.field("k", pa.int64(), False), ("v", pa.string())]),
        primary_keys=["k"],
        options={"bucket": "2"},
    )
    catalog.create_table("default.t_sink", pk, False)
    t = catalog.get_table("default.t_sink")

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    base.write.parquet(src)

    sink = StreamingTableSink(t, stream_id="s1")
    stream = spark.readStream.schema(base.schema).parquet(src)
    q = sink.attach(stream, checkpoint=ckpt, trigger_once=True)
    q.awaitTermination(120)
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert out["v"].tolist() == ["a", "b"]
    from paimon_python_spark.metadata import MetadataStore

    snaps_after_first = MetadataStore(t.table_path).latest_snapshot_id()

    # second run, same checkpoint: new file = new batch, upserts k=2
    spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string").write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    q = sink.attach(stream, checkpoint=ckpt, trigger_once=True)
    q.awaitTermination(120)
    out = t.new_read_builder().new_read().to_pandas().sort_values("k")
    assert out["v"].tolist() == ["a", "b2", "c"]
    assert (
        MetadataStore(t.table_path).latest_snapshot_id() == snaps_after_first + 1
    )  # one commit per batch

    # replaying an already-committed batch id is a no-op
    replay = spark.createDataFrame([(9, "z")], "k long, v string")
    sink.write_batch(replay, batch_id=sink.last_committed_batch())
    out = t.new_read_builder().new_read().to_pandas()
    assert 9 not in out["k"].tolist()


def test_streaming_lake_sink(spark, tmp_path):
    """Streaming INTO a real lake: micro-batches commit spec APPEND
    snapshots (PK lake → CDC upserts the lake's own readers resolve);
    batch ids replay idempotently; -D retraction rows delete keys."""
    import pyarrow as pa

    from paimon_python_spark.paimon_import import (
        latest_paimon_snapshot_id,
        write_paimon_table_fixture,
    )
    from paimon_python_spark.paimon_lake import PaimonLakeTable
    from paimon_python_spark.session import set_spark
    from paimon_python_spark.streaming import StreamingLakeSink

    set_spark(spark)
    p = str(tmp_path / "stream_lake")
    kv = pa.schema(
        [("_KEY_k", pa.int64()), ("_SEQUENCE_NUMBER", pa.int64()),
         ("_VALUE_KIND", pa.int32()), ("k", pa.int64()), ("v", pa.string())]
    )
    write_paimon_table_fixture(
        p, [("k", "BIGINT NOT NULL"), ("v", "STRING")], [], ["k"],
        [(0, {}, 0, pa.table(
            {"_KEY_k": [1, 2], "_SEQUENCE_NUMBER": [0, 1],
             "_VALUE_KIND": [0, 0], "k": [1, 2], "v": ["a", "b"]},
            schema=kv))],
        options={"bucket": "2"},
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    base = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    base.write.parquet(src)
    sink = StreamingLakeSink(p, stream_id="s1")
    q = sink.attach(
        spark.readStream.schema(base.schema).parquet(src),
        checkpoint=ckpt,
        trigger_once=True,
    )
    q.awaitTermination(120)
    out = PaimonLakeTable(p).new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out.v) == ["a", "B", "c"]
    assert latest_paimon_snapshot_id(p) == 2  # one spec commit per batch
    # replayed batch id is a no-op
    sink.write_batch(
        spark.createDataFrame([(9, "z")], "k long, v string"),
        batch_id=sink.last_committed_batch(),
    )
    assert 9 not in PaimonLakeTable(p).new_read_builder().new_read().to_pandas().k.tolist()
    # -D retraction stream deletes its key
    sink_cdc = StreamingLakeSink(p, stream_id="s2", row_kind_col="rk")
    sink_cdc.write_batch(
        spark.createDataFrame([(3, "c", 3)], "k long, v string, rk int"),
        batch_id=0,
    )
    out2 = PaimonLakeTable(p).new_read_builder().new_read().to_pandas().sort_values("k")
    assert list(out2.k) == [1, 2] and list(out2.v) == ["a", "B"]


def test_streaming_sink_inherits_changelog_producer(spark, tmp_path):
    """A micro-batch into a lookup-producing lake commits WITH its
    full-image changelog — the sink routes through write_lake_pk_append
    so the producer matrix needs no streaming-specific code."""
    import json
    import os

    from paimon_python_spark.paimon_lake import (
        create_lake_table,
        read_lake_incremental,
        write_lake_pk_append,
    )
    from paimon_python_spark.session import set_spark
    from paimon_python_spark.streaming import StreamingLakeSink

    set_spark(spark)
    p = str(tmp_path / "cl_stream_lake")
    create_lake_table(
        p, [("k", "INT NOT NULL"), ("v", "STRING")],
        primary_keys=["k"],
        options={"bucket": "1", "changelog-producer": "lookup"},
    )
    write_lake_pk_append(p, spark.createDataFrame([(1, "a")], "k int, v string"))
    sink = StreamingLakeSink(p, stream_id="s1")
    sink.write_batch(
        spark.createDataFrame([(1, "A2"), (2, "b")], "k int, v string"), batch_id=0
    )
    with open(os.path.join(p, "snapshot", "snapshot-2")) as f:
        snap = json.load(f)
    assert snap["changelogManifestList"] and snap["changelogRecordCount"] == 3
    cl = (
        read_lake_incremental(p, 1, 2, use_changelog=True)
        .toPandas()
        .sort_values(["k", "_SEQUENCE_NUMBER"])
    )
    assert list(zip(cl.k, cl._row_kind, cl.v)) == [
        (1, "-U", "a"), (1, "+U", "A2"), (2, "+I", "b"),
    ]


def test_consumer_offsets_resume(catalog):
    from paimon_python_spark.streaming import stream_snapshots
    from paimon_python_spark.streaming.incremental import read_consumer_offset

    catalog.create_table(
        "default.t_consumer", Schema(pa.schema([("f0", pa.int32())])), False
    )
    t = catalog.get_table("default.t_consumer")
    _writes = [pd.DataFrame({"f0": [i]}) for i in (1, 2, 3)]
    for df in _writes[:2]:
        _write(t, df)

    got = [sid for sid, _ in stream_snapshots(t, consumer_id="c1", max_batches=2)]
    assert got == [1, 2]
    assert read_consumer_offset(t, "c1") == 2

    # restart with the same consumer id: resumes after snapshot 2
    _write(t, _writes[2])
    resumed = list(stream_snapshots(t, consumer_id="c1", max_batches=1))
    assert [sid for sid, _ in resumed] == [3]
    assert int(resumed[0][1].toPandas()["f0"].iloc[0]) == 3

    # a different consumer starts from scratch
    fresh = [sid for sid, _ in stream_snapshots(t, consumer_id="c2", max_batches=3)]
    assert fresh == [1, 2, 3]

    with pytest.raises(ValueError, match="invalid consumer id"):
        list(stream_snapshots(t, consumer_id="../evil", max_batches=1))


def test_partitions_system_table(catalog):
    schema = Schema(
        pa.schema([("k", pa.int64()), ("part", pa.string())]),
        partition_keys=["part"],
    )
    catalog.create_table("default.t_partsys", schema, False)
    t = catalog.get_table("default.t_partsys")
    _write(t, pd.DataFrame({"k": [1, 2, 3], "part": ["x", "x", "y"]}))
    _write(t, pd.DataFrame({"k": [4], "part": ["x"]}))
    rows = {r.partition["part"]: r for r in t.partitions().collect()}
    assert rows["x"].record_count == 3
    assert rows["x"].file_count == 2  # one per commit
    assert rows["y"].record_count == 1
    assert all(r.total_size > 0 for r in rows.values())


def test_stream_stream_interval_join(spark, tmp_path):
    from paimon_python_spark.streaming import stream_stream_interval_join

    imp_src = str(tmp_path / "impressions")
    clk_src = str(tmp_path / "clicks")
    impressions = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1), ("2024-01-01 00:30:00", 2)],
        "ts_s string, ad_id int",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "ad_id")
    clicks = spark.createDataFrame(
        [
            ("2024-01-01 00:05:00", 1),   # within 10 min of impression 1 -> joins
            ("2024-01-01 00:20:00", 1),   # 20 min later -> outside window
            ("2024-01-01 00:31:00", 2),   # within -> joins
        ],
        "ts_s string, ad_id int",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "ad_id")
    impressions.write.parquet(imp_src)
    clicks.write.parquet(clk_src)

    li = spark.readStream.schema(impressions.schema).parquet(imp_src)
    ri = spark.readStream.schema(clicks.schema).parquet(clk_src)
    out = stream_stream_interval_join(li, ri, "ad_id")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        res = spark.sql("SELECT ad_id FROM ssj_out ORDER BY ad_id").collect()
    finally:
        q.stop()
    assert [r.ad_id for r in res] == [1, 2]


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState session machine: a gap inside batch 2
    closes the session opened in batch 1; the open session stays in
    state (no emission) until a later gap closes it."""
    from paimon_python_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "sess_src")
    G = 10**9  # 1s in ns
    batch1 = spark.createDataFrame(
        [(1, 0 * G), (1, 60 * G), (2, 0 * G)], "user_id long, ts_ns long"
    )
    # one file per batch: with maxFilesPerTrigger=1 each parquet part
    # becomes its own micro-batch, and multi-part writes would feed the
    # state machine in nondeterministic file order
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stateful(stream, "user_id", "ts_ns", gap_ns=1800 * G)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # user 1: 5000s is > 1800s after 60s -> closes session [0, 60]
        batch2 = spark.createDataFrame(
            [(1, 5000 * G), (1, 5020 * G)], "user_id long, ts_ns long"
        )
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, session_start, session_end, n_events FROM sess_out"
        ).collect()
    finally:
        q.stop()
    sessions = {(r.user_id, r.session_start): (r.session_end, r.n_events) for r in rows}
    # exactly one closed session: user 1's [0s, 60s] with 2 events
    assert sessions == {(1, 0): (60 * G, 2)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming dedup primitive: dropDuplicatesWithinWatermark keeps
    one row per key across micro-batches while the watermark bounds
    state — the streaming twin of the exact-dedup operator."""
    import pandas as pd

    src = str(tmp_path / "sdedup_src")
    batch1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:10")],
        "k long, ts_s string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts")
    batch1.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # duplicate key 1 (inside the watermark) + a new key 3
        batch2 = spark.createDataFrame(
            [(1, "2024-01-01 00:00:20"), (3, "2024-01-01 00:00:30")],
            "k long, ts_s string",
        ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts")
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
        res = sorted(r.k for r in spark.sql("SELECT k FROM sdedup_out").collect())
    finally:
        q.stop()
    assert res == [1, 2, 3]  # the duplicate k=1 emitted exactly once
