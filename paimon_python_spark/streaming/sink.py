"""Streaming sink: continuous ingestion into an engine table.

The reference's write surface is batch-only (BatchWriteBuilder,
pypaimon/api/write_builder.py:28-48); Paimon's streaming ingestion
lives in its Flink/Spark connectors. This module is the Spark-native
equivalent: ``writeStream.foreachBatch`` where every micro-batch runs
the SAME batch write + commit protocol — so each micro-batch is one
atomic snapshot, merge-on-read gives upsert semantics on PK tables,
and any batch reader (or the streaming snapshot source) sees
exactly-committed data only.

Scale shape: the micro-batch write inherits the batch writer's layout
(bucket repartition for PK tables, partition dirs, file stats), so a
1000-executor cluster ingests each trigger as an ordinary distributed
write; the driver only appends one snapshot JSON per trigger.

Exactly-once: foreachBatch can re-run a batch id after recovery. The
sink records the last committed ``(stream_id, batch_id)`` in the
snapshot commit properties and skips batches it has already committed
— the standard idempotent-sink recipe.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame


class StreamingTableSink:
    """``sink = StreamingTableSink(table); q = sink.attach(stream_df)``.

    Wraps ``writeStream.foreachBatch``; each micro-batch becomes one
    commit (snapshot) of the target table, deduplicated by batch id.
    """

    def __init__(self, table, stream_id: str = "default", row_kind_col: Optional[str] = None):
        self.table = table
        self.stream_id = stream_id
        self.row_kind_col = row_kind_col

    # ---- idempotence bookkeeping (driver-side, one tiny JSON) ----

    def _marker_path(self) -> str:
        return os.path.join(
            self.table.table_path, "streaming", f"offsets-{self.stream_id}.json"
        )

    def last_committed_batch(self) -> int:
        try:
            with open(self._marker_path()) as f:
                return json.load(f)["batch_id"]
        except (FileNotFoundError, KeyError, ValueError):
            return -1

    def _record_batch(self, batch_id: int) -> None:
        path = self._marker_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, path)

    # ---- the sink ----

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch callback: one atomic commit per micro-batch,
        skipping batch ids at or below the last committed one (replays
        after recovery)."""
        if batch_id <= self.last_committed_batch():
            return
        wb = self.table.new_batch_write_builder()
        w, c = wb.new_write(), wb.new_commit()
        try:
            w.write_dataframe(batch_df, row_kind_col=self.row_kind_col)
            c.commit(w.prepare_commit())
        finally:
            w.close()
            c.close()
        self._record_batch(batch_id)

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: Optional[str] = None,
        trigger_once: bool = False,
        **trigger_kwargs,
    ):
        """Start the streaming query. ``trigger_once=True`` drains the
        available input and stops (the batch-backfill pattern);
        otherwise pass e.g. ``processingTime='10 seconds'``. Pass the
        same ``checkpoint`` dir across restarts so batch ids continue
        and the idempotence marker stays meaningful."""
        writer = stream_df.writeStream.foreachBatch(self.write_batch).outputMode(
            "update" if self.row_kind_col else "append"
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        elif trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        return writer.start()


def stream_upsert(table, stream_df: DataFrame, stream_id: str = "default", **kw):
    """Convenience: attach ``stream_df`` as a continuous upsert into a
    PK table (or append into an append table); returns the query."""
    return StreamingTableSink(table, stream_id=stream_id).attach(stream_df, **kw)


class StreamingLakeSink(StreamingTableSink):
    """Continuous ingestion INTO A REAL PAIMON LAKE — the streaming
    face of ``write_lake_append``: each micro-batch commits one spec
    APPEND snapshot (PK lakes route through the fixed-bucket key-value
    path, so the stream is a CDC upsert the lake's own readers
    resolve), deduplicated by batch id exactly like the engine sink.

    The idempotence marker lives under ``<lake>/streaming/`` — a
    directory foreign to the spec that JVM readers never touch
    (pass ``marker_dir`` to keep the lake pristine, e.g. next to the
    checkpoint). ``row_kind_col`` streams retractions: a ``-D`` row in
    a micro-batch deletes its key in the lake.
    """

    def __init__(
        self,
        table_path: str,
        stream_id: str = "default",
        row_kind_col: Optional[str] = None,
        marker_dir: Optional[str] = None,
    ):
        self.table_path = table_path
        self.stream_id = stream_id
        self.row_kind_col = row_kind_col
        self._marker_dir = marker_dir or os.path.join(table_path, "streaming")
        #: CROSS_PARTITION lakes: one (pk → partition) projection cache
        #: for the whole run — bootstrap once, delta-maintained per
        #: commit instead of a merged-state read per micro-batch
        self.xp_cache = None

    def _marker_path(self) -> str:
        return os.path.join(self._marker_dir, f"offsets-{self.stream_id}.json")

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_committed_batch():
            return
        if batch_df.isEmpty():
            self._record_batch(batch_id)
            return
        from paimon_python_spark.paimon_import import read_paimon_schema
        from paimon_python_spark.paimon_lake import (
            write_lake_append,
            write_lake_pk_append,
        )

        info = read_paimon_schema(self.table_path)
        if self.row_kind_col and not info.primary_keys:
            raise ValueError(
                "StreamingLakeSink: row_kind_col needs a PK lake "
                "(append lakes cannot retract rows)"
            )
        if info.primary_keys:
            cross = (
                int(info.options.get("bucket", "-1")) < 1
                and bool(info.partition_keys)
                and not set(info.partition_keys) <= set(info.primary_keys)
            )
            if cross and self.xp_cache is None:
                from paimon_python_spark.dynamic_bucket import (
                    CrossLocationCache,
                )

                self.xp_cache = CrossLocationCache(self.table_path)
            write_lake_pk_append(
                self.table_path,
                batch_df,
                row_kind_col=self.row_kind_col,
                xp_location_cache=self.xp_cache,
            )
        else:
            write_lake_append(self.table_path, batch_df)
        self._record_batch(batch_id)


def stream_into_lake(
    table_path: str, stream_df: DataFrame, stream_id: str = "default", **kw
):
    """Convenience: attach ``stream_df`` as continuous ingestion into a
    real Paimon lake (upsert on PK lakes); returns the query."""
    return StreamingLakeSink(table_path, stream_id=stream_id).attach(stream_df, **kw)
