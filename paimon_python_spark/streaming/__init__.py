"""Streaming surface: incremental snapshot reads, changelog derivation,
and Structured Streaming operators.

The reference's data model carries changelog semantics (RowKind
±I/±U/±D + sequence numbers, pypaimon/pynative/common/row/row_kind.py:22-57)
but ships no streaming reader in Python — Flink consumes the format.
Here the same semantics surface three ways:

- :func:`read_incremental` — the delta between two snapshots (the unit a
  streaming consumer polls),
- :func:`changelog_diff` — exact ±I/-U/+U/-D changelog between any two
  snapshots, derived from merged states with one full-outer join,
- :mod:`.windows` — watermarked event-time operators (tumbling/sliding/
  session windows, stateful dedup) on Structured Streaming,
- :mod:`.sink` — continuous ingestion INTO a table: foreachBatch where
  every micro-batch is one atomic snapshot commit, idempotent on
  replayed batch ids.
"""

from paimon_python_spark.streaming.incremental import (
    read_incremental,
    changelog_diff,
    stream_snapshots,
)
from paimon_python_spark.streaming.windows import (
    tumbling_counts,
    session_aggregate,
    streaming_dedup,
    stream_stream_interval_join,
)
from paimon_python_spark.streaming.stateful import running_totals, sessionize_stateful
from paimon_python_spark.streaming.sink import (
    StreamingLakeSink,
    StreamingTableSink,
    stream_into_lake,
    stream_upsert,
)

__all__ = [
    "StreamingLakeSink",
    "StreamingTableSink",
    "stream_into_lake",
    "stream_upsert",
    "read_incremental",
    "changelog_diff",
    "stream_snapshots",
    "tumbling_counts",
    "session_aggregate",
    "streaming_dedup",
    "stream_stream_interval_join",
    "running_totals",
    "sessionize_stateful",
]
