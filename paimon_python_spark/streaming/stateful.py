"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in window aggregations can't express (running
totals emitted every micro-batch, custom per-key state machines), Spark's
arbitrary-stateful-processing API is the scale path: state lives in the
state store partitioned by key (one shuffle to co-locate keys, then
incremental per-batch updates — no re-aggregation of history), and data
crosses the Python boundary as Arrow batches, never row-at-a-time.

The reference has no streaming operators at all (SURVEY §2.5) — this is
part of the north-star streaming surface built on the RowKind/changelog
data model.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    grouped_or_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) across the whole stream, emitted
    once per key per micro-batch that touches the key.

    Unlike ``groupBy().agg()`` in complete mode (which re-emits and
    re-holds the full result table), state here is two numbers per key
    in the state store, updated incrementally — bounded memory at any
    stream length.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "sum_value": [total]}
        )

    return grouped_or_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, n long, sum_value double",
        stateStructType="n long, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    gap_ns: int = 1800 * 10**9,
) -> DataFrame:
    """Per-key session state machine over an epoch-nanos event-time
    column: an event more than ``gap_ns`` after the previous one CLOSES
    the running session (emitting one row per closed session) and opens
    a new one. The open session survives in the state store across
    micro-batches — bounded to three numbers per key, however long the
    stream runs.

    This is the custom-stateful-operator shape the built-in
    ``session_window`` aggregation can't express: arbitrary per-session
    outputs (start/end/count here; a full state machine in general)
    emitted exactly once, when the session closes. Events are processed
    in event-time order within each batch; cross-batch disorder beyond
    the gap is the caller's watermarking responsibility (same contract
    as Paimon/Flink session windows).
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(v) for v in pdf[ts_col])
        for t in sorted(ts_all):
            if start is None:
                start = last = t
                n = 1
            elif t - last > gap_ns:
                closed.append((key[0], start, last, n))
                start = last = t
                n = 1
            else:
                # within-gap disorder across micro-batches: the session
                # bounds only widen (an earlier event must not drag the
                # end backwards)
                start = min(start, t)
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=[key_col, "session_start", "session_end", "n_events"]
            )

    key_type = df.schema[key_col].dataType.simpleString()
    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, session_start long, session_end long, n_events long"
        ),
        stateStructType="session_start long, session_end long, n_events long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
