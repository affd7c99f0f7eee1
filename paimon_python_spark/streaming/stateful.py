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
