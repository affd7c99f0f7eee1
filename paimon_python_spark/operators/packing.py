"""Sequence packing: assign documents to fixed-token-budget training
chunks (the concat-and-chunk step of an LLM data pipeline).

The packer models the standard "concatenate the token stream, slice
every ``budget`` tokens" scheme: each document gets a deterministic
byte-exact offset in its stream, from which its first/last chunk ids
follow by integer division. Everything is a window prefix-sum plus
map-side integer math — no UDF, no driver state.

Scale shape: the prefix sum is per-stream (``partitionBy(stream_col)``),
so streams pack in parallel; within a stream the sum is the one
inherently sequential part of packing and Spark computes it in a single
window pass. At 100 TB you give each worker its own stream key (e.g.
source × date) exactly as this API encourages; chunk ids stay globally
unique as (stream, chunk_in_stream).

Parity: the reference has no corpus-prep operators (it stops at
scan/merge and delegates analytics, pypaimon/api/table_read.py:47-56);
this extends SURVEY §2.5's north-star list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    stream_col: str,
) -> DataFrame:
    """Assign every row its token ``offset`` within its stream (order =
    ``id_col``) and the ``first_chunk``/``last_chunk`` ids of the
    ``budget``-token chunks it lands in after concatenation.

    Output columns (all BIGINT, engine-portable): id, stream,
    ``n_tokens``, ``offset``, ``first_chunk``, ``last_chunk``,
    ``n_chunks_spanned``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens = F.col(token_col).cast("long")
    offset = F.coalesce(F.sum(tokens).over(w), F.lit(0)).cast("long")
    out = df.select(
        F.col(id_col),
        F.col(stream_col),
        tokens.alias("n_tokens"),
        offset.alias("offset"),
    )
    first = F.expr(f"offset div {budget}")
    last = F.expr(f"(offset + n_tokens - 1) div {budget}")
    return (
        out.withColumn("first_chunk", first.cast("long"))
        .withColumn("last_chunk", last.cast("long"))
        .withColumn(
            "n_chunks_spanned",
            (F.col("last_chunk") - F.col("first_chunk") + 1).cast("long"),
        )
    )
