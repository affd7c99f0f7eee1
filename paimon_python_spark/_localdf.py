"""Single-slice driver-local DataFrames.

``spark.createDataFrame(list_of_rows)`` splits the rows into
``defaultParallelism`` slices (32 on local[32]) — so every KB-scale
metadata frame (file plans, capacity plans, DV path lists, index
expansions) fans out into 32 tasks, and any Python-evaluated stage
downstream pays the Python-worker round-trip ~32 times for a handful
of rows. Measured on the r12 profile harness: ~250 ms of task time per
task, i.e. ~8 s of task time and 0.3-0.8 s of wall clock per such job,
several times per lake commit (guide §2.4, §4.1).

``local_df`` pins the slice count to the ROW count (capped at the
session's default parallelism), so a 4-row plan frame is 4 tasks and a
2,000-file plan frame still fans out to the full cluster width. Use it
for every driver-built list-of-rows frame; data-scale frames coming
from real scans are unaffected.
"""

from __future__ import annotations


def local_df(spark, rows, schema, max_slices: int | None = None):
    """``spark.createDataFrame(rows, schema)`` with slices = number of
    rows (bounded by ``max_slices``, default the session's parallelism)
    instead of unconditional ``defaultParallelism`` empty slices."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # one EMPTY slice, not defaultParallelism empty slices — a
        # 32-slice empty frame unioned/joined into a plan widens every
        # downstream Python-evaluated stage to 32 near-empty tasks
        return spark.createDataFrame(
            spark.sparkContext.parallelize([], 1), schema
        )
    cap = (
        max_slices
        if max_slices is not None
        else spark.sparkContext.defaultParallelism
    )
    n = max(1, min(len(rows), cap))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=n), schema
    )
