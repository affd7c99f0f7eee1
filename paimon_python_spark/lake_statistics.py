"""Table statistics — Paimon's ANALYZE surface on a real lake.

Spec (public paimon.apache.org "Concepts > Spec > Statistic" +
"Snapshot"): an ANALYZE commit writes a JSON *table statistic file*
under ``<table>/statistics/`` and stamps its name into the new
snapshot's ``statistics`` field (``commitKind=ANALYZE``, empty delta).
The file carries table-level ``mergedRecordCount`` / ``mergedRecordSize``
and per-column ``colStats``: ``{colId, distinctCount, min, max,
nullCount, avgLen, maxLen}``. Ordinary commits leave the field null, so
a reader walks the snapshot chain backwards for the newest stats at or
below its snapshot — exactly how Paimon's ``table$statistics`` system
table resolves them. The reference SDK has no analyze surface
(py4j/java_implementation.py delegates everything and exposes none);
this is a format-level extension mirroring the JVM writers.

Scale shape: ONE Spark aggregate job over the merged read computes all
requested columns' stats in a single pass (map-side partial aggregation,
one shuffle of per-column partials). ``exact=False`` (the 100 TB
default) uses ``approx_count_distinct`` — an HLL partial per column, no
expand; ``exact=True`` uses ``countDistinct``, whose Expand multiplies
scan rows by the column count (the oracle-matchable mode for tests and
small tables). Everything else (min/max/null-count/length stats) is the
same single hash aggregate either way.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

from pyspark.sql import functions as F
from pyspark.sql import types as T

#: logical byte widths for fixed-size types (documented contract for
#: avgLen/maxLen on non-variable-length columns)
_FIXED_LEN = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.FloatType: 4,
    T.DateType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
}

_VARLEN = (T.StringType, T.BinaryType)


def _is_orderable(dt) -> bool:
    return not isinstance(dt, (T.ArrayType, T.MapType, T.StructType))


def _json_scalar(v):
    """JSON-safe rendering for min/max: native for JSON types, str for
    the rest (dates, timestamps, decimals)."""
    import math

    if v is None or isinstance(v, (int, str)):
        return v
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v
    return str(v)


def analyze_lake(
    table_path: str,
    columns: Optional[list] = None,
    exact: bool = False,
) -> int:
    """ANALYZE the lake's current merged state and commit the stats.

    Computes table-level and per-column statistics in one Spark
    aggregate over the merged read (PK lakes: post-merge rows, the
    ``mergedRecordCount`` the spec names), writes the spec-shaped JSON
    statistic file, and commits an ``ANALYZE`` snapshot referencing it.
    Returns the new snapshot id.
    """
    from paimon_python_spark.paimon_import import (
        latest_paimon_snapshot_id,
        plan_paimon_files,
        read_paimon_schema,
    )
    from paimon_python_spark.paimon_lake import (
        PaimonLakeTable,
        _commit_lake_snapshot,
    )

    info = read_paimon_schema(table_path)
    spark_schema = info.spark_schema
    if columns is None:
        cols = [f.name for f in spark_schema.fields]
    else:
        unknown = [c for c in columns if c not in spark_schema.fieldNames()]
        if unknown:
            raise ValueError(f"analyze_lake: unknown columns {unknown}")
        cols = list(columns)

    base_snapshot = latest_paimon_snapshot_id(table_path)
    rb = PaimonLakeTable(table_path).new_read_builder().with_projection(cols)
    df = rb.new_read().to_df()

    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    per_col: dict = {}
    for c in cols:
        dt = spark_schema[c].dataType
        spec = {"orderable": _is_orderable(dt), "dt": dt}
        per_col[c] = spec
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nul__{c}"))
        if spec["orderable"]:
            aggs.append(distinct(F.col(c)).alias(f"__dc__{c}"))
            aggs.append(F.min(c).alias(f"__min__{c}"))
            aggs.append(F.max(c).alias(f"__max__{c}"))
        if isinstance(dt, _VARLEN):
            aggs.append(F.avg(F.length(c)).alias(f"__avg__{c}"))
            aggs.append(F.max(F.length(c)).alias(f"__maxl__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    field_ids = dict(
        zip([f.name for f in spark_schema.fields], info.field_ids)
    )
    col_stats = {}
    for c in cols:
        dt = per_col[c]["dt"]
        fixed = next(
            (sz for t, sz in _FIXED_LEN.items() if isinstance(dt, t)), None
        )
        avg_len = row.get(f"__avg__{c}")
        col_stats[c] = {
            "colId": int(field_ids[c]),
            "distinctCount": (
                int(row[f"__dc__{c}"]) if f"__dc__{c}" in row else None
            ),
            "min": _json_scalar(row.get(f"__min__{c}")),
            "max": _json_scalar(row.get(f"__max__{c}")),
            "nullCount": int(row[f"__nul__{c}"]),
            "avgLen": (
                fixed
                if fixed is not None
                else (None if avg_len is None else float(avg_len))
            ),
            "maxLen": (
                fixed
                if fixed is not None
                else (
                    None
                    if row.get(f"__maxl__{c}") is None
                    else int(row[f"__maxl__{c}"])
                )
            ),
        }

    merged_size = sum(
        int(e.file_size) for e in plan_paimon_files(table_path, base_snapshot)
    )
    stats = {
        "snapshotId": base_snapshot,
        "schemaId": info.id,
        "mergedRecordCount": int(row["__n"]),
        "mergedRecordSize": merged_size,
        "colStats": col_stats,
    }
    sdir = os.path.join(table_path, "statistics")
    os.makedirs(sdir, exist_ok=True)
    name = f"stats-{uuid.uuid4().hex[:12]}-0"
    tmp = os.path.join(sdir, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, sort_keys=True)
    os.replace(tmp, os.path.join(sdir, name))

    return _commit_lake_snapshot(
        table_path,
        info,
        entries=[],
        n_rows=0,
        commit_kind="ANALYZE",
        statistics=name,
    )


def read_lake_statistics(
    table_path: str, snapshot_id: Optional[int] = None
) -> Optional[dict]:
    """Newest statistic file at or below ``snapshot_id`` (default:
    latest), or None if the table was never analyzed. Walks the
    snapshot chain backwards — ordinary commits leave ``statistics``
    null per the spec, so the walk is how the ``$statistics`` system
    table resolves stats (bounded by retained-snapshot count, pure
    driver-side metadata)."""
    from paimon_python_spark.paimon_import import (
        latest_paimon_snapshot_id,
        read_paimon_snapshot,
    )

    latest = snapshot_id or latest_paimon_snapshot_id(table_path)
    for sid in range(latest, 0, -1):
        spath = os.path.join(table_path, "snapshot", f"snapshot-{sid}")
        if not os.path.exists(spath):
            continue
        snap = read_paimon_snapshot(table_path, sid)
        name = snap.get("statistics")
        if name:
            with open(os.path.join(table_path, "statistics", name)) as f:
                return json.load(f)
    return None
