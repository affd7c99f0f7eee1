"""SparkSession management.

The reference boots a child JVM lazily on first catalog use
(pypaimon/py4j/java_gateway.py:62-101). Our equivalent is a lazily
created (or externally injected) SparkSession with scale-appropriate
defaults: AQE on, Arrow on, UTC timezone (so DuckDB-oracle timestamp
comparisons are stable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_SPARK: SparkSession | None = None


def set_spark(spark: SparkSession) -> None:
    """Inject an externally managed SparkSession (e.g. the driver's)."""
    global _SPARK
    _SPARK = spark


def get_spark() -> SparkSession:
    """Return the active SparkSession, creating a local one if needed.

    Local-mode defaults; on a real cluster the caller owns the session
    and should use :func:`set_spark`.
    """
    global _SPARK
    if _SPARK is not None:
        return _SPARK
    active = SparkSession.getActiveSession()
    if active is not None:
        _SPARK = active
        return _SPARK
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    _SPARK = configure_builder(
        SparkSession.builder.master(f"local[{cpus}]").appName("paimon_python_spark"),
        shuffle_partitions=int(cpus),
    ).getOrCreate()
    _SPARK.sparkContext.setLogLevel("WARN")
    return _SPARK


def configure_builder(builder: SparkSession.Builder, shuffle_partitions: int = 32):
    """Apply the engine's recommended configs to a SparkSession builder.

    These are the settings we want at any scale: AQE for runtime
    re-planning (skew joins, partition coalescing), Arrow for the
    Python boundary, UTC session timezone for deterministic timestamp
    semantics across engines.
    """
    return (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # INT96 timestamps carry no parquet stats (no row-group pruning,
        # no stats-derived watermarks); MICROS is the interop encoding
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
