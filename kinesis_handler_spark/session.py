"""SparkSession construction with scale-appropriate defaults.

Single place where engine-wide configuration lives so tests, bench, and
the driver entry point all run the same way.  Settings chosen for the
100 TB design target (AQE on, skew handling on, Arrow on) while staying
correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kinesis-handler-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to the core count — on a real cluster
    this would be sized to total cores × 2-3; AQE coalesces down anyway.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or 32)
    shuffle = str(shuffle_partitions or max(int(cpus), 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # local[N] = ONE JVM doing driver + executor work; the 1g
        # default heap OOMs under cached micro-batches at bench scale.
        # Honored only at JVM launch (first session in the process).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # AQE: runtime re-plan — broadcast conversion, partition coalescing,
        # skew-join splitting.  Non-negotiable at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # Deterministic wall-clock-independent timestamp semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas-UDF path (the only sanctioned Python hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable natively;
        # read as long and convert in tables.table (micros truncation
        # matches DuckDB's ns→us behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quieter driver logs.
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
