"""Fixture-table access (driver contract: TESTDATA.md).

One parquet file per table per scale-factor directory.  All readers go
through :func:`table` so predicate pushdown / column pruning behavior is
uniform and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region
# and nation are bounded by geography, not data volume).
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as long
    nanos (``spark.sql.legacy.parquet.nanosAsLong``, session.py); convert
    to a proper timestamp with integer-division truncation to micros —
    the same ns→us truncation DuckDB applies, so oracle values agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Defensive: the driver may hand us a session built without this
        # config; it is runtime-settable.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001 - leave read to fail with real error
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
