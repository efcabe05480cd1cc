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

    ``events.ts`` has shipped in two physical shapes across fixture
    generations; both are normalized here to a session-TZ-independent
    ``TIMESTAMP`` column whose ``unix_micros`` equals DuckDB's
    ``epoch_us``:

    * parquet TIMESTAMP(NANOS) → Spark reads long nanos
      (``spark.sql.legacy.parquet.nanosAsLong``, session.py); converted
      with integer-division truncation to micros (DuckDB's ns→us rule);
    * parquet timestamp[us] with no timezone → Spark reads
      ``TIMESTAMP_NTZ`` (which ``unix_micros`` rejects); cast to
      ``TIMESTAMP`` under a UTC session timezone.
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
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Fixtures written as parquet timestamp[us] WITHOUT a timezone
            # read as TIMESTAMP_NTZ, which unix_micros() rejects.  Pin the
            # session timezone to UTC first (runtime-settable, same pattern
            # as the nanosAsLong guard above) so the NTZ->TIMESTAMP cast is
            # wall-clock-preserving under ANY host timezone; unix_micros of
            # the cast column is then bit-identical to DuckDB's epoch_us.
            # (Deliberate session-wide side effect: every timestamp the
            # engine surfaces is UTC-deterministic, cf. session.py.)
            try:
                spark.conf.set("spark.sql.session.timeZone", "UTC")
            except Exception:  # noqa: BLE001 - checked below
                pass
            if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
                # Refuse to produce silently TZ-shifted epochs: a cast
                # under a non-UTC session would yield wrong-but-plausible
                # values for every events query.  Loud failure is the
                # dead-letter contract.
                raise RuntimeError(
                    "events.ts is TIMESTAMP_NTZ and the session timezone "
                    "could not be pinned to UTC; cannot normalize "
                    "timestamps deterministically"
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
