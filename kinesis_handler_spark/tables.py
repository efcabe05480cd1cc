"""Fixture-table access (driver contract: TESTDATA.md).

One parquet file per table per scale-factor directory.  All readers go
through :func:`table` so predicate pushdown / column pruning behavior is
uniform and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.deploy import ensure_shipped

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

# Declared dimension of the embeddings table — catalog metadata, the same
# way a real lakehouse records it in table properties.  The vector
# kernels (numpy GEMMs over fixed-dimension matrices) filter rows to
# this dimension rather than trusting every row (tests/test_null_input.py:
# a truncated or over-long vector from a failed embed job must be
# dropped, not crash np.stack).
EMBEDDING_DIM = 64


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
      ``TIMESTAMP_NTZ`` (which ``unix_micros`` rejects); rebuilt
      column-locally from its wall-clock fields (date / hour / minute /
      fractional second — all session-TZ-independent on NTZ inputs) into
      the TIMESTAMP whose ``unix_micros`` treats that wall clock as UTC.

    EVERY table load also pins the session timezone to UTC (loud
    RuntimeError if that fails) — not just events: ``o_orderdate`` and
    ``l_shipdate`` are parquet timestamp[us]-no-tz too, Spark coerces
    TIMESTAMP_NTZ through the SESSION zone the moment an expression
    needs a TIMESTAMP (``date_trunc``, ``to_date``, ``window``...), and
    a non-UTC driver session would silently shift every wall-clock
    derivation (confirmed by review repro: ``date_trunc('month',
    o_orderdate)`` lands at 04:00 under America/New_York).  The pin is
    a session-wide side effect by necessity — those functions have no
    per-column timezone override — and the vanilla sweep value-checks
    wall-clock rollups of both events and orders under hostile zones so
    its removal cannot regress unnoticed (round-5 tried; it did).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Worker-importability layer: operators with Arrow-batched Python
    # stages reference package modules from executor workers; ship the
    # package archive (addPyFile) so a driver launched from ANY cwd —
    # not just the repo root — can run them.  See deploy.py.
    ensure_shipped(spark)
    # WALL-CLOCK determinism layer (all tables): see docstring.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 - checked below
        pass
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        raise RuntimeError(
            "wall-clock determinism requires a UTC session timezone and "
            "it could not be set; refusing to produce TZ-shifted date "
            "buckets"
        )
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
            # read as TIMESTAMP_NTZ, which unix_micros() rejects.  VALUE
            # determinism layer: rebuild the instant column-locally —
            # every term below is a wall-clock FIELD extraction, which on
            # NTZ inputs is session-TZ-independent by definition, and
            # extract(SECOND) carries the fractional part exactly
            # (DECIMAL(8,6), ×1e6 is exact for micro-precision fixtures).
            # unix_micros of the rebuilt column is bit-identical to
            # DuckDB's epoch_us under ANY session timezone, independently
            # of the UTC pin above (belt and suspenders: the pin protects
            # wall-clock DERIVATIONS, this protects the instants).
            micros = (
                F.unix_date(F.col("ts").cast("date")).cast("long")
                * F.lit(86_400_000_000)
                + F.hour("ts").cast("long") * F.lit(3_600_000_000)
                + F.minute("ts").cast("long") * F.lit(60_000_000)
                + F.expr("CAST(extract(SECOND FROM ts) * 1000000 AS BIGINT)")
            )
            df = df.withColumn("ts", F.timestamp_micros(micros))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """SQL entry point: register every fixture table as a temp view
    (same normalized reads as :func:`table`, including the events.ts
    determinism layer), so arbitrary ANSI SQL runs via ``spark.sql`` —
    the surface a user migrating from a SQL warehouse reaches for
    first.  Returns the registered view names."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)
