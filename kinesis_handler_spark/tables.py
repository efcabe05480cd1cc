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
      ``TIMESTAMP_NTZ`` (which ``unix_micros`` rejects); rebuilt
      column-locally from its wall-clock fields (date / hour / minute /
      fractional second — all session-TZ-independent on NTZ inputs) into
      the TIMESTAMP whose ``unix_micros`` treats that wall clock as UTC.

    Reading ``events`` ALSO pins the session timezone to UTC (loud
    RuntimeError if that fails): Spark evaluates ``to_date`` /
    ``date_trunc`` / ``window`` over TIMESTAMP in the session zone, so
    without the pin every wall-clock derivation would silently shift
    under a non-UTC driver session even though the underlying instants
    are exact.  See the inline comment for the two-layer rationale.
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
        # Two independent determinism layers for events.ts:
        #   1. the VALUE layer below rebuilds the instant column-locally
        #      from wall-clock fields, so unix_micros(ts) is bit-stable
        #      under any session timezone with no conf dependence;
        #   2. this WALL-CLOCK layer pins the session timezone to UTC so
        #      downstream derivations (to_date, date_trunc, window,
        #      session_window — which Spark evaluates in the SESSION
        #      zone) match DuckDB's naive-timestamp semantics too.
        # Layer 2 is a session-wide side effect by necessity: those
        # functions have no per-column timezone override.  Removing it
        # (round-5 first attempt) kept unix_micros green but made every
        # to_date/date_trunc events query silently TZ-dependent — the
        # exact wrong-but-plausible failure class of rounds 2-3; the
        # vanilla sweep now value-checks a to_date rollup under hostile
        # zones so this cannot regress unnoticed.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:  # noqa: BLE001 - checked below
            pass
        if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            raise RuntimeError(
                "events wall-clock determinism requires a UTC session "
                "timezone and it could not be set; refusing to produce "
                "TZ-shifted date buckets"
            )
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Fixtures written as parquet timestamp[us] WITHOUT a timezone
            # read as TIMESTAMP_NTZ, which unix_micros() rejects.  A plain
            # NTZ->TIMESTAMP cast interprets the wall clock in the SESSION
            # timezone, so earlier revisions pinned the session TZ to UTC
            # here — a global mutation hidden inside a read.  Instead,
            # rebuild the instant column-locally: every term below is a
            # wall-clock FIELD extraction, which on NTZ inputs is
            # session-TZ-independent by definition, and extract(SECOND)
            # carries the fractional part exactly (DECIMAL(8,6), ×1e6 is
            # exact for micro-precision fixtures).  unix_micros of the
            # rebuilt column is bit-identical to DuckDB's epoch_us under
            # ANY host/session timezone, with no conf touched.
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
