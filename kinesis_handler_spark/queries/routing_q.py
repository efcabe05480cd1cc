"""Batch-checkable projections of the routing engine's semantics.

The reference's core pipeline (decode → parse → validate → route →
dead-letter; lib/kinesisHandler.js:107-123,140-155) is a streaming
workload, verified in pytest (tests/test_routing*.py).  These queries
express the same semantics as relational operators over the `events`
table so the DuckDB oracle can hash-check them (SURVEY.md §2.B
"Decode / parse / validate / route").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

# The "registered schema" set — analogue of schemaMethodPairs keys
# (kinesisHandler.js:91-99).  `error` and `view` are deliberately left
# unregistered to exercise the skip path (kinesisHandler.js:120-122).
REGISTERED_TYPES = ("click", "purchase", "signup")


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type, k
    FROM (
      SELECT event_id, event_type,
             CASE WHEN json_type(props, '$.k')
                       IN ('BIGINT', 'UBIGINT', 'VARCHAR')
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events
    ) x
    WHERE k >= 50
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON-string `props` column (reference: JSON.parse at
    kinesisHandler.js:171) and filter on an extracted field.

    Extraction contract (r7 hostile-JSON twin): ``k`` is surfaced when
    ``$.k`` is an integer-valued token within int64 — a bare JSON
    integer or a quoted integer string — and is NULL for everything
    else that is still legal JSON: floats and scientific notation,
    out-of-int64 magnitudes (JSON numbers are unbounded), objects,
    arrays, booleans, JSON null, a missing key, and 1e400 (which
    ``get_json_object`` surfaces as the string ``"Infinity"``).  The
    previous ANSI ``CAST(... AS INT)`` raised on most of those — one
    float in one payload killed the job.  ``try_cast`` encodes the
    NULL-as-unextractable rule; both sides use a real JSON parser, so a
    '"k": 123' substring embedded inside another field's STRING value
    does not fool them (the old regex oracle would have matched it).
    Duplicate-key objects are excluded from the parity contract: RFC
    8259 leaves them interop-undefined and the engines genuinely differ
    (Spark first-wins, DuckDB last-wins).  Scan-fused projection; no
    shuffle."""
    e = table(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') as bigint)")
    return e.select("event_id", "event_type", k.alias("k")).filter(F.col("k") >= 50)


@query(
    "route_case_tag",
    oracle="""
    SELECT
      CASE WHEN event_type IN ('click', 'purchase', 'signup')
           THEN event_type ELSE 'unregistered' END AS route,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def route_case_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based routing as a relational op: tag each row with its
    route (registered event types route to themselves, everything else
    to the `unregistered` side output — reference kinesisHandler.js:
    114-122) and count per route.  At scale this is one pass + one
    small shuffle, vs. the reference's per-record linear registry scan."""
    e = table(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").isin(*REGISTERED_TYPES), F.col("event_type"))
        .otherwise("unregistered")
        .alias("route")
    )
    return e.groupBy(route).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@query(
    "validate_predicate",
    oracle="""
    SELECT
      CASE WHEN user_id IS NOT NULL
            AND event_type IN ('click','error','purchase','signup','view')
            AND value >= 0 AND value <= 400
            AND props LIKE '{%' THEN 'ok' ELSE 'dead_letter' END AS status,
      COUNT(*) AS n,
      CAST(MIN(value) AS DOUBLE) AS min_value,
      CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY 1
    """,
)
def validate_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-as-filter: the engine's analogue of AJV schema checks
    (required fields, enum membership, numeric range — reference
    kinesisHandler.js:108-116).  Rows failing any constraint fall into
    the dead-letter bucket (kinesisHandler.js:12,145-149) — here
    surfaced as a grouped count so the split is hash-checkable."""
    e = table(spark, sf_dir, "events")
    valid = (
        F.col("user_id").isNotNull()
        & F.col("event_type").isin("click", "error", "purchase", "signup", "view")
        & (F.col("value") >= 0)
        & (F.col("value") <= 400)
        & F.col("props").startswith("{")
    )
    return (
        e.groupBy(F.when(valid, "ok").otherwise("dead_letter").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
