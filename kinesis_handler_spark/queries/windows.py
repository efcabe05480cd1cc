"""Window functions, top-k per group, and the as-of join.

SURVEY.md §2.B "Window functions" + `join_asof_latest` + `topk_per_group`.
Every window carries a total ordering (deterministic tie-break keys) so
rank/row_number results are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


@query(
    "window_rank_topn",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC NULLS LAST,
                                   c_custkey NULLS LAST) AS rnk
      FROM customer
    ) t
    WHERE rnk <= 3
    """,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation via RANK.  Window shuffles
    once on the partition key; the rank<=3 filter prunes immediately
    after — Spark's WindowGroupLimit pushes the limit into the sort at
    scale."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc_nulls_last(),
    )
    return (
        table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id
                   ORDER BY ts NULLS LAST, event_id NULLS LAST) AS gap_us,
           LEAD(event_type)
             OVER (PARTITION BY user_id
                   ORDER BY ts NULLS LAST, event_id NULLS LAST) AS next_type
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user (sessionization building block).  Gap is
    exact integer microseconds — no float time arithmetic.  NULLS LAST
    pinned on both engines (registry NULL rules): a NULL ts under a
    live user_id must not flip between Spark's NULLS-FIRST and DuckDB's
    NULLS-LAST default sort positions."""
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    us = F.unix_micros(F.col("ts"))
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_running_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id
                        ORDER BY ts NULLS LAST, event_id NULLS LAST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id
                        ORDER BY ts NULLS LAST, event_id NULLS LAST
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS window3_value
    FROM events
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + sliding-frame sums with explicit ROWS frames (exact
    decimal, order-independent).  NULLS LAST pinned on both engines —
    with ROWS frames the sort position of a NULL-ts row changes which
    rows each frame covers, so an unpinned order drifts every running
    sum after the NULL (registry NULL rules)."""
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    v = dec("value")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(v).over(run).cast("double").alias("running_value"),
        F.sum(v).over(last3).cast("double").alias("window3_value"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC NULLS LAST,
                                         o_orderkey NULLS LAST) AS rn
      FROM orders
    ) t
    WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer — row_number + filter, the scalable
    grouped-top-k idiom (single shuffle on the group key)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@query(
    "join_asof_latest",
    oracle="""
    SELECT e.event_id, e.user_id, t.o_orderkey AS last_orderkey
    FROM events e
    LEFT JOIN (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC NULLS LAST,
                                         o_orderkey DESC NULLS LAST) AS rn
      FROM orders
    ) t ON t.o_custkey = e.user_id AND t.rn = 1
    WHERE e.event_type = 'purchase'
    """,
)
def join_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's latest order
    (all fixture orders precede all events, so "latest prior" = latest).
    Implemented as reduce-then-join: the window collapses orders to one
    row per key BEFORE the join, so the join input is minimal — the
    scalable as-of pattern (vs. joining the full history and filtering).
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc_nulls_last(),
        F.col("o_orderkey").desc_nulls_last(),
    )
    latest = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return e.join(latest, e.user_id == latest.o_custkey, "left").select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_orderkey")
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT event_id, user_id, nearest_orderkey, diff_us
    FROM (
      SELECT e.event_id, e.user_id,
             o.o_orderkey AS nearest_orderkey,
             abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) AS diff_us,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate))
                          NULLS LAST,
                        o.o_orderkey NULLS LAST) AS rn
      FROM events e JOIN orders o ON o.o_custkey = e.user_id
      WHERE e.event_type = 'signup'
    ) t
    WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: each signup event matched to the SAME
    user's temporally closest order (absolute time distance, orderkey
    tie-break).  Equi-join on the user key then a per-event argmin
    window — candidate volume is orders-per-user, which the data model
    bounds (tens), so the join output is O(events × orders/user), not a
    cross product; the window's WindowGroupLimit keeps one row per
    event.  Time distance is exact integer microseconds on both
    engines."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    o = table(spark, sf_dir, "orders")
    joined = e.join(o, o.o_custkey == e.user_id)
    # o_orderdate is parquet TIMESTAMP_NTZ; the session runs UTC, so the
    # cast to (LTZ) timestamp is value-preserving and unix_micros exact.
    odate = F.col("o_orderdate").cast("timestamp")
    diff = F.abs(F.unix_micros(F.col("ts")) - F.unix_micros(odate))
    # NULLS LAST pinned (registry NULL rules): a NULL o_orderdate under
    # a live o_custkey makes diff NULL, and Spark's NULLS-FIRST default
    # would crown the unknown-distance order "nearest" while DuckDB's
    # NULLS-LAST picks a real one (caught by the r6 mixed-null twin).
    w = Window.partitionBy("event_id").orderBy(
        diff.asc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("nearest_orderkey"),
            diff.alias("diff_us"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
