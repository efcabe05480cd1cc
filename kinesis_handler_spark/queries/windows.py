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
    tie-break).

    SKEW-ROBUST SORT-MERGE (r9 rewrite): the original shape — equi-join
    on the user key, then a per-event argmin window — materializes
    O(events_per_user × orders_per_user) joined rows per user, which is
    fine at the data model's nominal tens-of-orders-per-user but
    detonates under a hot key: the r9 skew twin (one user owning 30% of
    events AND orders) put ~10⁹ rows in one partition and the query ran
    >25 min.  The rewrite is the classic as-of sort-merge instead:

    1. orders collapse to one row per (user, order-date) carrying that
       date's min orderkey (the only candidate that date can ever win
       with — tie-break is orderkey ASC at equal distance);
    2. dated order rows and events merge into one per-user TIMELINE
       sorted by time (orders before events at the same instant), and
       two linear window passes give every event its nearest order at
       or before (running ``last``) and strictly after (reverse
       ``first``) — per-user cost is now O((e+o)·log(e+o)) sort, not
       e×o pairs;
    3. the per-event winner is the closer of the two (orderkey
       tie-break at equal distance), falling back to the user's min
       orderkey with NULL distance when no dated order exists (all-
       undated users, NULL event timestamps — diff is NULL exactly
       where the join form made it NULL);
    4. a final row_number over event_id replays the oracle's argmin
       across duplicate event rows (dup-twin semantics: one output row
       per event_id), over ONE candidate row per event row instead of
       the full candidate set.

    Value-identical to the join form (same oracle; skew-twin and chaos
    parity sweeps hash-green) — time distance stays exact integer
    microseconds on both engines, NULLS LAST pinned everywhere
    (registry NULL rules)."""
    # NULL join keys never equi-match: drop them up front on both sides
    # (the oracle's INNER JOIN does the same implicitly).
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .filter(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "ts")
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())

    # per-user existence marker + the all-candidates-NULL-diff fallback
    # winner (min orderkey over ALL the user's orders, NULLS-LAST argmin)
    per_user = o.groupBy(F.col("o_custkey").alias("uid")).agg(
        F.min("o_orderkey").alias("any_okey")
    )
    # o_orderdate is parquet TIMESTAMP_NTZ; the session runs UTC, so the
    # cast to (LTZ) timestamp is value-preserving and unix_micros exact.
    omicros = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    dated = (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_custkey").alias("uid"), omicros.alias("t"))
        .agg(F.min("o_orderkey").alias("okey"))
    )

    ev = e.filter(F.col("ts").isNotNull()).select(
        F.col("user_id").alias("uid"),
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    timeline = dated.select(
        "uid",
        "t",
        F.struct("t", "okey").alias("cand"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_event"),
    ).unionByName(
        ev.select(
            "uid",
            "t",
            F.lit(None)
            .cast("struct<t:bigint,okey:bigint>")
            .alias("cand"),
            "event_id",
            F.lit(1).alias("is_event"),
        )
    )
    # orders sort BEFORE events at the same instant so a same-t order is
    # visible to the backward pass with distance 0 (the forward pass
    # then loses any ≥0-distance tie to it, or ties on the same row).
    # BOTH passes are running [UNBOUNDED PRECEDING, CURRENT ROW] frames
    # — the "after" pass runs over the REVERSED sort instead of a
    # [CURRENT ROW, UNBOUNDED FOLLOWING] suffix frame, which Spark
    # re-aggregates per row (the O(n²) class banned repo-wide by
    # tests/test_plan_quality.py).  In the reversed order events sort
    # before orders at equal t, so the same-t order stays exclusive to
    # the backward pass exactly as in the forward orientation.
    w_fwd = Window.partitionBy("uid").orderBy(
        F.asc("t"), F.asc("is_event")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rev = Window.partitionBy("uid").orderBy(
        F.desc("t"), F.desc("is_event")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    before = F.last("cand", ignorenulls=True).over(w_fwd)
    after = F.last("cand", ignorenulls=True).over(w_rev)
    scanned = (
        timeline.select(
            "uid",
            "t",
            "event_id",
            "is_event",
            before.alias("b"),
            after.alias("a"),
        )
        .filter(F.col("is_event") == 1)
    )
    diff_b = F.col("t") - F.col("b.t")   # b.t <= t
    diff_a = F.col("a.t") - F.col("t")   # a.t >= t
    tie_okey = (
        F.when(F.col("b.okey").isNull(), F.col("a.okey"))
        .when(F.col("a.okey").isNull(), F.col("b.okey"))
        .otherwise(F.least("b.okey", "a.okey"))
    )
    best = (
        F.when(
            F.col("b").isNull() & F.col("a").isNull(),
            F.struct(
                F.lit(None).cast("bigint").alias("diff"),
                F.lit(None).cast("bigint").alias("okey"),
            ),
        )
        .when(F.col("b").isNull(),
              F.struct(diff_a.alias("diff"), F.col("a.okey").alias("okey")))
        .when(F.col("a").isNull(),
              F.struct(diff_b.alias("diff"), F.col("b.okey").alias("okey")))
        .when(diff_b < diff_a,
              F.struct(diff_b.alias("diff"), F.col("b.okey").alias("okey")))
        .when(diff_a < diff_b,
              F.struct(diff_a.alias("diff"), F.col("a.okey").alias("okey")))
        .otherwise(
            F.struct(diff_b.alias("diff"), tie_okey.alias("okey"))
        )
    )
    timed = scanned.select(
        "uid", "event_id", best.alias("best")
    )
    # NULL-timestamp events: every candidate's distance is NULL, so the
    # argmin degenerates to min orderkey over ALL the user's orders.
    null_ts = e.filter(F.col("ts").isNull()).select(
        F.col("user_id").alias("uid"),
        "event_id",
        F.struct(
            F.lit(None).cast("bigint").alias("diff"),
            F.lit(None).cast("bigint").alias("okey"),  # filled from any_okey
        ).alias("best"),
    )
    cands = timed.unionByName(null_ts)
    # inner join = the oracle's existence semantics (users with no
    # orders drop out) and supplies the NULL-diff fallback orderkey
    joined = cands.join(per_user, "uid").select(
        F.col("event_id"),
        F.col("uid").alias("user_id"),
        # when/otherwise, NOT coalesce: a dated winner whose orderkey is
        # legitimately NULL (all orderkeys at the winning date are NULL)
        # must stay NULL at its real distance, not fall back
        F.when(F.col("best.diff").isNotNull(), F.col("best.okey"))
        .otherwise(F.col("any_okey"))
        .alias("nearest_orderkey"),
        F.col("best.diff").alias("diff_us"),
    )
    # replay the oracle's per-event_id argmin across duplicate event
    # rows — one candidate row per event row, so this window is linear
    wfin = Window.partitionBy("event_id").orderBy(
        F.col("diff_us").asc_nulls_last(),
        F.col("nearest_orderkey").asc_nulls_last(),
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            "nearest_orderkey",
            "diff_us",
            F.row_number().over(wfin).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
