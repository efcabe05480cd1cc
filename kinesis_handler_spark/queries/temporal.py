"""Event-time windowing twins of the streaming layer, in batch mode.

SURVEY.md §2.B "Streaming-only" notes that tumbling windows get a
batch-checkable twin (`window_time_bucket`).  This module extends the
same idea to the other two streaming window shapes so their semantics
are DuckDB-hash-checked, not just pytest-asserted:

* `window_time_slide`   — sliding windows (`F.window(ts, width, slide)`),
  the operator behind `streaming.windows.sliding_aggregate`.
* `window_session_batch` — session windows (`F.session_window`), the
  operator behind `streaming.windows.session_aggregate`.
* `window_range_interval` — trailing time-interval RANGE frame, the
  batch analogue of a watermark-bounded sliding state.

Reference parity note: the reference library has no event-time logic at
all (`/root/reference/lib/kinesisHandler.js:29` carries only the arrival
timestamp); these operators are north-star mandate (BASELINE.json:6),
and the streaming variants live in `streaming/windows.py`.

100 TB design: all three shuffle once on (key, window); sliding windows
multiply rows by width/slide (here 2×) BEFORE the shuffle via Spark's
internal Expand — the same cost model as the streaming operator's state
updates.  No Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec, dec_sum
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


@query(
    "window_time_slide",
    oracle="""
    SELECT date_trunc('day', ts) - k * INTERVAL '1' DAY AS w_start,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events, UNNEST([0, 1]) AS t(k)
    WHERE ts IS NOT NULL
    GROUP BY 1
    """,
)
def window_time_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows: width 2 days, slide 1 day — every
    event lands in exactly two windows.  Same ``F.window`` operator the
    streaming sliding aggregate uses; the oracle replicates each row
    into its two epoch-aligned day buckets with UNNEST.  One shuffle on
    the window start; the 2× row expansion happens map-side (Expand),
    which is the irreducible cost of sliding windows at any scale."""
    # Windows are defined only for timestamped rows; the explicit filter
    # matches the oracle and pushes to the scan (F.window would silently
    # drop NULL-ts rows anyway — making it explicit keeps both engines
    # aligned on dirty data).
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            dec_sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "n_users", "total_value")
    )


@query(
    "window_session_batch",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '8' HOUR
                  THEN 1 ELSE 0 END AS new_sess,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts NULLS LAST, event_id NULLS LAST)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY rn
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '8' HOUR AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def window_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (8-hour inactivity gap) via
    ``F.session_window`` — the SAME operator the streaming session
    aggregate uses, here batch-mode with a gap-and-islands oracle.
    Spark merges events whose [ts, ts+gap) ranges overlap, so a new
    session starts exactly when the inter-event gap >= the duration —
    mirrored by the oracle's LAG comparison.  window.end is
    last-event-ts + gap on both sides.  One shuffle on (user_id,
    session); session assembly is a sort within each user partition.
    The oracle's two window passes pin (ts, event_id) NULLS LAST: with
    duplicate timestamps an un-tie-broken ORDER BY ts lets the LAG pass
    and the running-SUM pass order the tie differently, splitting a
    session in two (found by the mixed-null dirty twin; Spark's
    session_window is order-insensitive so only the oracle needed the
    pin).  r6 verdict hardening: (ts, event_id) still is not total under
    FULL-ROW duplicates, so the LAG pass now also emits ROW_NUMBER()
    over the same window and the running-SUM pass orders by that rn —
    one total order shared by both passes, duplicate-row-proof."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS value_1d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour RANGE frame per user: for each event, how many
    events (and how much value) the same user produced in the preceding
    day, inclusive.  Ordering key is integer microseconds on BOTH
    engines so the frame boundary is exact (no float epoch, no ns/us
    disagreement).  RANGE frames include all peer rows with equal
    ordering key, identically in Spark and DuckDB.  One shuffle on
    user_id; per-partition sort; state is a sliding two-pointer — the
    batch analogue of a watermark-bounded stream aggregation."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1d"),
        F.sum(dec("value")).over(w).cast("double").alias("value_1d"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts,
           (p.user_id IS NOT NULL) AS converted,
           epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts) AS lag_us
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (signup → first purchase at-or-after signup):
    per signed-up user, whether they converted and the exact conversion
    lag in integer microseconds.  Each step is a filtered pre-aggregation
    to ONE row per user before any join (reduce-then-join), so the funnel
    costs two narrow shuffles on user_id regardless of events-per-user —
    the sequential-pattern shape every product-analytics pipeline runs.
    """
    e = table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        "signup_ts",
        F.col("first_purchase_ts").isNotNull().alias("converted"),
        (
            F.unix_micros(F.col("first_purchase_ts"))
            - F.unix_micros(F.col("signup_ts"))
        ).alias("lag_us"),
    )


@query(
    "events_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, date_trunc('day', e.ts))
               AS offset_days
      FROM events e JOIN first_day f ON f.user_id = e.user_id
    )
    SELECT cohort_day, CAST(offset_days AS BIGINT) AS offset_days,
           COUNT(*) AS n_users
    FROM active
    GROUP BY cohort_day, offset_days
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, and
    for each (cohort, day-offset) the count of users active that day —
    the table behind every retention curve.  Two aggregations and one
    equi-join, all keyed on user_id / (cohort, offset); the DISTINCT
    collapses per-day activity BEFORE the final count so the last
    shuffle carries at most users×active-days rows.  Day arithmetic is
    integer (date_trunc + day diff), identical in both engines."""
    e = table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = (
        e.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.col("cohort_day")
            ).cast("long").alias("offset_days"),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "events_rolling_distinct",
    oracle="""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    contrib AS (
      SELECT CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day,
             user_id
      FROM ev
    )
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
    FROM contrib GROUP BY 1
    """,
)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (rolling MAU-style metric),
    EXACT tier.  COUNT(DISTINCT) cannot run inside a window frame, so
    the standard scale rewrite applies: each event is exploded to the
    ≤7 report days whose trailing window contains it (map-side ×7 — no
    self-join of days × events), then one distinct-count per day.  The
    shuffle carries (day, user) pairs — bounded by 7×events worst case
    but collapsing to 7×daily-active-users after partial distinct.
    The sketch twin `events_rolling_distinct_hll` replaces the
    distinct-count with mergeable HLL sketches for the 100 TB path."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    contrib = ev.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
        "user_id",
    )
    return contrib.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("users_7d")
    )


@query("events_rolling_distinct_hll")  # rows-only: sketch estimates are
# engine-specific (DataSketches HLL in Spark; DuckDB's HLL differs)
def events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day via MERGEABLE HLL sketches
    — the 100 TB tier of `events_rolling_distinct`.  One pass builds a
    per-day sketch (O(days) rows of ~KB state, vs the exact tier's
    (day, user) shuffle growing with daily actives); the 7-day union
    then merges SKETCHES over a window frame, never re-touching raw
    events.  This is the architecture for any rolling-distinct at
    scale: daily sketches are the stored artifact, and any window
    length (7/28/90-day) derives from the same sketches by union alone.
    The global-ordered window runs on the O(days) rollup (same pattern
    as `events_daily_ma`), not on events.  Estimate error is pinned
    against the exact tier in `tests/test_sketch_quality.py` (HLL
    lgConfigK=12 ⇒ ~1.6% relative standard error)."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    # RANGE over integer day numbers, not ROWS over existing rows: a
    # calendar day with zero events would make a 7-ROW frame silently
    # span MORE than 7 calendar days after the gap — the range frame
    # keeps the trailing window exactly day-6..day regardless of gaps.
    w = Window.orderBy(F.unix_date("day")).rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("bigint")
        .alias("users_7d_est"),
    )
