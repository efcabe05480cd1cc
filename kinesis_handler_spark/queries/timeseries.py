"""Time-series shaping operators (round 5, session 2): gap-fill with
linear interpolation, SCD2 validity intervals, and the SQL:2011 window
extensions Spark lacks (GROUPS frames, frame EXCLUSION).

These are the series-repair / history-tracking operators every
warehouse-grade engine ships and the reference library (a per-record
Lambda router, lib/kinesisHandler.js — no temporal surface at all)
leaves to the consumer.  All are oracle-backed and follow the
registry.py determinism rules: exact DECIMAL arithmetic inside
aggregates, one final decimal→double conversion, identical IEEE op
trees for per-row float math, deterministic tie-breaks.

100 TB design notes per query in the docstrings; the common theme is
that each shuffles once on its entity key and does all sequence logic
inside the per-key sort (window functions), never via self-joins of a
table against its own history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec, dec_sum
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


@query(
    "events_gapfill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS obs
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    joined AS (
      SELECT s.user_id, s.day, d.obs
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    ),
    bounded AS (
      SELECT user_id, day, obs,
             last_value(obs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
             last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_day,
             first_value(obs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day NULLS LAST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
             first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day NULLS LAST
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_day
      FROM joined
    )
    SELECT user_id, day,
           CASE WHEN obs IS NOT NULL THEN obs
                ELSE prev_val + (next_val - prev_val)
                     * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                        / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
           END AS value_filled,
           obs IS NOT NULL AS is_observed
    FROM bounded
    """,
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily series repair: build the dense calendar spine from
    each user's first to last active day (``sequence`` + ``explode`` —
    map-side, no join against a calendar table), left-join the observed
    daily totals, and linearly interpolate interior gaps between the
    surrounding observations (endpoints are always observed because the
    spine is bounded by MIN/MAX observed day, so prev/next always
    exist on gap rows).

    Determinism: daily totals are exact decimal sums surfaced once as
    DOUBLE; the interpolation ``prev + (next - prev) * (gap_pos /
    gap_len)`` is the identical IEEE op tree on both engines (each of
    +,-,*,/ is a single correctly-rounded operation on bit-identical
    inputs).

    100 TB: one shuffle to (user_id, day) daily totals, one shuffle to
    user_id for span+spine+window; spine expansion is bounded by
    calendar-days-per-user and happens map-side after the span agg.
    Sequence logic is two window passes inside the per-user sort — no
    self-join of days × observations."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(dec_sum("value").alias("obs"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The forward fill is expressed as a RUNNING frame over day DESC, not
    # a [CURRENT ROW, UNBOUNDED FOLLOWING] frame over day ASC: Spark's
    # UnboundedFollowing frame re-aggregates suffixes per row — O(n^2)
    # per user — while the running UnboundedPreceding frame streams in
    # O(n).  Identical output (last non-null at-or-after = last non-null
    # at-or-before in reverse order); the r7 extreme-timestamp twin
    # turned a 213k-day spine user from 21+ min into seconds.
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc_nulls_last("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = F.col("obs")
    obs_day = F.when(obs.isNotNull(), F.col("day"))
    bounded = joined.select(
        "user_id",
        "day",
        "obs",
        F.last("obs", ignorenulls=True).over(back).alias("prev_val"),
        F.last(obs_day, ignorenulls=True).over(back).alias("prev_day"),
        F.last("obs", ignorenulls=True).over(fwd).alias("next_val"),
        F.last(obs_day, ignorenulls=True).over(fwd).alias("next_day"),
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    ).cast("double")
    filled = F.when(obs.isNotNull(), obs).otherwise(
        F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
    )
    return bounded.select(
        "user_id",
        "day",
        filled.alias("value_filled"),
        obs.isNotNull().alias("is_observed"),
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER w AS prev_type,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts NULLS LAST, event_id NULLS LAST)
    ),
    flagged AS (
      SELECT user_id, event_type, ts, rn,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ordered
    ),
    ver AS (
      SELECT user_id, event_type, ts,
             CAST(SUM(chg) OVER (
               PARTITION BY user_id
               ORDER BY rn
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM flagged
    ),
    grp AS (
      SELECT user_id, version,
             MIN(event_type) AS event_type,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM ver GROUP BY user_id, version
    )
    SELECT user_id, version, event_type, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY version) AS valid_to,
           n_events
    FROM grp
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: treat
    each user's event stream as attribute changes (the attribute being
    ``event_type``), collapse consecutive duplicates (gaps-and-islands
    via LAG + running SUM), and emit one validity interval per run —
    ``valid_from`` = first event of the run, ``valid_to`` = start of
    the next run (NULL on the current/open interval, the SCD2
    convention).  Deterministic ordering: (ts, event_id) tie-break with
    NULLS LAST pinned explicitly on both engines — Spark ascending
    sorts default NULLS FIRST, DuckDB NULLS LAST, so an unpinned order
    would drift version numbering the moment a NULL ts appears under a
    live user_id (the ADVICE r5 find; the mixed-null events twin now
    exercises exactly that shape).  NULL-ts events deterministically
    close each user's history rather than being dropped — SCD2 keeps
    every change record.

    Duplicate-row-proof oracle (r6 verdict find): with full-row
    duplicates, (ts, event_id) is not a total order, and an oracle that
    sorts the LAG pass and the running-SUM pass independently lets
    DuckDB permute the tied rows *between* passes (~5% of runs),
    detaching the chg=1 flag from its boundary row.  The oracle now
    emits ROW_NUMBER() in the SAME window pass as the LAG and orders
    every later pass by that rn — one total order by construction, so
    both passes agree however the tie was broken.  Spark needs no such
    fix: both windows share one sort inside one physical operator.

    This is the MERGE/upsert-history primitive a warehouse applies when
    ingesting CDC feeds; expressed as pure windowed DataFrame ops it
    needs exactly one shuffle on user_id — change detection, run
    numbering, grouping, and the LEAD back-reference all happen inside
    the same per-user sort order (Spark reuses the partitioning; the
    groupBy on (user_id, version) is partial-aggregated map-side
    within already-sorted partitions)."""
    e = table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(order).isNull()
            | (F.lag("event_type").over(order) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    ver = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("version"),
    )
    grp = ver.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    by_ver = Window.partitionBy("user_id").orderBy("version")
    return grp.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(by_ver).alias("valid_to"),
        "n_events",
    )


@query(
    "events_cdc_apply",
    oracle="""
    WITH chg AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN user_id
                  ELSE ((user_id % 97) + 97) % 97 + 1000000000 END AS key,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             ts, event_id, event_type,
             CASE WHEN value = 0e0 THEN 0e0 ELSE value END AS valz
      FROM events
    ),
    ranked AS (
      SELECT key, op, valz,
             ROW_NUMBER() OVER (
               PARTITION BY key
               ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST,
                        event_type DESC NULLS LAST, valz DESC NULLS LAST
             ) AS rn
      FROM chg
    ),
    w AS (SELECT key AS wkey, op, valz FROM ranked WHERE rn = 1),
    snap AS (
      SELECT c_custkey AS skey, c_name, c_acctbal, 1 AS in_snap
      FROM customer
    )
    SELECT COALESCE(s.skey, w.wkey) AS custkey,
           CASE WHEN w.op IS NULL THEN 'kept'
                WHEN s.in_snap = 1 THEN 'updated'
                ELSE 'inserted' END AS status,
           s.c_name AS c_name,
           CASE WHEN w.op = 'U' THEN w.valz ELSE s.c_acctbal END AS acctbal
    FROM snap s FULL JOIN w ON s.skey = w.wkey
    WHERE w.op IS NULL OR w.op = 'U'
    """,
)
def events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE-apply: fold a change feed into a dimension snapshot
    with last-writer-wins upsert/delete semantics — the ``MERGE INTO``
    primitive a lakehouse runs on every CDC ingest, expressed without a
    table format: events become changes keyed into the customer key
    space (even event_ids update/delete their user's row; odd ones land
    in a disjoint insert key space via overflow-safe ``pmod(user_id,
    97) + 10^9`` — the extreme-key rule forbids multiplying raw keys),
    ``error`` events are tombstones.  Per key the LAST change wins;
    the merged output classifies every surviving row ``kept`` /
    ``updated`` / ``inserted`` and drops tombstoned keys.

    Determinism: one ROW_NUMBER pass picks the winner; its sort key
    (ts, event_id, event_type, value — all DESC NULLS LAST) includes
    EVERY column the output consumes, so rows tied on the full key are
    payload-identical and any tie-break yields the same hash (the rn
    rule, single-pass form).  ``value`` is -0.0-canonicalized before
    sorting or emitting so the engines cannot disagree on a signed-zero
    pick.  NULL keys never equi-match: NULL-key snapshot rows surface
    as ``kept``, the NULL-key change winner as ``inserted`` — total, no
    filters.

    100 TB: the change feed shuffles ONCE on the merge key for the
    window (partial WindowGroupLimit-style pruning doesn't apply to
    row_number-pick-1, but the frame is change-sized, not
    snapshot-sized), then one shuffle-or-broadcast full-outer join
    against the snapshot; classification and deletion are row-local
    CASEs.  This is exactly the shuffle profile of a Delta/Iceberg
    MERGE rewrite job — no per-key state, no collect."""
    e = table(spark, sf_dir, "events")
    valz = (
        F.when(F.col("value") == F.lit(0.0), F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("valz")
    )
    chg = e.select(
        F.when((F.col("event_id") % 2) == 0, F.col("user_id"))
        .otherwise(
            F.expr("pmod(user_id, 97L)") + F.lit(1_000_000_000).cast("bigint")
        )
        .alias("key"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts",
        "event_id",
        "event_type",
        valz,
    )
    pick = Window.partitionBy("key").orderBy(
        F.desc_nulls_last("ts"),
        F.desc_nulls_last("event_id"),
        F.desc_nulls_last("event_type"),
        F.desc_nulls_last("valz"),
    )
    last = (
        chg.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(F.col("key").alias("wkey"), "op", "valz")
    )
    snap = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skey"),
        "c_name",
        "c_acctbal",
        F.lit(1).alias("in_snap"),
    )
    merged = snap.join(last, snap.skey == last.wkey, "full")
    return merged.where(
        F.col("op").isNull() | (F.col("op") == "U")
    ).select(
        F.coalesce("skey", "wkey").alias("custkey"),
        F.when(F.col("op").isNull(), F.lit("kept"))
        .when(F.col("in_snap") == 1, F.lit("updated"))
        .otherwise(F.lit("inserted"))
        .alias("status"),
        F.col("c_name").alias("c_name"),
        F.when(F.col("op") == "U", F.col("valz"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
    )


@query(
    "window_groups_frame",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS gsum
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    idx AS (
      SELECT user_id, day, gsum,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day NULLS LAST) AS BIGINT) AS gi
      FROM daily
    ),
    win AS (
      SELECT user_id, day,
             CAST(SUM(gsum) OVER (
               PARTITION BY user_id ORDER BY gi
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
               AS group_sum
      FROM idx
    )
    SELECT e.event_id, e.user_id, w.day, w.group_sum
    FROM (SELECT event_id, user_id,
                 CAST(date_trunc('day', ts) AS DATE) AS day
          FROM events WHERE ts IS NOT NULL) e
    JOIN win w ON e.user_id = w.user_id AND e.day = w.day
    """,
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 GROUPS-frame window semantics — ``SUM(value) OVER
    (PARTITION BY user_id ORDER BY day GROUPS BETWEEN 1 PRECEDING AND 1
    FOLLOWING)``: each event sees the total over its own ORDER-BY peer
    group (its calendar day) plus the adjacent peer group on each side,
    regardless of how many rows each group holds.  Neither Spark nor
    DuckDB implements GROUPS mode, so both sides use the canonical
    rewrite: aggregate per peer group, number groups densely
    (ROW_NUMBER over the distinct-group table ≡ DENSE_RANK over rows),
    run an integer-RANGE frame over the group index, and join the
    per-group result back to rows.  Event-time hygiene per the registry
    NULL rules: ``ts IS NOT NULL`` filtered at the scan on both engines
    (a NULL calendar day is not a peer group; the equi-join back would
    drop those rows anyway) and the group ordering pins NULLS LAST.

    Determinism: group subtotals stay DECIMAL through the window sum
    (addition of exact decimals is associative, so partial-aggregation
    order cannot matter) with one final DOUBLE cast.

    100 TB: one shuffle on (user_id, day) for group totals, one on
    user_id for the two window passes — both tiny relative to the fact
    table — then a co-partitioned join back on (user_id, day) that AQE
    turns into a broadcast at bench scale.  The generally-applicable
    GROUPS emulation: never a rows × rows self-join."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "value",
        )
    )
    daily = e.groupBy("user_id", "day").agg(
        F.sum(dec("value")).alias("gsum")
    )
    idx = daily.select(
        "user_id",
        "day",
        "gsum",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.asc_nulls_last("day")))
        .cast("bigint")
        .alias("gi"),
    )
    win = idx.select(
        "user_id",
        "day",
        F.sum("gsum")
        .over(
            Window.partitionBy("user_id").orderBy("gi").rangeBetween(-1, 1)
        )
        .cast("double")
        .alias("group_sum"),
    )
    return e.select("event_id", "user_id", "day").join(
        win, ["user_id", "day"]
    ).select("event_id", "user_id", "day", "group_sum")


@query(
    "window_frame_exclude",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT event_id, user_id, day,
           CAST(COALESCE(SUM(v) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW), 0) AS DOUBLE) AS loo_sum,
           CAST(COALESCE(SUM(v) OVER (
             PARTITION BY user_id ORDER BY day
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE GROUP), 0) AS DOUBLE) AS other_days_sum,
           CAST(COALESCE(SUM(v) OVER (
             PARTITION BY user_id ORDER BY day
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE TIES), 0) AS DOUBLE) AS ties_kept_sum
    FROM e
    """,
)
def window_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 window frame EXCLUSION — the leave-one-out aggregate
    family (e.g. leave-one-out target encoding in ML feature
    pipelines): per event, the user's total over OTHER events (EXCLUDE
    CURRENT ROW), over other DAYS (EXCLUDE GROUP — drops the whole
    ORDER-BY peer group), and keeping only the current row of its peer
    group (EXCLUDE TIES).  Spark has no EXCLUDE clause; the canonical
    rewrite is subtraction over exact decimals — partition total minus
    the excluded slice (row value / peer-group subtotal) — which is
    associativity-safe because decimal arithmetic is exact.  The DuckDB
    oracle uses its NATIVE EXCLUDE implementation, so the hash match
    certifies the rewrite against an independent implementation of the
    standard (empty exclusion frames: SQL yields NULL, the rewrite
    yields exact 0 — reconciled by COALESCE, the documented semantic
    choice).

    100 TB: ONE shuffle on user_id; both window frames are unbounded,
    so no running state — the two sums compute in one pass over each
    sorted partition, and the subtractions are per-row projections."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        dec("value").alias("v"),
    )
    wu = Window.partitionBy("user_id")
    wd = Window.partitionBy("user_id", "day")
    # SUM skips NULL values, so an excluded NULL-valued row removes
    # nothing and an all-NULL slice totals 0 (the oracle's COALESCE) —
    # coalesce each term so the subtraction rewrite matches the native
    # EXCLUDE semantics on dirty data too.
    zero = F.lit(0).cast("decimal(18,6)")
    total = F.coalesce(F.sum("v").over(wu), zero)
    day_sum = F.coalesce(F.sum("v").over(wd), zero)
    v = F.coalesce(F.col("v"), zero)
    return e.select(
        "event_id",
        "user_id",
        "day",
        (total - v).cast("double").alias("loo_sum"),
        (total - day_sum).cast("double").alias("other_days_sum"),
        (total - day_sum + v).cast("double").alias("ties_kept_sum"),
    )
