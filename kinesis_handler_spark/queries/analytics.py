"""Advanced analytics operators (round 7, second wave): recursive-CTE
hierarchy walk, time-weighted averaging, interval-overlap self-join,
and per-group Pareto skyline.

These close the remaining "a relational engine should have this"
surface beyond the reference's routing core (lib/kinesisHandler.js has
no query surface — SURVEY.md §2.B north-star mandates):

* ``sql_recursive_cte`` — Spark 4's recursive CTE execution
  (UnionLoopExec): iterative plans expressed declaratively instead of
  a driver-side loop.  The walk is a key-encoded hierarchy (parent of
  key k is k >> 1 — a binary-heap encoding, the standard implicit
  tree), so the recursion depth is ≤ 63 for ANY BIGINT key: total over
  the full extreme-key twin domain with no cycle risk (every negative
  / 0 / 1 key is its own root, matching both engines' arithmetic
  shift).
* ``agg_time_weighted_avg`` — the irregular-sampling aggregate every
  metering / pricing / sensor pipeline needs: each observed level
  counts proportionally to how long it was in force, not once per
  sample.
* ``join_interval_overlap`` — self interval-overlap join keyed by an
  equi-join column; the range predicate rides on the per-key
  sort-merge join, never a cartesian.
* ``window_skyline_pareto`` — 2-D Pareto frontier per group via the
  sort + running-extreme rewrite (O(n log n), shuffle-parallel by
  group), not the quadratic dominance anti-join.

All four follow the registry.py determinism rules: exact integer /
decimal arithmetic inside, one decimal→double conversion at the end
(FLOOR-quantized where magnitudes can cross 2^53), every computed
column aliased identically on both engines, NULL keys filtered as
documented totality rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec_t
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

#: 30 days in microseconds — the order-validity window length for the
#: interval-overlap join.
_OVERLAP_US = 30 * 24 * 3600 * 1_000_000

_RECURSIVE_SQL_DUCK = """
WITH RECURSIVE walk(root_key, cur, depth) AS (
  SELECT p_partkey, p_partkey, 0
  FROM (SELECT DISTINCT p_partkey FROM part WHERE p_partkey IS NOT NULL) s
  UNION ALL
  SELECT root_key, cur >> 1, depth + 1 FROM walk WHERE cur > 1
), final AS (
  SELECT root_key, MAX(depth) AS depth FROM walk GROUP BY root_key
)
SELECT CAST(depth AS INTEGER) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       MIN(root_key) AS min_key,
       MAX(root_key) AS max_key
FROM final
GROUP BY depth
"""

# Identical text except the shift spelling: Spark has no infix >>;
# shiftright IS the arithmetic shift (two's complement, sign-
# preserving), bit-identical to DuckDB's >> on BIGINT — verified on
# negative keys (-5 >> 1 = -3 on both engines).
_RECURSIVE_SQL_SPARK = _RECURSIVE_SQL_DUCK.replace("cur >> 1", "shiftright(cur, 1)")


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL_DUCK)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy walk through the SQL entry point: every
    part key climbs its implicit binary-heap ancestry (parent(k) =
    k >> 1) to the root, and the result is the depth histogram — depth,
    key count, and the key range at each depth.

    This exercises Spark 4's native recursive CTE execution
    (UnionLoopExec): the anchor seeds DISTINCT non-NULL keys (so
    duplicate-row twins don't multiply recursion work), each iteration
    is one whole-stage-codegen'd shift-and-filter over the previous
    step's frontier, and Catalyst unions the bounded ≤63 iterations
    (the depth of the deepest BIGINT) — a driver-side loop would pay a
    job per level and lose lineage.  Arithmetic right shift is total
    over the full extreme-key twin domain: negative / 0 / 1 keys are
    depth-0 roots on both engines, so no input can cycle.  At 100 TB
    the frontier shrinks geometrically (half the keys drop out per
    level after log2(maxkey) levels... in this key-encoded tree every
    key survives to its own depth, but each iteration is a
    shuffle-free map over the surviving frontier), and the final
    depth histogram is a bounded ≤64-row aggregate."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_RECURSIVE_SQL_SPARK)


@query(
    "agg_time_weighted_avg",
    oracle="""
    WITH lvl AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS lvl
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ), g AS (
      SELECT user_id, us, lvl,
             CAST(LEAD(us) OVER (PARTITION BY user_id ORDER BY ts) - us
                  AS DECIMAL(19,0)) AS gap_us
      FROM lvl
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MAX(us) - MIN(us) AS span_us,
           CASE WHEN MAX(us) - MIN(us) > 0
                THEN CAST(CAST(FLOOR(SUM(lvl * gap_us)) AS DECIMAL(38,0))
                          AS DOUBLE)
                     / CAST(MAX(us) - MIN(us) AS DOUBLE)
                ELSE NULL END AS twa
    FROM g
    GROUP BY user_id
    """,
)
def agg_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average level per user: each observed level holds
    until the next observation, so it contributes level × holding-time
    — the metering/pricing aggregate a plain AVG gets wrong whenever
    sampling is irregular.

    Duplicate instants collapse FIRST (exact decimal SUM per
    (user_id, ts)), which makes the window's ORDER BY ts unique per
    partition BY CONSTRUCTION — the gaps-and-islands oracle-flake
    class (r6 verdict) cannot occur because there is exactly one
    window pass and its order key is total.  All arithmetic is exact:
    integer microsecond gaps (events timestamps are TIMESTAMP_NS-range
    bounded, so |Δus| ≤ 1.9e16 — int64-safe), DECIMAL(18,4) levels ×
    DECIMAL(19,0) gaps summed exactly, then ONE FLOOR-quantized
    integer→double conversion (the 2^53 rule: Σ lvl·gap ≤ max|lvl| ×
    span can cross 2^53 on wide spans) and ONE IEEE division by the
    span.  Zero-span users (a single instant) yield NULL — there is no
    interval to average over, and ANSI division by zero would
    otherwise kill the job.  Plan: one shuffle for the (user, ts)
    collapse, one for the per-user window, and the final per-user
    aggregate reuses the window's user_id clustering."""
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    lvl = (
        e.groupBy("user_id", "ts")
        .agg(
            F.sum(dec_t(F.col("value"), "decimal(12,4)"))
            .cast("decimal(18,4)")
            .alias("lvl")
        )
        .withColumn("us", F.unix_micros("ts"))
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"))
    g = lvl.select(
        "user_id",
        "us",
        "lvl",
        (F.lead("us").over(w) - F.col("us")).cast("decimal(19,0)").alias("gap_us"),
    )
    span = F.max("us") - F.min("us")
    num = F.floor(F.sum(F.col("lvl") * F.col("gap_us"))).cast("decimal(38,0)")
    agg = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        span.alias("span_us"),
        num.cast("double").alias("_num"),
    )
    return agg.select(
        "user_id",
        "n_points",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.col("_num") / F.col("span_us").cast("double"),
        ).alias("twa"),
    )


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS us
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
        AND o_orderdate IS NOT NULL
    )
    SELECT a.o_custkey AS o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(a.us - b.us) < {_OVERLAP_US}
    GROUP BY 1
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: treat every order as a 30-day
    validity interval and count, per customer, the pairs of their own
    orders whose intervals overlap — the concurrency/clash primitive
    behind double-booking detection and temporal foreign keys.

    Equal-length intervals overlap iff |start difference| < length, so
    the predicate is ONE exact int64 comparison on microsecond epochs
    (order dates are year 1–9999 bounded on both engines: |Δus| ≤
    3.2e17, no overflow even between the calendar extremes of the
    temporal twin).  The o_custkey equi-key rides the sort-merge join
    — candidate pairs are only ever generated within one customer's
    orders (bounded per-customer fanout), never across the corpus: at
    100 TB this shuffles each side once on the key and streams the
    per-key blocks, where a naive date-range band join would be a
    cartesian.  The strict o_orderkey < o_orderkey ordering de-mirrors
    pairs and drops self-pairs on both engines identically (NULL keys
    filtered as documented totality)."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
        )
        .select(
            "o_custkey",
            "o_orderkey",
            # o_orderdate is parquet TIMESTAMP_NTZ; the session runs
            # UTC (tables.py pins it), so the cast to (LTZ) timestamp
            # is value-preserving and unix_micros exact — the
            # join_asof_nearest idiom.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
        )
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.abs(F.col("a.us") - F.col("b.us")) < F.lit(_OVERLAP_US)),
    )
    return pairs.groupBy(F.col("a.o_custkey").alias("o_custkey")).agg(
        F.count(F.lit(1)).alias("n_overlapping_pairs")
    )


@query(
    "window_skyline_pareto",
    oracle="""
    WITH g AS (
      SELECT p_brand, p_size, p_retailprice AS price,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part
      WHERE p_brand IS NOT NULL AND p_size IS NOT NULL
        AND p_retailprice IS NOT NULL
      GROUP BY 1, 2, 3
    ), m AS (
      SELECT *, MIN(price) OVER (PARTITION BY p_brand, p_size) AS min_sz
      FROM g
    ), f AS (
      SELECT p_brand, p_size, price, n_parts FROM m WHERE price = min_sz
    ), d AS (
      SELECT *,
             MIN(price) OVER (
               PARTITION BY p_brand ORDER BY p_size DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS min_larger
      FROM f
    )
    SELECT p_brand, p_size, price, n_parts
    FROM d
    WHERE min_larger IS NULL OR price < min_larger
    """,
)
def window_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline per brand: the parts not dominated within their
    brand under (maximize p_size, minimize price) — a part is OFF the
    frontier iff some part of the same brand has size ≥ and price ≤
    with at least one strict.  The product-search / plan-choice
    primitive.

    Rewrite, not the quadratic dominance anti-join: collapse to
    distinct (brand, size, price) points, keep the cheapest price per
    size (same-size dominance), then one running-extreme window per
    brand ordered by size DESC — the RANGE … 1 PRECEDING frame sees
    exactly the STRICTLY larger sizes (size peers are excluded by the
    offset), so a point survives iff its price undercuts every larger
    size's best.  O(n log n) per brand, shuffle-parallel across
    brands; at 100 TB the dominance anti-join would be per-brand
    quadratic.  Prices are compared raw (no arithmetic → no rounding
    to diverge); exact-duplicate parts are counted into n_parts, and
    equal (size, price) ties don't dominate each other, so both
    engines keep identical frontier multiplicity.  NULL
    brand/size/price rows cannot rank (documented totality filter)."""
    g = (
        table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isNotNull()
            & F.col("p_size").isNotNull()
            & F.col("p_retailprice").isNotNull()
        )
        .groupBy("p_brand", "p_size", F.col("p_retailprice").alias("price"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    w_sz = Window.partitionBy("p_brand", "p_size")
    f = g.withColumn("min_sz", F.min("price").over(w_sz)).filter(
        F.col("price") == F.col("min_sz")
    )
    w_larger = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_size").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    d = f.withColumn("min_larger", F.min("price").over(w_larger))
    return d.filter(
        F.col("min_larger").isNull() | (F.col("price") < F.col("min_larger"))
    ).select("p_brand", "p_size", "price", "n_parts")
