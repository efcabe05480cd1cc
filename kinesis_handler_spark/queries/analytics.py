"""Advanced analytics operators (round 7, waves 2-3): recursive-CTE
hierarchy walk, time-weighted averaging, interval-overlap self-join,
per-group Pareto skyline, RFM segmentation, ABC classification,
Benford first-digit audit, exact dyadic EWMA, and KWIC concordance.

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
    depth-0 roots on both engines, so no input can cycle.  Scale
    accounting: flattening a hierarchy inherently emits N × depth rows
    (every engine pays this for org charts / BOMs); here that is
    ≤ 63·N, each iteration a shuffle-free map over a frontier that a
    key leaves permanently once its chain bottoms out.  Spark's
    runaway-recursion valve (``spark.sql.cteRecursionRowLimit``,
    default 10⁶ CUMULATIVE rows — the sf1.0 probe tripped it at 200k
    keys × ~19 levels) is raised to 64·|part| + 10⁶: this walk's true
    cumulative bound is ≤ 63·N (63 = max BIGINT depth), so the setting
    admits exactly this recursion with slack while REMAINING a live
    valve for any later recursion in the same session — a genuinely
    runaway CTE still dies at ~64× the table size instead of never
    (ADVICE r7: the previous INT32_MAX setting disabled the valve
    session-wide).  The |part| rowcount is one parquet-metadata count.
    The depth-100 level valve stays at its default, above the ≤63
    bound.  The final depth histogram is a bounded ≤64-row aggregate.
    Measured: a 2M-key / 45.8M-cumulative-row walk completes in ~18 s
    on local[8]."""
    part = table(spark, sf_dir, "part")
    valve = 64 * part.count() + 1_000_000
    prev = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(max(valve, prev)))
    part.createOrReplaceTempView("part")
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
    temporal twin).

    SKEW-ROBUST BAND COUNT (r9 rewrite): the original self-join kept
    candidate generation inside the o_custkey equi-key, which is fine
    at nominal per-customer fanout but still QUADRATIC within a key —
    the r9 skew twin (one customer owning 30% of orders, 45k rows at
    sf0.1) made the sort-merge block scan ~2×10⁹ pairs (28.7 s where
    calm is 0.5 s).  Counting the pairs doesn't require generating
    them: sort each customer's orders by start time and count, per
    order, its strict predecessors inside the band with ONE range-
    frame window — pairs split exactly into (earlier-start, same-
    start) classes, so

        n(cust) = Σ_b |{a : us_a ∈ [us_b − L + 1, us_b − 1]}|   (range window)
                + Σ_{same-us groups} C(k, 2)                     (groupBy)
                − the same two terms computed within (cust, okey)   (de-mirror
                  excludes equal-orderkey pairs, which only verbatim
                  duplicate rows produce),

    every term a linear window or aggregate: O(n log n) per key,
    skew-twin time 28.7 s → windowed, and the per-key block streams
    instead of pairing.  Value-identical to the join form (same
    oracle; clean/chaos/skew sweeps hash-green).  NULL keys filtered
    as documented totality."""
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
    band = (-(_OVERLAP_US - 1), -1)  # strict predecessors inside |Δ| < L

    def _strict_band_count(df: DataFrame, *part: str) -> DataFrame:
        w = (
            Window.partitionBy(*part)
            .orderBy("us")
            .rangeBetween(*band)
        )
        return df.select(
            "o_custkey", F.count(F.lit(1)).over(w).alias("c")
        ).groupBy("o_custkey").agg(F.sum("c").cast("bigint").alias("n"))

    def _same_us_pairs(df: DataFrame, *keys: str) -> DataFrame:
        k = F.count(F.lit(1))
        return (
            df.groupBy("o_custkey", *keys, "us")
            .agg((k * (k - 1) / 2).cast("bigint").alias("n"))
            .groupBy("o_custkey")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )

    plus = [
        _strict_band_count(o, "o_custkey"),
        _same_us_pairs(o),
    ]
    minus = [
        _strict_band_count(o, "o_custkey", "o_orderkey"),
        _same_us_pairs(o, "o_orderkey"),
    ]
    total = (
        plus[0].select("o_custkey", F.col("n").alias("v"))
        .unionByName(plus[1].select("o_custkey", F.col("n").alias("v")))
        .unionByName(
            minus[0].select("o_custkey", (-F.col("n")).alias("v"))
        )
        .unionByName(
            minus[1].select("o_custkey", (-F.col("n")).alias("v"))
        )
        .groupBy("o_custkey")
        .agg(F.sum("v").cast("bigint").alias("n_overlapping_pairs"))
    )
    # the join form only emits customers with ≥1 overlapping pair
    return total.filter(F.col("n_overlapping_pairs") > 0)


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


#: EWMA taps: 16 most-recent instants, dyadic weights 2^-1 .. 2^-16
#: (newest first).  Powers of two so every product is EXACT integer
#: arithmetic after the scale-4 fixed-point lift — no float summation
#: order anywhere.
_EWMA_TAPS = 16

#: Concordance target term — a fixture-common token (~1k occurrences at
#: sf0.01); a literal here, a parameter in production.
_CONC_TERM = "join"

_DAY_US = 86_400_000_000


def _ewma_terms_sql() -> str:
    # HUGEINT-typed zero seeds int128 accumulation in DuckDB (the
    # intermediate never escapes — outer casts emit BIGINT/DOUBLE);
    # Spark's twin accumulates in DECIMAL(38,0).  See the docstring's
    # overflow-headroom note (ADVICE r7).
    terms = []
    for j in range(_EWMA_TAPS):
        src = "lvl_i" if j == 0 else f"LAG(lvl_i, {j}) OVER w"
        terms.append(
            f"COALESCE({src}, CAST(0 AS HUGEINT))"
            f" * {1 << (_EWMA_TAPS - 1 - j)}"
        )
    return " + ".join(terms)


@query(
    "agg_rfm_segmentation",
    oracle="""
    WITH cust_orders AS (
      SELECT o_custkey, COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS mon,
             MAX(epoch_us(o_orderdate)) AS last_us
      FROM orders WHERE o_custkey IS NOT NULL
      GROUP BY 1
    ),
    anchor AS (SELECT MAX(epoch_us(o_orderdate)) AS anchor_us FROM orders),
    base AS (
      SELECT c.c_mktsegment, co.o_custkey AS custkey, co.freq, co.mon,
             CASE WHEN co.last_us IS NOT NULL
                  THEN (a.anchor_us - co.last_us) // 86400000000
             END AS recency_days
      FROM cust_orders co
      JOIN customer c ON c.c_custkey = co.o_custkey, anchor a
    ),
    scored AS (
      SELECT c_mktsegment, mon,
             NTILE(5) OVER (PARTITION BY c_mktsegment
               ORDER BY recency_days ASC NULLS LAST, custkey) AS r_score,
             NTILE(5) OVER (PARTITION BY c_mktsegment
               ORDER BY freq DESC NULLS LAST, custkey) AS f_score,
             NTILE(5) OVER (PARTITION BY c_mktsegment
               ORDER BY mon DESC NULLS LAST, custkey) AS m_score
      FROM base
    )
    SELECT c_mktsegment,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(FLOOR(SUM(mon)) AS DECIMAL(38,0)) AS DOUBLE)
             AS monetary
    FROM scored
    GROUP BY 1, 2, 3, 4
    """,
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every ordering customer scored 1–5 on Recency
    (days since last order, vs the global latest order date), Frequency
    (order count), and Monetary (exact decimal lifetime spend) by
    quintile WITHIN their market segment, then rolled up to segment ×
    (r,f,m) cells with population and floor-quantized spend — the
    classic CRM cohort cube.

    Plan: orders reduce to one row per customer (partial+final agg),
    join the customer dim on the same key, and ONE exchange on
    c_mktsegment serves all three ntile sorts AND the final rollup
    (hash(c_mktsegment) satisfies the rollup's clustering — Catalyst
    inserts no second exchange).  The global anchor date is a one-row
    aggregate broadcast onto every row (declared scalar
    nested-loop, the Q11/Q15 shape).  Quintile ties break on the
    unique customer key, so each ntile's order is total; duplicated
    customer rows (dup twin) are FULL duplicates, so any permutation
    among them leaves the output multiset unchanged.  Recency is exact
    integer microseconds floor-divided to days (anchor ≥ last order,
    so truncation == floor on both engines).  At production quantile
    scale you'd swap ntile for pre-computed quantile bounds; the
    per-segment sort is the declared trade (window_ntile_percent
    precedent).  NULL custkey orders can't be attributed (totality
    filter); customers without orders are out of RFM scope by
    definition."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    co = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum(dec_t(F.col("o_totalprice"), "decimal(18,6)")).alias("mon"),
        F.max(
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        ).alias("last_us"),
    )
    anchor = table(spark, sf_dir, "orders").agg(
        F.max(
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        ).alias("anchor_us")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = (
        co.join(c, c.c_custkey == co.o_custkey)
        .crossJoin(anchor)
        .select(
            "c_mktsegment",
            F.col("o_custkey").alias("custkey"),
            "freq",
            "mon",
            F.when(
                F.col("last_us").isNotNull(),
                F.expr("(anchor_us - last_us) div 86400000000"),
            ).alias("recency_days"),
        )
    )
    seg = Window.partitionBy("c_mktsegment")
    r_w = seg.orderBy(
        F.col("recency_days").asc_nulls_last(), F.col("custkey").asc()
    )
    f_w = seg.orderBy(
        F.col("freq").desc_nulls_last(), F.col("custkey").asc()
    )
    m_w = seg.orderBy(F.col("mon").desc_nulls_last(), F.col("custkey").asc())
    scored = base.select(
        "c_mktsegment",
        "mon",
        F.ntile(5).over(r_w).alias("r_score"),
        F.ntile(5).over(f_w).alias("f_score"),
        F.ntile(5).over(m_w).alias("m_score"),
    )
    return scored.groupBy(
        "c_mktsegment", "r_score", "f_score", "m_score"
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.floor(F.sum("mon")).cast("decimal(38,0)").cast("double")
        .alias("monetary"),
    )


@query(
    "agg_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IS NOT NULL
      GROUP BY 1, 2
    ),
    run AS (
      SELECT p_brand, rev,
             CAST(FLOOR(SUM(rev) OVER (
               PARTITION BY p_brand
               ORDER BY rev DESC NULLS LAST, l_partkey
             )) AS DECIMAL(30,0)) AS cum,
             CAST(FLOOR(SUM(rev) OVER (PARTITION BY p_brand))
                  AS DECIMAL(30,0)) AS tot
      FROM rev
    ),
    cls AS (
      SELECT p_brand, rev,
             CASE WHEN 2 * cum <= tot THEN 'A'
                  WHEN 5 * cum <= 4 * tot THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM run
    )
    SELECT p_brand, abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(FLOOR(SUM(rev)) AS DECIMAL(38,0)) AS DOUBLE)
             AS class_revenue
    FROM cls
    GROUP BY 1, 2
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification per brand: rank each brand's parts
    by discounted revenue, classify A while the running share stays ≤
    50%, B ≤ 80%, C for the tail — the 80/20 inventory-curation
    primitive, rolled up to (brand, class) with part counts and
    floor-quantized class revenue.

    The share thresholds are evaluated as exact integer
    CROSS-MULTIPLIES (2·cum ≤ tot; 5·cum ≤ 4·tot) over whole-unit
    FLOOR-quantized DECIMAL(30,0) sums — never a division, never a
    float compare, deterministic on both engines at any magnitude
    below ~10^29 per brand (a 100 TB corpus is ~10^16).  The running
    sum's order (rev DESC, partkey) is total because the (brand, part)
    rollup makes partkey unique per partition, and the whole-partition
    total shares the same window clustering, so one exchange on
    p_brand serves the revenue rollup's second stage, both windows,
    and the final (brand, class) aggregate.  Unpriced parts (all-NULL
    revenue) order NULLS LAST and classify C — the tail is where
    unknown value belongs.  NULL brands can't be ranked (totality
    filter); the part join drops NULL partkeys on both engines."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_brand")
    ep = dec_t(F.col("l_extendedprice"), "decimal(18,6)")
    disc = dec_t(F.col("l_discount"), "decimal(18,6)")
    rev = (
        li.join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(ep * (F.lit(1) - disc)).alias("rev"))
    )
    w_run = Window.partitionBy("p_brand").orderBy(
        F.col("rev").desc_nulls_last(), F.col("l_partkey").asc()
    )
    w_tot = Window.partitionBy("p_brand")
    run = rev.select(
        "p_brand",
        "rev",
        F.floor(F.sum("rev").over(w_run)).cast("decimal(30,0)").alias("cum"),
        F.floor(F.sum("rev").over(w_tot)).cast("decimal(30,0)").alias("tot"),
    )
    cls = run.select(
        "p_brand",
        "rev",
        F.when(F.lit(2) * F.col("cum") <= F.col("tot"), "A")
        .when(F.lit(5) * F.col("cum") <= F.lit(4) * F.col("tot"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return cls.groupBy("p_brand", "abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.floor(F.sum("rev")).cast("decimal(38,0)").cast("double")
        .alias("class_revenue"),
    )


@query(
    "agg_benford_first_digit",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_totalprice >= 1 AND o_totalprice < 1e15
        AND NOT isnan(o_totalprice)
    ),
    d AS (
      SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
               AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM b GROUP BY 1
    ),
    t AS (SELECT SUM(n_orders) AS tot FROM d)
    SELECT digit, n_orders,
           CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE) AS share
    FROM d, t
    """,
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the distribution of leading digits of
    order totals — the classic fraud / synthetic-data screen (natural
    multiplicative amounts follow log10(1+1/d); fabricated ones
    usually don't).  Output: digit, count, observed share.

    The leading digit is extracted EXACTLY: whole cents via one
    deterministic IEEE multiply + FLOOR (never float formatting, which
    engines render differently), then the first character of the
    integer's decimal rendering — identical on both engines for any
    positive int64.  The screen bounds (1 ≤ price < 10^15, non-NaN)
    are the documented totality filter: they keep the cents cast
    inside int64 under ANSI, and NaN — which BOTH engines order above
    any threshold — would otherwise reach the cast and kill the job.
    One partial+final aggregate to ≤ 9 rows; the share denominator is
    a one-row aggregate broadcast back (declared scalar nested-loop).
    Expected-vs-observed deviation is left to the consumer: log10 is
    transcendental, out of the hash-checked surface by registry rule."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") >= 1)
        & (F.col("o_totalprice") < 1e15)
        & ~F.isnan(F.col("o_totalprice"))
    )
    b = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    d = b.groupBy(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    t = d.agg(F.sum("n_orders").alias("tot"))
    return d.crossJoin(t).select(
        "digit",
        "n_orders",
        (F.col("n_orders").cast("double") / F.col("tot").cast("double"))
        .alias("share"),
    )


@query(
    "window_ewma_dyadic",
    oracle=f"""
    WITH lvl AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) * 10000 AS HUGEINT)
               AS lvl_i
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id, ts
    )
    SELECT user_id, us,
           CAST({{terms}} AS BIGINT) AS ewma_scaled,
           CAST({{terms}} AS DOUBLE) / 65536.0 / 10000.0 AS ewma
    FROM lvl
    WINDOW w AS (PARTITION BY user_id ORDER BY us)
    """.format(terms=_ewma_terms_sql()),
)
def window_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user with dyadic
    weights (α = 1/2 over the 16 most-recent instants: newest × 2⁻¹,
    … oldest × 2⁻¹⁶) — the standard smoother for irregular event
    streams, computed EXACTLY.

    EWMA is normally iterative (y_t = αx_t + (1-α)y_{{t-1}}) and float
    — order-dependent and engine-divergent.  The dyadic-tap form makes
    it closed and integer: levels lift to scale-4 fixed point, each
    tap multiplies by a power of two, and the 16-term sum ACCUMULATES
    WIDE — DECIMAL(38,0) on Spark, HUGEINT on DuckDB (internal only;
    the output casts to BIGINT/DOUBLE) — because lvl_i is a
    per-(user, ts) SUM whose duplicate-instant multiplicity is
    unbounded, so an int64 accumulator could overflow mid-sum under
    heavy duplication (ADVICE r7; a DECIMAL(12,4) bounds ONE addend at
    ~10¹²×2¹⁵, not the sum).  Only the final single BIGINT cast can
    overflow now, and both engines abort identically there (ANSI).
    The weighted sum surfaces both as the exact integer and as a
    convenience double whose two divisions are a power-of-two scale
    (exact) and one deterministic IEEE rounding — both engines convert
    the SAME exact integer, so the doubles are bit-identical.
    Duplicate instants collapse first (exact decimal sum), so the ONE
    window pass has a unique order key per user — the island-flake
    class cannot occur; missing taps (stream warm-up) and undecodable
    instants (all-NULL level) contribute zero via explicit COALESCE on
    both engines.  One shuffle for the collapse, one for the per-user
    window; all 16 lags share a single window sort."""
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    lvl = e.groupBy("user_id", "ts").agg(
        (F.sum(dec_t(F.col("value"), "decimal(12,4)")) * F.lit(10000))
        .cast("decimal(38,0)")
        .alias("lvl_i")
    ).select("user_id", F.unix_micros("ts").alias("us"), "lvl_i")
    w = Window.partitionBy("user_id").orderBy(F.asc("us"))
    zero = F.lit(0).cast("decimal(38,0)")
    acc = None
    for j in range(_EWMA_TAPS):
        src = F.col("lvl_i") if j == 0 else F.lag("lvl_i", j).over(w)
        term = F.coalesce(src, zero) * F.lit(1 << (_EWMA_TAPS - 1 - j))
        acc = term if acc is None else acc + term
    return lvl.select(
        "user_id",
        "us",
        acc.cast("bigint").alias("ewma_scaled"),
        (acc.cast("double") / F.lit(65536.0) / F.lit(10000.0)).alias("ewma"),
    )


@query(
    "text_concordance",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    p AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM d
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           COALESCE(array_to_string(t[GREATEST(pos - 3, 1):pos - 1], ' '),
                    '') AS left_ctx,
           COALESCE(array_to_string(t[pos + 1:LEAST(pos + 3, len(t))], ' '),
                    '') AS right_ctx
    FROM p
    WHERE t[pos] = '{_CONC_TERM}'
    """,
)
def text_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) concordance: every occurrence of the
    target term across the corpus with its ±3-token context windows —
    the corpus-linguistics / grep-with-context primitive an annotation
    or red-teaming pipeline runs before editing a term out.

    Shuffle-FREE: scan → tokenize → positional explode → filter →
    row-local slicing; output is linear in term occurrences, each row
    carrying ≤ 6 context tokens regardless of document length (a
    hostile 100 MB document costs its occurrence count, never its
    size, past the explode).  Context boundaries clamp at document
    edges with explicit GREATEST/LEAST arithmetic — identical
    truncation on both engines, and boundary-empty contexts normalize
    to '' (Spark's zero-length slice and DuckDB's NULL-ish edge slice
    disagree on the raw value, so the oracle pins COALESCE).  NULL
    identity / NULL text rows can't anchor a citation (documented
    totality filter)."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    e = t.select(
        "doc_id", "t", F.posexplode("t").alias("pos0", "tok")
    ).filter(F.col("tok") == _CONC_TERM)
    pos1 = F.col("pos0") + 1
    lstart = F.greatest(pos1 - 3, F.lit(1))
    left = F.slice(F.col("t"), lstart, pos1 - lstart)
    right = F.slice(
        F.col("t"), pos1 + 1, F.least(F.lit(3), F.size("t") - pos1)
    )
    return e.select(
        "doc_id",
        pos1.cast("bigint").alias("pos"),
        F.array_join(left, " ").alias("left_ctx"),
        F.array_join(right, " ").alias("right_ctx"),
    )
