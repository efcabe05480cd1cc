"""Core relational operators: scan/filter/project, joins, aggregations.

SURVEY.md §2.B "Sources/sinks", "Projection/filter", "Joins",
"Aggregations".  All pure DataFrame API — Catalyst supplies pushdown,
pruning, join strategy selection, and partial aggregation; AQE handles
runtime broadcast and skew (session.py).  Scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec, dec_sum, dec_t, floor_sum
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


# ---------------------------------------------------------------------------
# Scan / filter / project
# ---------------------------------------------------------------------------

@query(
    "scan_filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→project baseline.  Both predicates and the 3-column
    projection reach the parquet reader (PushedFilters + ReadSchema) —
    at 100 TB this is the difference between reading 3 columns of a
    row-group subset and reading everything."""
    return (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "filter_pushdown_dates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_returnflag = 'R'
    """,
)
def filter_pushdown_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp + string predicates pushed to the parquet scan; enables
    row-group skipping via min/max statistics at scale."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01"))
            & (F.col("l_shipdate") < F.lit("1999-01-01"))
            & (F.col("l_returnflag") == "R")
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "project_compute",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
        AS disc_price,
      CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: exact-decimal arithmetic + CASE WHEN, all
    inside whole-stage codegen (no UDFs)."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("disc_price"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@query(
    "agg_global",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,6))))
           AS DECIMAL(38,0)) AS DOUBLE) AS sum_qty,
      CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
      CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
      CAST(CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,6))))
           AS DECIMAL(38,0)) AS DOUBLE)
           / COUNT(l_extendedprice) AS DOUBLE) AS avg_price
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — partial aggregation per partition then a
    single-row final combine; no full shuffle of the fact table.
    Global sums FLOOR-quantize to DECIMAL(38,0) before the double cast
    (the 2⁵³ rule — see agg_groupby_pricing; the whole-table price sum
    crosses it at sf1.0): sum_qty is integral so nothing is lost, and
    flooring the avg numerator perturbs the mean by <10⁻¹⁰ relative."""
    l = table(spark, sf_dir, "lineitem")

    def fsum(col):
        return F.floor(F.sum(col)).cast("decimal(38,0)").cast("double")

    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        fsum(dec("l_quantity")).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (fsum(dec("l_extendedprice")) / F.count("l_extendedprice"))
        .alias("avg_price"),
    )


@query(
    "agg_groupby_pricing",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,6))))
           AS DECIMAL(38,0)) AS DOUBLE) AS sum_qty,
      CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,6))))
           AS DECIMAL(38,0)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l_discount AS DECIMAL(18,6)))))
           AS DECIMAL(38,0)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l_discount AS DECIMAL(18,6)))
               * (1 + CAST(l_tax AS DECIMAL(18,6)))))
           AS DECIMAL(38,0)) AS DOUBLE) AS sum_charge,
      CAST(CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,6))))
           AS DECIMAL(38,0)) AS DOUBLE)
           / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(l_discount) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1-shaped) pricing summary.  Hash aggregate with
    map-side partial combine: 6 group keys regardless of fact size, so
    the shuffle moves O(groups × partitions), not O(rows) — the plan
    that survives 100 TB.  Mirrors the reference's role as the
    "summarize the stream" workload (kinesisHandler.js has no agg; this
    is north-star SURVEY §2.B).

    Determinism at scale: all big-money sums (and the avg_qty
    numerator) are FLOOR-quantized to DECIMAL(38,0) before the single
    double cast.  The previous DECIMAL(38,6) quantization is bit-exact
    only while Σ×10⁶ < 2⁵³ — true at sf0.1, violated at sf1.0, where
    the sf1 parity sweep measured 1-2 ULP drift (Spark rounds the exact
    BigDecimal, DuckDB converts int128 then divides).  FLOOR + one
    integer→double conversion is single-rounded at any magnitude
    (whole-unit sums are the declared spec; sum_qty/avg_qty lose
    nothing — quantities are integral).  avg_disc keeps the fractional
    numerator: Σdisc×10⁶ stays under 2⁵³ through ~sf10000."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))

    def fsum(col):
        return F.floor(F.sum(col)).cast("decimal(38,0)").cast("double")

    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum(dec("l_quantity")).alias("sum_qty"),
            fsum(dec("l_extendedprice")).alias("sum_base_price"),
            fsum(disc_price).alias("sum_disc_price"),
            fsum(charge).alias("sum_charge"),
            (fsum(dec("l_quantity")) / F.count("l_quantity"))
            .alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count("l_discount"))
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group (expand + two-phase agg under the hood)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_count_distinct_salted",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) via the salted two-stage rewrite
    (functions/skew.py): salt derived from the distinct column caps
    per-task aggregation state at |distinct|/n_salt — the hot-group
    escape hatch when one group's distinct set exceeds a task. Must
    hash-match the plain COUNT(DISTINCT) oracle exactly."""
    from kinesis_handler_spark.functions.skew import salted_count_distinct

    return salted_count_distinct(
        table(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        "o_custkey",
        n_salt=16,
    )


@query("agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++).  The 100 TB answer to
    cardinality: fixed-size sketch, no expand, mergeable across
    partitions.  Engine-specific sketch => rows-only driver check; the
    pytest layer asserts relative error vs exact counts."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- value-neutral on any non-empty input (every real group has
    -- rows); on an EMPTY table it drops the SQL-standard phantom
    -- grand-total row that Spark's rollup/cube do not emit
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (flag, flag+status, grand total) in one pass."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            dec_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- value-neutral on any non-empty input (every real group has
    -- rows); on an EMPTY table it drops the SQL-standard phantom
    -- grand-total row that Spark's rollup/cube do not emit
    HAVING COUNT(*) > 0
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations of two dimensions."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice").alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (Catalyst Expand, one scan)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                    AS DOUBLE) AS sum_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "agg_filtered_pivot",
    oracle="""
    SELECT user_bucket,
      COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
      CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                    FILTER (WHERE event_type = 'purchase'), 0)
           AS DOUBLE) AS purchase_value
    FROM (SELECT *, user_id % 10 AS user_bucket FROM events) e
    GROUP BY user_bucket
    """,
)
def agg_filtered_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-shaped): one scan, N conditional
    aggregates — the scalable alternative to N filtered scans."""
    e = table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return e.groupBy("user_bucket").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", dec("value"))),
            F.lit(0).cast("decimal(18,6)"),
        )
        .cast("double")
        .alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "join_inner_equi",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer.  Catalyst/AQE picks broadcast vs
    sort-merge by build-side size; at 100 TB both sides shuffle on the
    join key and the filter is pushed below the join."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("total_spent"),
        )
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lineitems,
           CAST(CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,6)))))
                AS DECIMAL(38,0)) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact⋈orders⋈customer⋈nation⋈region.  nation/region are
    explicitly broadcast (bounded dims — broadcast at any SF); the
    fact⋈orders⋈customer joins shuffle on their keys and AQE converts to
    broadcast when the build side turns out small."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            floor_sum(revenue).alias("revenue"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-extension; COUNT(col) skips the
    unmatched rows' nulls."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT
      COALESCE(a.k, b.k) AS nationkey,
      COALESCE(a.n_cust, 0) AS n_cust,
      COALESCE(b.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
    FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
      ON a.k = b.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (aggregate-below-join
    keeps the shuffled data small)."""
    a = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    b = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return a.join(b, a.k == b.k, "full").select(
        F.coalesce(a.k, b.k).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one big order.  Semi join
    never duplicates the left side — no fan-out blowup at scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000.0)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order above 400k (threshold
    chosen to keep the result non-trivial at every scale factor)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_range_theta",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_pairs
    FROM customer c
    JOIN supplier s ON c.c_nationkey = s.s_nationkey
                   AND c.c_acctbal > s.s_acctbal
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join: equi key (nation) plus a theta condition
    (c_acctbal > s_acctbal).  Catalyst evaluates the theta predicate as a
    post-condition of the equi-join — at scale this stays a hash/sort
    join on the equi key instead of a cartesian product."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(
            s,
            (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal),
        )
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_exists_correlated",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0
    )
    GROUP BY o_orderpriority
    """,
)
def join_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders with at least one
    high-quantity lineitem, counted per priority.  Decorrelated to a
    LEFT SEMI join — the filter on the subquery side is pushed below
    the join, so the semi join probes only the ~10% of lineitem rows
    that qualify; the order-side row count never multiplies (EXISTS
    ⇒ at-most-once semantics for free).  One shuffle each side on
    l_orderkey, then a partial+final count agg."""
    o = table(spark, sf_dir, "orders")
    hot = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey")
    )
    return (
        o.join(hot, o.o_orderkey == hot.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey)  AS n_customers,
           COUNT(DISTINCT date_trunc('day', o_orderdate)) AS n_days,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates alongside plain aggregates in one
    statement.  Catalyst compiles N distinct columns into a single
    Expand (each input row replicated once per distinct group) followed
    by two aggregate stages — one pass over the fact table instead of N
    self-joined subqueries.  The Expand multiplies shuffle volume by
    the distinct-column count; acceptable because each replica carries
    only (group key, one distinct column)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.date_trunc("day", "o_orderdate")).alias("n_days"),
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT nullif(c_nationkey % 5, 2) AS k, COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT nullif(s_nationkey % 5, 2) AS k, COUNT(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.k, s.k) AS k, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.k IS NOT DISTINCT FROM s.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of null-extending both sides — the
    semantics needed when joining on optional attributes.  Both inputs
    are pre-aggregated to one row per key BEFORE the join (reduce-then-
    join), so the NULL group meets as 1×1, never the N×M blow-up a
    null-matching join invites on raw rows.  COALESCE exposes one key
    column, as an outer join requires."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_nationkey") % 5, F.lit(2)).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_nationkey") % 5, F.lit(2)).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c["k"].eqNullSafe(s["k"]), "full").select(
        F.coalesce(c["k"], s["k"]).alias("k"), "n_cust", "n_supp"
    )


@query(
    "profile_table",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             COUNT(o_orderstatus) AS nn_s,
             COUNT(DISTINCT o_orderstatus) AS nd_s,
             CAST(MIN(o_orderstatus) AS VARCHAR) AS mn_s,
             CAST(MAX(o_orderstatus) AS VARCHAR) AS mx_s,
             COUNT(o_custkey) AS nn_c,
             COUNT(DISTINCT o_custkey) AS nd_c,
             CAST(MIN(o_custkey) AS VARCHAR) AS mn_c,
             CAST(MAX(o_custkey) AS VARCHAR) AS mx_c,
             COUNT(o_totalprice) AS nn_p,
             COUNT(DISTINCT o_totalprice) AS nd_p,
             printf('%.2f', MIN(o_totalprice)) AS mn_p,
             printf('%.2f', MAX(o_totalprice)) AS mx_p
      FROM orders
    )
    SELECT 'o_orderstatus' AS column_name, n AS n_rows, n - nn_s AS n_nulls,
           nd_s AS n_distinct, mn_s AS min_val, mx_s AS max_val FROM m
    UNION ALL
    SELECT 'o_custkey', n, n - nn_c, nd_c, mn_c, mx_c FROM m
    UNION ALL
    SELECT 'o_totalprice', n, n - nn_p, nd_p, mn_p, mx_p FROM m
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (DESCRIBE-style) in ONE pass: row count and
    per-column null count / exact distinct count / min / max for three
    orders columns, stacked wide→long so the output is one row per
    column.  A single aggregate scan computes every metric (map-side
    partial aggregation; the multi-distinct goes through one Expand) —
    at 100 TB this is the shape of a schema-quality sweep, vs. the N
    scans of per-column DESCRIBE loops.  Doubles are surfaced through a
    fixed printf format so min/max strings are engine-independent."""
    o = table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderstatus").alias("nn_s"),
        F.countDistinct("o_orderstatus").alias("nd_s"),
        F.min("o_orderstatus").cast("string").alias("mn_s"),
        F.max("o_orderstatus").cast("string").alias("mx_s"),
        F.count("o_custkey").alias("nn_c"),
        F.countDistinct("o_custkey").alias("nd_c"),
        F.min("o_custkey").cast("string").alias("mn_c"),
        F.max("o_custkey").cast("string").alias("mx_c"),
        F.count("o_totalprice").alias("nn_p"),
        F.countDistinct("o_totalprice").alias("nd_p"),
        # format_string renders a NULL aggregate as the string "null"
        # (empty/all-NULL column) — guard so the profile shows NULL.
        F.when(
            F.min("o_totalprice").isNotNull(),
            F.format_string("%.2f", F.min("o_totalprice")),
        ).alias("mn_p"),
        F.when(
            F.max("o_totalprice").isNotNull(),
            F.format_string("%.2f", F.max("o_totalprice")),
        ).alias("mx_p"),
    )
    return m.select(
        F.expr(
            "stack(3,"
            " 'o_orderstatus', n, n - nn_s, nd_s, mn_s, mx_s,"
            " 'o_custkey',     n, n - nn_c, nd_c, mn_c, mx_c,"
            " 'o_totalprice',  n, n - nn_p, nd_p, mn_p, mx_p)"
            " AS (column_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


@query(
    "join_agg_topk",
    oracle="""
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,6))))
                  AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def join_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped composite: segment-filtered customers ⋈ orders ⋈
    lineitem, exact-decimal revenue per order, global top-10.  The
    end-to-end shape every mart query hits: both join filters are
    pushed into their scans BEFORE the joins (the customer side reduces
    to a key list — broadcastable), revenue aggregates partial+final on
    the join key already in hand, and ORDER+LIMIT compiles to
    TakeOrderedAndProject, so the top-10 never materializes a global
    sort.  Scale-12 product sums are quantized to DECIMAL(38,6) before
    the one double conversion (both engines round identically)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "join_multi_star",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,6)))))
                  AS DECIMAL(38,0)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
                    AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_multi_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped five-way star join: revenue by nation for one
    region where the supplier is LOCAL to the customer's nation (the
    extra non-key equi-condition s_nationkey = c_nationkey that makes
    Q5 a join-ordering stress test).

    100 TB shape: region and nation are broadcast (geography-bounded
    dims, SCALE.md broadcast policy).  Supplier scales linearly with SF
    (10 → 1,000 rows across sf0.001→sf0.1; ~10⁹ at the 100 TB design
    point), so it carries NO explicit broadcast hint — AQE
    auto-broadcasts it while it fits under the threshold at bench scale
    and falls back to a shuffle join beyond, instead of an un-spillable
    OOM.  The remaining shuffles are orders ⋈ customer and lineitem ⋈
    orders on their natural keys; the date filter is pushed into the
    orders scan (row-group pruning), and the final aggregate is a
    handful of nations with map-side combine.  Catalyst + AQE pick the
    join order; the declared plan just states the joins."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            floor_sum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "agg_having_join_back",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,3)))
                       AS DECIMAL(38,6)) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,3)))
                       AS DECIMAL(38,6)) AS DOUBLE) > 250.0
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           big.total_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def agg_having_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped "large volume customer" query: aggregate the
    fact table per order, HAVING-filter to the heavy tail (total
    quantity > 250 ≈ top percentile), then join the survivors back to
    orders and customer for their attributes.

    The scale property: the expensive aggregate runs FIRST and the
    HAVING cut reduces the join input from O(orders) to a sliver, so
    the two enrichment joins move almost nothing — aggregate-then-join,
    never join-then-aggregate.  At 100 TB the post-HAVING side is small
    enough that AQE converts both joins to broadcasts at runtime."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(dec_t(F.col("l_quantity"), "decimal(8,3)"))
            .cast("decimal(38,6)").cast("double").alias("total_qty")
        )
        .filter(F.col("total_qty") > 250.0)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


_Q6_SQL = """
SELECT CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(l_discount AS DECIMAL(18,6))))
                 AS DECIMAL(38,0)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@query("sql_scan_agg_q6", oracle=_Q6_SQL)
def sql_scan_agg_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped revenue-forecast aggregate executed through the
    engine's SQL ENTRY POINT: the fixture table is registered as a temp
    view and the query text runs via ``spark.sql`` — the exact same
    ANSI string the DuckDB oracle runs (one source of truth, two
    engines).  Proves the SQL surface is first-class, not just the
    DataFrame DSL: Catalyst plans the text into the same
    pushed-filters + partial/final agg pipeline as the DSL twin
    (`PLANS.md` shows identical physical shape), because both compile
    to the same logical plan."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_SQL)


_SQL_WINDOW_TOPN = """
SELECT c_mktsegment, c_custkey, c_acctbal, rnk
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(RANK() OVER (
           PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC NULLS LAST, c_custkey NULLS LAST
         ) AS INTEGER) AS rnk
  FROM customer
) ranked
WHERE rnk <= 3
"""


@query("sql_window_topn", oracle=_SQL_WINDOW_TOPN)
def sql_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions through the SQL ENTRY POINT: top-3 customers by
    account balance per market segment, the identical ANSI text run by
    ``spark.sql`` and the DuckDB oracle (one source of truth, two
    engines — the same contract as ``sql_scan_agg_q6``, extended to
    the window-function surface).  The rank<=3 predicate over the
    subquery compiles to WindowGroupLimit exactly like the DSL twin
    (`topk_per_group`), so per-group state is k rows; RANK is cast to
    INTEGER in the shared text because the engines' native rank types
    differ (int vs bigint) while the values do not."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SQL_WINDOW_TOPN)
