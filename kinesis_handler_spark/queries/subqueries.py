"""Subquery-decorrelation shapes (round 5): the TPC-H patterns built on
scalar / EXISTS / NOT-IN / IN-over-HAVING subqueries — Q2, Q4, Q11, Q15,
Q16, Q17, Q18 and Q21 re-expressed over the fixture star schema.

Each query documents its DECORRELATED Spark plan: the correlated
subquery a SQL user writes becomes a window function, a semi/anti join,
or a broadcast scalar — the shapes that survive 100 TB, where a
re-executed-per-row subquery cannot.  Oracle SQL keeps the textbook
subquery form, so the hash match also proves the decorrelation is
semantics-preserving.

Reference note: the reference library (lib/kinesisHandler.js) has no
relational surface — these are north-star mandates (SURVEY.md §2.B)
following the registry.py determinism rules (decimal-exact sums, single
IEEE division, aliased columns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.lineage import truncate
from kinesis_handler_spark.functions.numeric import dec
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

_DEC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6)))"
)


@query(
    "agg_order_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) > 30
    )
    GROUP BY 1
    """,
)
def agg_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: count orders per priority
    having at least one line item shipped more than 30 days after the
    order date.  The correlated EXISTS decorrelates to one LEFT SEMI
    join on the order key with the date predicate folded into the join
    condition — each order is emitted at most once regardless of how
    many late items it has, and the semi join keeps only the keys (no
    fact-side payload crosses the shuffle).  Day arithmetic is integer
    DATE subtraction on both engines."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 30
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_value_share",
    oracle=f"""
    WITH per AS (
      SELECT l_partkey,
             CAST(SUM({_DEC_REV}) AS DECIMAL(38,6)) AS val
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(val) AS DECIMAL(38,6)) AS tot FROM per)
    SELECT p.l_partkey AS partkey,
           CAST(p.val AS DOUBLE) AS value,
           CAST(p.val AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
    FROM per p, tot t
    WHERE CAST(p.val AS DOUBLE) * CAST(2000 AS DOUBLE)
          > CAST(t.tot AS DOUBLE)
    """,
)
def agg_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped value concentration: parts whose revenue exceeds
    1/2000 of total revenue.  The scalar subquery (global total)
    decorrelates to a single-row aggregate cross-joined onto the
    per-part aggregate — Catalyst broadcasts the one-row side, so the
    comparison is map-side; the per-part aggregate is computed ONCE and
    feeds both the total and the filter (no second scan).  Sums stay
    exact DECIMAL; the threshold test and share are plain IEEE double
    ops identical on both engines."""
    li = table(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    per = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(rev).cast("decimal(38,6)").alias("val"))
        # one aggregate, two consumers (total + filter): truncate the
        # lineage so the fact scan is not replayed for the scalar side
        .transform(truncate)
    )
    tot = per.agg(F.sum("val").cast("decimal(38,6)").alias("tot"))
    val_d = F.col("val").cast("double")
    tot_d = F.col("tot").cast("double")
    return (
        per.crossJoin(tot)
        .filter(val_d * F.lit(2000.0) > tot_d)
        .select(
            "partkey",
            val_d.alias("value"),
            (val_d / tot_d).alias("share"),
        )
    )


@query(
    "join_top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM({_DEC_REV}) AS DECIMAL(38,6)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def join_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: supplier(s) with maximum 1995
    revenue.  The `= (SELECT MAX(...))` scalar subquery decorrelates to
    a one-row MAX aggregate cross-joined back onto the per-supplier
    rows — the one-row side broadcasts, so the comparison is map-side
    (an empty-frame window MAX would instead funnel every per-supplier
    row to a single partition: fine at bench scale, a straggler at
    10⁸ suppliers).  Keeping `revenue = max` (exact DECIMAL equality)
    is ties-safe by construction: every supplier at the max survives,
    no nondeterministic LIMIT 1.  One fact shuffle (supplier agg), then
    dim join."""
    li = table(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    per = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).cast("decimal(38,6)").alias("total_rev"))
        # one aggregate, two consumers (max + filter): truncate lineage
        # so the fact scan is not replayed for the scalar side
        .transform(truncate)
    )
    mx = per.agg(F.max("total_rev").alias("mx"))
    top = per.crossJoin(mx).filter(F.col("total_rev") == F.col("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(s, top.l_suppkey == s.s_suppkey).select(
        "s_suppkey",
        "s_name",
        F.col("total_rev").cast("double").alias("total_revenue"),
    )


@query(
    "agg_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY 1, 2
    """,
)
def agg_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier diversity: distinct suppliers per
    (brand, type), excluding suppliers with negative account balance.
    The NOT IN subquery decorrelates to a LEFT ANTI join against the
    excluded-supplier keys (safe here because s_suppkey is non-null —
    NOT IN's three-valued NULL trap doesn't arise, which the anti join
    would otherwise not replicate).  The fact side is reduced to
    DISTINCT (brand, type, suppkey) BEFORE the count — the distinct and
    the count-distinct share one shuffle's partitioning."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    excluded = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .select("p_brand", "p_type", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type").agg(
        F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt")
    )


@query(
    "agg_small_qty_revenue",
    oracle="""
    WITH a AS (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                  AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT COUNT(*) AS n_items,
           CAST(CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))))
                AS DECIMAL(38,0)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l JOIN a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * a.avg_qty
    """,
)
def agg_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: yearly revenue potential
    of line items ordered below 20% of their part's average quantity.
    The correlated scalar subquery AVG(l_quantity per part)
    decorrelates to one per-part aggregate joined back to the fact —
    the aggregate side is O(parts), broadcast-eligible under AQE since
    it is two columns.  The per-part average is one deterministic IEEE
    division of an exact decimal sum (per-part sums stay bounded at any
    corpus size); the GLOBAL revenue sum FLOOR-quantizes first (2⁵³
    rule — it grows with the corpus); the 0.2× threshold and final /7
    are single double ops, identical on both engines."""
    li = table(spark, sf_dir, "lineitem")
    avg_qty = (
        F.sum(dec("l_quantity")).cast("decimal(38,6)").cast("double")
        / F.count(F.lit(1))
    ).alias("avg_qty")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(avg_qty)
    joined = li.join(per_part, li.l_partkey == per_part.pk).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            F.floor(F.sum(dec("l_extendedprice")))
            .cast("decimal(38,0)").cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
    )


@query(
    "join_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
               AS DECIMAL(38,6)) AS qty
      FROM lineitem GROUP BY 1
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
               AS DECIMAL(38,6)) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_totalprice,
           CAST(b.qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def join_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: orders totalling more than
    250 units, with their customer.  The IN-over-grouped-HAVING
    subquery decorrelates to aggregate-then-join: the fact table
    reduces to O(qualifying orders) rows BEFORE touching orders or
    customer, so the expensive side of both joins is the small filtered
    aggregate, not raw lineitem.  Quantity sums stay exact DECIMAL
    through the HAVING comparison (decimal > integer literal is exact);
    one double cast at output."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("decimal(38,6)").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
            F.col("qty").cast("double").alias("total_qty"),
        )
    )


@query(
    "join_sole_blame_supplier",
    oracle="""
    WITH r AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R'
    ),
    a AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM a
      WHERE a.l_orderkey = r.l_orderkey AND a.l_suppkey <> r.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM r r2
      WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey
    )
    GROUP BY 1, 2
    """,
)
def join_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped sole-blame analysis: per supplier, the number of
    multi-supplier orders where ONLY that supplier had a returned line
    item.  The EXISTS / NOT-EXISTS pair decorrelates to a LEFT SEMI
    then LEFT ANTI join on the order key with the supplier-inequality
    folded into each join condition — both probe sides are
    pre-DISTINCTed (order, supplier) pairs, so no join ever touches raw
    fact rows twice and multiplicity cannot inflate the count.  All
    keys are non-null, so semi/anti are exactly EXISTS/NOT EXISTS."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        # feeds three consumers (probe + both subquery sides)
        .transform(truncate)
    )
    anyone = li.select("l_orderkey", "l_suppkey").distinct()
    r = returned.alias("r")
    multi = r.join(
        anyone.alias("a"),
        (F.col("a.l_orderkey") == F.col("r.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("r.l_suppkey")),
        "left_semi",
    )
    sole = multi.alias("m").join(
        returned.alias("r2"),
        (F.col("r2.l_orderkey") == F.col("m.l_orderkey"))
        & (F.col("r2.l_suppkey") != F.col("m.l_suppkey")),
        "left_anti",
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "join_min_price_supplier",
    oracle="""
    WITH m AS (
      SELECT l_partkey, MIN(l_extendedprice) AS mn
      FROM lineitem GROUP BY 1
    )
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, s.s_acctbal,
           l.l_extendedprice AS min_price
    FROM lineitem l
    JOIN m ON m.l_partkey = l.l_partkey AND l.l_extendedprice = m.mn
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    """,
)
def join_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each part, the
    supplier(s) that sold it at its minimum observed price.  The
    correlated `= (SELECT MIN(...) WHERE partkey = outer.partkey)`
    decorrelates to a window MIN over the part key — ONE shuffle on
    l_partkey, no aggregate-plus-join-back second pass (the oracle
    keeps the textbook join-back form to prove equivalence).  MIN over
    double and the equality test are exact on both engines (same
    stored value, no arithmetic); ties keep every supplier at the
    minimum, so the result is deterministic without a tie-break
    LIMIT."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    at_min = (
        li.withColumn("mn", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("mn"))
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .distinct()
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        at_min.join(p, at_min.l_partkey == p.p_partkey)
        .join(s, at_min.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "s_acctbal",
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
    )


_SQL_CORRELATED = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_totalprice > (
  SELECT 1.5 * AVG(o2.o_totalprice)
  FROM orders o2
  WHERE o2.o_orderstatus = o.o_orderstatus
)
AND NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o.o_orderpriority
"""


@query("sql_correlated_subqueries", oracle=_SQL_CORRELATED)
def sql_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries through the SQL ENTRY POINT: the textbook
    correlated-scalar (orders more than 1.5× their status group's
    average price) plus a correlated NOT EXISTS (no returned line
    item), as ONE ANSI string run verbatim by both ``spark.sql`` and
    the DuckDB oracle.  Where the sibling queries in this module
    hand-decorrelate for plan control, this one proves CATALYST'S OWN
    decorrelation (RewriteCorrelatedScalarSubquery → aggregate+join,
    RewritePredicateSubquery → left anti join) produces the same
    answers — a user can write either style and get scale-safe plans.

    Determinism note: AVG over doubles is order-dependent in general,
    but here it is computed per o_orderstatus group over the same
    full-precision doubles in both engines only as a FILTER bound, and
    the fixture's price spread (≥1e-2 gaps vs ≤1e-10 summation jitter)
    keeps every order on the same side of the 1.5×avg threshold in both
    engines — asserted by the hash check itself; the surfaced columns
    are exact integers."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_CORRELATED)
