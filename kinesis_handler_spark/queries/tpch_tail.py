"""The last three TPC-H query shapes (round 5): Q8 market share, Q9
profit decomposition, Q20 dominant-supplier nested subquery — with
these, all 22 TPC-H query patterns have a declared, oracle-backed
re-expression over the fixture star schema.

Adaptations forced by the reduced fixture schema (no partsupp, no
n_name join keys beyond integer keys): Q9's part cost uses
``p_retailprice`` as the unit-cost proxy, and Q20's availability
threshold becomes a shipped-quantity dominance test — the PLAN SHAPES
(multi-role dim joins, conditional share, nested aggregate → semi
join) are the point, and are preserved exactly.

Reference note: the reference library (lib/kinesisHandler.js) has no
relational surface — these are north-star mandates (SURVEY.md §2.B)
following the registry.py determinism rules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.lineage import truncate
from kinesis_handler_spark.functions.numeric import dec
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table

_DEC_REV = (
    "CAST(l.l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l.l_discount AS DECIMAL(18,6)))"
)


@query(
    "join_market_share",
    oracle=f"""
    WITH sales AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_DEC_REV} AS volume,
             sn.n_nationkey AS supp_nation
      FROM lineitem l
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(CAST(FLOOR(SUM(CASE WHEN supp_nation = 7 THEN volume END))
                  AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(FLOOR(SUM(volume)) AS DECIMAL(38,0)) AS DOUBLE)
             AS mkt_share,
           CAST(CAST(FLOOR(SUM(volume)) AS DECIMAL(38,0)) AS DOUBLE)
             AS total_volume
    FROM sales
    GROUP BY o_year
    """,
)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_7's share of supplier
    revenue into the ASIA customer market, per order year.  The shape:
    nation joined under TWO roles (customer side restricts the market,
    supplier side tags the share numerator), and share = conditional
    sum / total sum computed in ONE aggregation pass (`SUM(CASE)`, no
    second scan).  Both geography dims broadcast (bounded by the data
    model); the two fact joins shuffle on their keys.  Sums stay exact
    DECIMAL and are FLOOR-quantized (per-year groups are BOUNDED, so
    they grow linearly with corpus size — the 2⁵³ rule,
    functions/numeric.floor_sum; the sf1 magnitude audit measured this
    query's totals AT the drift bound); the share is one IEEE
    division of the floored sums."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    )
    r = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    sales = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == cn.n_nationkey)
        .join(r, cn.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("s_nationkey").alias("supp_nation"),
        )
    )
    num = F.floor(
        F.sum(F.when(F.col("supp_nation") == 7, F.col("volume")))
    ).cast("decimal(38,0)")
    tot = F.floor(F.sum("volume")).cast("decimal(38,0)")
    return sales.groupBy("o_year").agg(
        (num.cast("double") / tot.cast("double")).alias("mkt_share"),
        tot.cast("double").alias("total_volume"),
    )


@query(
    "agg_profit_by_nation_year",
    oracle="""
    SELECT sn.n_nationkey AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(FLOOR(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l.l_discount AS DECIMAL(18,6)))
             - CAST(CAST(p.p_retailprice AS DECIMAL(18,6))
                    * CAST(0.1 AS DECIMAL(2,1)) AS DECIMAL(18,6))
               * CAST(l.l_quantity AS DECIMAL(18,6))
           )) AS DECIMAL(38,0)) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
)
def agg_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit decomposition: per (supplier nation,
    order year), revenue minus cost for one product family (the
    fixture has no partsupp table, so unit cost is proxied as 10% of
    ``p_retailprice`` — the four-join plus name-filter PLAN SHAPE is
    Q9's).  The part-name predicate is pushed into the part scan and
    shrinks the fact side at its FIRST join; profit stays exact
    DECIMAL through the sum (0.1 is a decimal literal — exact scale-7
    products on both engines), FLOOR-quantized before the one double
    cast (bounded nation×year groups — the 2⁵³ rule; FLOOR is toward
    -inf on both engines, so negative profits floor identically)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_retailprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # unit cost = 0.1 × retailprice, re-quantized to scale 6 BEFORE the
    # quantity product: retail prices carry ≤2 decimal digits, so the
    # scale-7→6 cast drops only zeros (exact on both engines) and keeps
    # DuckDB's decimal-width promotion inside its 38-digit cap — the
    # naive triple product overflows there (its binary-op widening is
    # narrower than Spark's).
    unit_cost = (
        dec("p_retailprice") * F.lit("0.1").cast("decimal(2,1)")
    ).cast("decimal(18,6)")
    profit_term = dec("l_extendedprice") * (
        F.lit(1) - dec("l_discount")
    ) - unit_cost * dec("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.floor(F.sum(profit_term))
            .cast("decimal(38,0)")
            .cast("double")
            .alias("profit")
        )
    )


@query(
    "join_dominant_supplier",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
               AS DECIMAL(38,6)) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, CAST(SUM(qty) AS DECIMAL(38,6)) AS total_qty
      FROM per GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM supplier s
    JOIN per ON per.l_suppkey = s.s_suppkey
    JOIN tot ON tot.l_partkey = per.l_partkey
    JOIN part p ON p.p_partkey = per.l_partkey
    WHERE p.p_name LIKE '%gear%'
      AND 10 * per.qty > tot.total_qty
    GROUP BY 1, 2
    """,
)
def join_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested-aggregate supplier screen: suppliers
    OVER-REPRESENTED in a part's volume (>10% of total shipped — each
    fixture part has ~30 suppliers, so uniform share is ~3%), for one
    product family (the fixture lacks partsupp.availqty, so Q20's
    excess-inventory test becomes a shipped-share dominance test —
    same nested shape: inner aggregate per (part, supplier), second
    aggregate per part, correlated comparison, reduce to suppliers).
    The part-name screen is pushed BELOW both aggregates as a semi-join
    (valid because per/tot group on the part key, so restricting parts
    first commutes with both; ~8× less aggregate input at any SF — and
    the lineage truncation on `per` is an optimizer barrier, so Catalyst
    could not have pushed it for us), the two aggregates share one
    shuffle lineage (per-(part,supplier) first, per-part second — the
    second input is the FIRST's output, never a fact re-scan), and
    10·qty > total is exact DECIMAL cross-multiplication, no
    division."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).join(p, F.col("l_partkey") == p.p_partkey, "leftsemi")
    per = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("decimal(38,6)").alias("qty"))
        # one aggregate, two consumers (per-part total + the comparison)
        .transform(truncate)
    )
    tot = per.groupBy("l_partkey").agg(
        F.sum("qty").cast("decimal(38,6)").alias("total_qty")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dominated = per.join(tot, "l_partkey").filter(
        F.lit(10) * F.col("qty") > F.col("total_qty")
    )
    return (
        dominated.join(s, dominated.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dominated_parts"))
    )
