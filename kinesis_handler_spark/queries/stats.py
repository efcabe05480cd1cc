"""Statistical / reshaping operators: moment aggregates, percentiles,
ordered string aggregation, distribution windows, unpivot.

Determinism notes (registry.py rules): moment aggregates (stddev/corr/
covar) are inherently double accumulations whose raw last ulps depend
on partitioning — both engines' results are rounded to 6 decimals,
which is stable for this fixed data+config; percentile interpolation
uses the same (linear, percentile_cont) formula in Spark and DuckDB on
exact inputs; string aggregation fixes an explicit ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.functions.numeric import dec_t
from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6)              AS sd_qty,
           ROUND(var_samp(l_discount), 6)                 AS var_disc,
           ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qty_price,
           ROUND(corr(l_quantity, l_extendedprice), 6)    AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates per group. Both engines use the same
    textbook definitions; results are rounded to 6 decimals because the
    raw accumulations are order-dependent in the last ulps (Spark's
    partitioned partial aggregation vs DuckDB's sequential scan)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "cov_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
             AS p50,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6)
             AS p90,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (linear interpolation — the
    percentile_cont definition both engines implement). Exact
    percentile requires a per-group sort: fine as a reporting
    aggregate; at 100 TB use approx_percentile (t-digest sketch,
    `agg_approx_distinct`-style mergeable state) for pipeline use."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query("agg_approx_percentile")  # rows-only: sketch internals are engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: approx_percentile's mergeable
    Greenwald-Khanna sketch — map-side partials merge associatively, so
    no per-group sort and state is O(1/accuracy) per group regardless of
    group size.  Deterministic for a fixed dataset + accuracy but the
    sketch cut points are engine-specific => rows-only oracle; pytest
    bounds it against the exact percentile (`agg_percentiles`)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per group: collect, sort
    deterministically, join — order fixed explicitly because unordered
    LISTAGG output is partitioning-dependent."""
    n = table(spark, sf_dir, "nation")
    # collect_list skips NULLs (like string_agg); an all-NULL group must
    # yield NULL, not '' — the when() mirrors string_agg's semantics.
    arr = F.array_sort(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.when(F.size(arr) > 0, F.array_join(arr, ",")).alias("nations")
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS LAST, o_orderkey NULLS LAST)
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing, percent rank,
    cumulative distribution — rank arithmetic over a total order
    (tie-broken by key), so the doubles are exact integer ratios."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "reshape_unpivot",
    oracle="""
    -- UNION ALL, not DuckDB's UNPIVOT: UNPIVOT silently drops rows
    -- whose metric value is NULL, while Spark's unpivot (and this
    -- query's melt semantics) keep them.
    SELECT o_orderkey, 'totalprice' AS metric,
           CAST(o_totalprice AS DOUBLE) AS value
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
    FROM orders WHERE o_orderkey < 1000
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape (UNPIVOT/melt): each metric column becomes a
    (metric, value) row — the feed shape for per-metric aggregation
    pipelines. Column-generated rows, no shuffle."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(CASE WHEN isfinite(o_totalprice)
                          AND abs(o_totalprice) < 1.0e14
                     THEN least(floor(o_totalprice / 50000.0), 9.0) END
                AS INTEGER) AS bucket,
           COUNT(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (data-profiling primitive): bucket order
    totals into 10 × 50k bins with the top bin clamped open-ended.
    Bucketing is one IEEE-exact division + floor per row (identical in
    both engines), then an ordinary partial+final hash agg on a 10-value
    key — at 100 TB the map-side combine collapses each partition to
    ≤10 rows before the shuffle."""
    o = table(spark, sf_dir, "orders")
    # Non-finite prices have no bucket: floor(±Inf) is Long.MIN/MAX and
    # the INT cast raises under ANSI — NULL-bucket them instead (the
    # profiling-honest answer; NULL/NaN/Inf rows surface as one bucket).
    p = F.col("o_totalprice")
    # Magnitude cap as well as finiteness, SYMMETRIC on both signs:
    # least(...) clamps only the positive side to bucket 9, so the cap
    # must keep floor(p/50000) inside INT range for negatives too —
    # 1e14/50000 = 2e9 < INT_MAX on either sign (a finite price below
    # about -1.07e14 would otherwise floor under INT_MIN and the ANSI
    # int cast would raise on both engines, ADVICE r5).  Any |price|
    # past the cap is off this histogram's domain and lands in the NULL
    # bucket (values >= 500k already clamp to bucket 9, so the cap
    # changes nothing representable).
    finite = ~F.isnan(p) & (F.abs(p) < F.lit(1.0e14))
    bucket = F.when(
        finite,
        F.least(F.floor(p / 50000.0), F.lit(9).cast("bigint")),
    ).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(8,3))
                     * CAST(l_extendedprice AS DECIMAL(12,3))))
                   AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(8,3))))
                   AS DECIMAL(38,0)) AS DOUBLE) AS wavg_price,
           CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,3))
                     * CAST(l_discount AS DECIMAL(8,6))))
                   AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,3))))
                   AS DECIMAL(38,0)) AS DOUBLE) AS wavg_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted averages (quantity-weighted unit price, revenue-weighted
    discount) — the aggregate every pricing mart needs that plain AVG
    gets wrong.  Numerator and denominator are each an exact decimal
    sum FLOOR-quantized to DECIMAL(38,0) and converted to double once;
    the final value is then ONE IEEE division — fully order-independent
    on both engines AT ANY SCALE (the sf1.0 probe caught the previous
    DECIMAL(38,6) quantization drifting 1-2 ULPs once the sum's integer
    representation Σ×10⁶ crossed 2⁵³ — past that, Spark rounds the
    exact BigDecimal while DuckDB converts int128 then divides, two
    different roundings; FLOOR + integer→double is single-rounded
    everywhere, the agg_corr_regression recipe).  Flooring a ~10¹²
    numerator perturbs the quotient by <10⁻¹² relative — part of the
    operator spec.  Same single-shuffle partial+final shape as any hash
    aggregate.

    Decimal widths are sized to the DATA (quantity fits DECIMAL(8,3),
    price DECIMAL(12,3), discount DECIMAL(8,6)) so cross products stay
    inside engines' 64-bit decimal fast path — DECIMAL(18,6) inputs
    overflow DuckDB's int64 multiplication here.  The fixture values
    carry <=2 fractional digits, so scale 3/6 is exact."""
    li = table(spark, sf_dir, "lineitem")
    qty = dec_t(F.col("l_quantity"), "decimal(8,3)")
    price = dec_t(F.col("l_extendedprice"), "decimal(12,3)")
    disc = dec_t(F.col("l_discount"), "decimal(8,6)")

    def dsum(col):
        return F.floor(F.sum(col)).cast("decimal(38,0)").cast("double")

    return li.groupBy("l_returnflag").agg(
        (dsum(qty * price) / dsum(qty)).alias("wavg_price"),
        (dsum(price * disc) / dsum(price)).alias("wavg_discount"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, CASE
               WHEN o_totalprice IS NULL OR o_orderkey IS NULL THEN NULL
               ELSE printf('%020.6f|%020d', o_totalprice, o_orderkey) END)
             AS biggest_orderkey,
           arg_min(o_orderkey, CASE
               WHEN o_totalprice IS NULL OR o_orderkey IS NULL THEN NULL
               ELSE printf('%020.6f|%020d', o_totalprice, o_orderkey) END)
             AS smallest_orderkey,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by/min_by): the order key carrying
    each priority's largest/smallest total.  Neither engine defines
    tie-breaks for max_by, so the ordering key is a zero-padded
    fixed-width string `price|orderkey` — lexicographic order equals
    (price, orderkey) numeric order for these non-negative domains,
    making the argmax total and deterministic on both engines.  Plain
    single-shuffle hash agg; max_by keeps one (key, value) pair of
    state per group."""
    o = table(spark, sf_dir, "orders")
    # format_string renders NULL arguments as the literal string "null"
    # (which would out-sort every digit); NULL the key instead so both
    # engines' argmax skip rows with incomplete ordering inputs.
    ordkey = F.when(
        F.col("o_totalprice").isNotNull() & F.col("o_orderkey").isNotNull(),
        F.format_string("%020.6f|%020d", "o_totalprice", "o_orderkey"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordkey).alias("biggest_orderkey"),
        F.min_by("o_orderkey", ordkey).alias("smallest_orderkey"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "agg_bool_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: count_if (aggregate FILTER
    shorthand), bool_and / bool_or (universal and existential
    quantifiers per group) — the predicates-over-groups surface data-
    quality rules compile to.  Plain hash agg with map-side combine;
    DuckDB's count_if returns HUGEINT, so the oracle pins BIGINT."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000.0).alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )
