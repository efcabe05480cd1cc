"""Sorts, limits, set operations, exact deduplication.

SURVEY.md §2.B "Sorts / limits / top-k / set ops" + `dedup_exact`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_handler_spark.registry import query
from kinesis_handler_spark.tables import table


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice > 350000.0
    ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + local sort at
    scale); explicit nulls ordering; trailing unique key makes the order
    total."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000.0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey"),
        )
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS LAST
    LIMIT 25
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25: ORDER BY + LIMIT compiles to TakeOrderedAndProject —
    each partition keeps only its local top-k, the driver merges k×P
    rows; no global sort materializes at 100 TB."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc_nulls_last(),
        )
        .limit(25)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS entity_id, 'customer' AS kind, c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_id, 'supplier' AS kind, s_acctbal AS acctbal
    FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL over conformed projections (unionByName — no shuffle,
    just concatenated partitions)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — compiles to a semi join on all
    columns after per-side dedup."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — BUILDING-segment customers who have no
    finished order (anti join after per-side dedup under the hood)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY text
                                ORDER BY doc_id NULLS LAST) AS rn
      FROM documents
    ) t
    WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on document text, keeping the lowest doc_id per text —
    deterministic (unlike dropDuplicates, which keeps an arbitrary row).
    One shuffle on the dedup key; at 100 TB hash the text first
    (sha2(text)) so the shuffle key is 32 bytes, not the document."""
    w = Window.partitionBy("text").orderBy(F.col("doc_id").asc_nulls_last())
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each nation key kept
    min(count_left, count_right) times.  Spark plans this as a single
    shuffle on the value with per-side counts merged — no distinct
    pre-pass, so duplicate multiplicity survives, unlike INTERSECT."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each customer key kept
    max(0, count_open - count_finished) times — multiplicity-aware
    difference, the dual of `set_intersect_all`.  One shuffle on the
    value with per-side counts differenced; no distinct pre-pass, so
    a customer with 3 open and 1 finished order appears twice."""
    o = table(spark, sf_dir, "orders")
    open_k = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    fin_k = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_k.exceptAll(fin_k)
