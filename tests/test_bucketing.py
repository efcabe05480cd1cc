"""Bucketed co-located join: the shuffle disappears from the plan and
results stay identical to the shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_handler_spark.io.bucketing import read_bucketed, write_bucketed
from kinesis_handler_spark.tables import table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b",
        ["o_custkey"],
        8,
        path=str(tmp_path / "orders_b"),
        sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        "customer_b",
        ["c_custkey"],
        8,
        path=str(tmp_path / "customer_b"),
        sort_cols=["c_custkey"],
    )
    try:
        ob, cb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().toString()
        # co-located: bucket-to-bucket join, no hash-partitioning exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan

        # and the result matches the plain (shuffled) join exactly
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).select("o_orderkey", "c_name")
        got = joined.select("o_orderkey", "c_name")
        assert got.count() == plain.count()
        assert got.exceptAll(plain).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_groupby_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    write_bucketed(
        orders.select("o_custkey", "o_totalprice"),
        "orders_gb",
        ["o_custkey"],
        8,
        path=str(tmp_path / "orders_gb"),
    )
    try:
        agg = (
            read_bucketed(spark, "orders_gb")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = agg._jdf.queryExecution().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_gb")


def test_declared_bucketed_query_joins_and_aggregates_without_exchange(
    spark, sf_dir, no_broadcast
):
    # The declared-query surface of the same capability
    # (join_bucketed_colocated): join AND per-customer aggregation must
    # both ride the bucket clustering - no hash-partitioning exchange
    # in the whole plan.
    import kinesis_handler_spark.queries  # noqa: F401
    from kinesis_handler_spark.registry import QUERIES

    df = QUERIES["join_bucketed_colocated"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "Exchange hashpartitioning" not in plan, plan
