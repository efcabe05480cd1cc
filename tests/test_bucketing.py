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


def test_ensure_bucketed_writes_spec_and_reregisters(spark, sf_dir, tmp_path):
    from kinesis_handler_spark.io.bucketing import ensure_bucketed

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    path = str(tmp_path / "orders_spec")
    try:
        ensure_bucketed(
            spark, orders, "orders_spec_a", ["o_custkey"], 4, path=path
        )
        assert (tmp_path / "orders_spec" / "_BUCKET_SPEC.json").exists()
        # a second session-alias registering the SAME spec over the same
        # files succeeds via DDL (no rewrite)
        ensure_bucketed(
            spark, orders, "orders_spec_b", ["o_custkey"], 4, path=path
        )
        assert read_bucketed(spark, "orders_spec_b").count() == orders.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_spec_a")
        spark.sql("DROP TABLE IF EXISTS orders_spec_b")


def test_ensure_bucketed_rejects_mismatched_spec(spark, sf_dir, tmp_path):
    # Declaring a DIFFERENT bucket spec over existing files would make
    # the planner skip exchanges against misaligned data — must raise.
    from kinesis_handler_spark.io.bucketing import ensure_bucketed

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    path = str(tmp_path / "orders_mismatch")
    try:
        ensure_bucketed(
            spark, orders, "orders_mm_a", ["o_custkey"], 4, path=path
        )
        with pytest.raises(ValueError, match="bucket spec mismatch"):
            ensure_bucketed(  # different n_buckets, same files
                spark, orders, "orders_mm_b", ["o_custkey"], 8, path=path
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_mm_a")
        spark.sql("DROP TABLE IF EXISTS orders_mm_b")


def test_ensure_bucketed_rejects_foreign_success_dir(spark, sf_dir, tmp_path):
    # A directory with _SUCCESS but no spec sidecar (plain parquet dump,
    # or a pre-sidecar write) must not be blessed with bucket metadata.
    from kinesis_handler_spark.io.bucketing import ensure_bucketed

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    path = tmp_path / "foreign"
    orders.write.mode("overwrite").parquet(str(path))
    assert (path / "_SUCCESS").exists()
    with pytest.raises(ValueError, match="no readable _BUCKET_SPEC"):
        ensure_bucketed(
            spark, orders, "orders_foreign", ["o_custkey"], 4, path=str(path)
        )
    spark.sql("DROP TABLE IF EXISTS orders_foreign")


def test_ensure_bucketed_nonrace_rename_failure_raises(
    spark, sf_dir, tmp_path, monkeypatch
):
    # ADVICE r6: an os.rename failure with NO winner present (EXDEV
    # across filesystems, permissions) must re-raise — not be mistaken
    # for a lost publish race, which silently deleted the just-written
    # bucketed data and later failed with a misleading missing-sidecar
    # error.  Only an existing final/_SUCCESS marks a real race loss.
    import os as _os

    from kinesis_handler_spark.io import bucketing

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    path = tmp_path / "orders_exdev"

    def exdev_rename(src, dst):
        raise OSError(18, "Invalid cross-device link", str(src))

    monkeypatch.setattr(bucketing.os, "rename", exdev_rename)
    try:
        with pytest.raises(OSError, match="cross-device"):
            bucketing.ensure_bucketed(
                spark, orders, "orders_exdev", ["o_custkey"], 4, path=str(path)
            )
        # the written tmp dir survives for inspection/manual recovery
        tmps = list(tmp_path.glob(".orders_exdev.tmp.*"))
        assert tmps and (tmps[0] / "_SUCCESS").exists()
    finally:
        monkeypatch.undo()
        spark.sql("DROP TABLE IF EXISTS orders_exdev")


def test_append_bucketed_keeps_colocated_plan_and_rows(
    spark, sf_dir, tmp_path, no_broadcast
):
    """r12: appended bucket files must stay co-located — the join plan
    keeps zero hash exchanges after any number of appends, and the
    rows are exactly first-write ∪ appends."""
    from kinesis_handler_spark.io.bucketing import append_bucketed

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(
        first, "orders_app_b", ["o_custkey"], 8,
        path=str(tmp_path / "orders_app_b"), sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer, "customer_app_b", ["c_custkey"], 8,
        path=str(tmp_path / "customer_app_b"), sort_cols=["c_custkey"],
    )
    try:
        append_bucketed(
            spark, second, "orders_app_b",
            path=str(tmp_path / "orders_app_b"),
        )
        o = read_bucketed(spark, "orders_app_b")
        c = read_bucketed(spark, "customer_app_b")
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange hashpartitioning" not in plan, plan
        got = {(r["o_orderkey"], r["c_name"]) for r in joined.collect()}
        expect = {
            (r["o_orderkey"], r["c_name"])
            for r in orders.join(
                customer, orders["o_custkey"] == customer["c_custkey"]
            ).select("o_orderkey", "c_name").collect()
        }
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_app_b")
        spark.sql("DROP TABLE IF EXISTS customer_app_b")


def test_append_bucketed_rejects_schema_drift_and_foreign_dirs(
    spark, sf_dir, tmp_path
):
    import pytest as _pytest

    from kinesis_handler_spark.io.bucketing import append_bucketed

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(
        orders, "orders_drift_b", ["o_custkey"], 8,
        path=str(tmp_path / "orders_drift_b"),
    )
    try:
        with _pytest.raises(ValueError, match="schema"):
            append_bucketed(
                spark,
                orders.withColumn("extra", F.lit(1)),
                "orders_drift_b",
                path=str(tmp_path / "orders_drift_b"),
            )
        # a plain parquet dir (no sidecar) must refuse appends
        plain = str(tmp_path / "plain")
        orders.write.parquet(plain)
        with _pytest.raises(ValueError, match="_BUCKET_SPEC"):
            append_bucketed(spark, orders, "orders_plain_b", path=plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_drift_b")
