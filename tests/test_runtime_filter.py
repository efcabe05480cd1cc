"""Runtime bloom-filter join pruning (Spark's runtime semi-join
reduction): when a selective dim-side filter feeds a shuffle join,
Catalyst can inject a `bloom_filter_agg` on the build side and a
`might_contain` filter on the fact side, so fact rows that cannot join
are dropped AT THE SCAN, before the shuffle.

At 100 TB this fires with stock thresholds (the application side must
scan >10 GB by default); bench-scale fixtures are far below that, so
the test lowers `applicationSideScanSizeThreshold` to simulate the
at-scale decision and pins that (a) the filter injects, (b) results
are identical with and without it."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bloom_spark(spark):
    """The shared session with runtime-filter thresholds shrunk to
    bench scale (and broadcast disabled so the join actually shuffles —
    broadcast joins don't need a runtime filter).  Restores conf after."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, sf_dir):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )


def test_runtime_bloom_filter_injects_on_selective_dim_join(
    bloom_spark, sf_dir
):
    plan = (
        _join(bloom_spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "bloom_filter_agg" in plan, "no build-side bloom aggregate"
    assert "might_contain" in plan, "no fact-side runtime filter"
    # the runtime filter must sit on the FACT side's key
    fact_filter = next(
        line for line in plan.splitlines() if "might_contain" in line
    )
    assert "l_orderkey" in fact_filter


def test_runtime_bloom_filter_preserves_results(bloom_spark, sf_dir):
    with_filter = {
        tuple(r) for r in _join(bloom_spark, sf_dir).collect()
    }
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        without = {tuple(r) for r in _join(bloom_spark, sf_dir).collect()}
    finally:
        bloom_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert with_filter == without and with_filter
