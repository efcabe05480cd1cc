"""Salted join / salted distinct-agg: algebraic equivalence with the
unsalted plans on a deliberately skewed frame (90% of rows on one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_handler_spark.functions.skew import (
    salted_count_distinct,
    salted_join,
    with_salt,
)


def _skewed(spark, n=20_000):
    # 90% of rows on key 0, the rest uniform over 1..99
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )


def _dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed(spark), _dim(spark)
    plain = big.join(small, ["k"]).select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], n_salt=8).select("k", "payload", "name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    big = _skewed(spark)
    salted = with_salt(big.filter(F.col("k") == 0), n_salt=8)
    buckets = salted.groupBy("__salt").count().collect()
    # hot key's rows actually spread: all 8 salts populated, no bucket
    # holding more than half the key's rows
    total = sum(r["count"] for r in buckets)
    assert len(buckets) == 8
    assert max(r["count"] for r in buckets) < total / 2


def test_salted_count_distinct_is_exact(spark):
    df = _skewed(spark).withColumn("u", F.pmod(F.col("payload"), F.lit(500)))
    expect = {
        (r.k, r.n)
        for r in df.groupBy("k").agg(F.count_distinct("u").alias("n")).collect()
    }
    got = {
        (r.k, r.n_distinct)
        for r in salted_count_distinct(df, ["k"], "u", n_salt=8).collect()
    }
    assert got == expect


def test_salted_join_rejects_right_and_full(spark):
    # Replicating the small side across salts duplicates its unmatched
    # rows n_salt times under right/full joins — must be rejected.
    import pytest

    big, small = _skewed(spark), _dim(spark)
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, ["k"], n_salt=4, how=how)


def test_salted_join_left_matches_plain_left(spark):
    big = _skewed(spark).filter(F.col("k") <= 120)
    small = _dim(spark).filter(F.col("k") < 50)  # leave some big rows unmatched
    plain = big.join(small, ["k"], "left").select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], n_salt=8, how="left").select(
        "k", "payload", "name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
