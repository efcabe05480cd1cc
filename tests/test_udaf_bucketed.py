"""Equivalence gate for the bucketed ``udaf_grouped_pandas`` kernel
(r13 optimization): grouping the Python stage by a hash bucket instead
of by user_id amortizes the per-group Arrow/Python call tax, and MUST
be row-identical to the straightforward per-group shape on every
hostile axis the chaos twins exercise — NULL user_id (a whole NULL
group), int64 keys above 2^53 (the float64-demotion trap that forces
the string crossing), duplicate extreme keys, and all-NULL value
groups (median NULL)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from kinesis_handler_spark.functions.worker_tune import tuned
from kinesis_handler_spark.queries.llm import udaf_grouped_pandas
from kinesis_handler_spark.tables import table

_HOSTILE_ROWS = [
    (9223372036854775800, 1.0),
    (9223372036854775800, 3.0),
    (None, 5.0),
    (None, 7.0),
    (None, None),
    (1, None),
    (1, None),
    (2, 2.0),
    (2, 4.0),
    (2, 6.0),
    (2, 8.0),
    (-9223372036854775807, 10.0),
]


def _reference(df):
    """The pre-r13 per-group shape: one applyInPandas call per user."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [float(pdf["value"].median())],
            }
        )

    return df.groupBy("user_id").applyInPandas(
        tuned(stats), "user_id long, n_events long, median_value double"
    )


def _bucketed(df, width: int):
    """The r13 kernel body, bucket width pinned for the test."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("uid", dropna=False)["value"]
        return g.agg(n_events="size", median_value="median").reset_index()

    b = df.select(
        F.col("user_id").cast("string").alias("uid"),
        "value",
        F.pmod(F.xxhash64("user_id"), F.lit(width)).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .applyInPandas(
            tuned(stats), "uid string, n_events long, median_value double"
        )
        .select(
            F.col("uid").cast("long").alias("user_id"),
            "n_events",
            F.col("median_value").cast("double").alias("median_value"),
        )
    )


def _sorted(rows):
    return sorted(
        (tuple(r) for r in rows), key=lambda t: (t[0] is None, t[0] or 0)
    )


def test_bucketed_matches_per_group_on_hostile_frame(spark):
    df = spark.createDataFrame(_HOSTILE_ROWS, "user_id long, value double")
    # width 1 (all users in one call) and width 7 (users split across
    # buckets, some buckets empty) both reproduce the per-group result
    ref = _sorted(_reference(df).collect())
    for width in (1, 7):
        got = _sorted(_bucketed(df, width).collect())
        assert got == ref, f"width={width}"
    # the extreme keys round-tripped exactly (string crossing, not f64)
    keys = [r[0] for r in ref]
    assert 9223372036854775800 in keys and -9223372036854775807 in keys


def test_declared_query_matches_per_group_on_fixture(spark, sf_dir):
    e = table(spark, sf_dir, "events").select("user_id", "value")
    ref = _sorted(_reference(e).collect())
    got = _sorted(udaf_grouped_pandas(spark, sf_dir).collect())
    assert got == ref
