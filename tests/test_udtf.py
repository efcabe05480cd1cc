"""Python UDTF surface: 1 row -> N rows with imperative logic
(SURVEY.md §2.B UDF/UDAF/UDTF table)."""

from __future__ import annotations

from kinesis_handler_spark.functions.udtfs import (
    register_udtfs,
    tokenize_udtf_table,
)


def test_udtf_direct_call(spark):
    rows = tokenize_udtf_table(spark, "the quick fox").collect()
    assert [(r["pos"], r["token"], r["is_stop"]) for r in rows] == [
        (0, "the", True),
        (1, "quick", False),
        (2, "fox", False),
    ]


def test_udtf_lateral_join(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "the cat"), (2, "dog")], "doc_id int, text string"
    ).createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["pos"], r["token"], r["is_stop"])
        for r in spark.sql(
            "SELECT d.doc_id, t.* FROM udtf_docs d, LATERAL tokenize(d.text) t"
        ).collect()
    }
    assert got == {
        (1, 0, "the", True),
        (1, 1, "cat", False),
        (2, 0, "dog", False),
    }


def test_udtf_null_input_yields_nothing(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, None)], "doc_id int, text string"
    ).createOrReplaceTempView("udtf_null_docs")
    assert (
        spark.sql(
            "SELECT t.* FROM udtf_null_docs d, LATERAL tokenize(d.text) t"
        ).count()
        == 0
    )
