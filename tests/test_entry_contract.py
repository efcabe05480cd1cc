"""Driver-contract smoke tests for __spark_entry__.py (t1 replica)."""

from __future__ import annotations

import importlib.util
import os

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO_DIR, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_align(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every callable runs lazily without error at sf0.001
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name


def test_register_tables_sql_entry(spark, sf_dir):
    # arbitrary ANSI SQL over the registered views, incl. an events.ts
    # wall-clock derivation (exercises the normalization layer through
    # the SQL surface)
    from kinesis_handler_spark.tables import TABLES, register_tables

    views = register_tables(spark, sf_dir)
    assert set(views) == set(TABLES)
    row = spark.sql("""
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT l_returnflag) AS flags
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    """).collect()[0]
    assert row["n"] > 0 and row["flags"] >= 2
    days = spark.sql(
        "SELECT CAST(ts AS DATE) AS d, COUNT(*) n FROM events GROUP BY 1"
    ).collect()
    assert len(days) > 1
