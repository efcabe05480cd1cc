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
