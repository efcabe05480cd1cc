"""t2 replica: every declared query hash-matches its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from kinesis_handler_spark.registry import QUERIES, all_queries
from tools.check_oracle import check_query, duckdb_conn

ALL = sorted(all_queries())


@pytest.fixture(scope="module")
def oracle_con(sf_dir) -> duckdb.DuckDBPyConnection:
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    ok, msg = check_query(spark, oracle_con, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_has_doc():
    for name, q in QUERIES.items():
        assert q.doc.strip(), f"{name} missing docstring"


def test_rows_only_queries_are_marked():
    # Only genuinely non-SQL-expressible ops may skip the oracle.
    rows_only = {n for n, q in QUERIES.items() if q.oracle is None}
    assert rows_only <= {
        "agg_approx_distinct",   # HLL sketch is engine-specific
        "dedup_near_minhash",    # xxhash64 minhash signatures
        "dedup_simhash",         # xxhash64 simhash fingerprints
        "sim_ann_lsh",           # xxhash64-derived hyperplanes
        "sim_ann_ivf",           # IVF cell assignment is engine-specific
        "text_fingerprint",      # xxhash64 rolling hash
        "multimodal_features",   # stubbed decode pipeline
    }
