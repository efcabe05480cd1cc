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
        "agg_approx_percentile", # GK sketch cut points are engine-specific
        "dedup_near_minhash",    # xxhash64 minhash signatures
        "dedup_simhash",         # xxhash64 simhash fingerprints
        "sim_ann_lsh",           # xxhash64-derived hyperplanes
        "sim_ann_ivf",           # IVF cell assignment is engine-specific
        "sim_ann_ivf_search",    # same pipeline, search-grade nprobe
        "dedup_embedding_ann",   # IVF candidate generation (scale tier)
        "text_fingerprint",      # xxhash64 rolling hash
        "dedup_pipeline_scale",  # minhash candidates are engine hashes
        "embed_pca",             # iterative eigen-solve; basis has no SQL
                                 # form — exactness pinned in test_training_ops.py
        "tokenizer_bpe_train",   # iterative merge learning; bit-exact
                                 # vs pure-Python reference in test_training_ops.py
        "tokenizer_bpe_apply",   # consumes the learned merge table (itself
                                 # the output of an iterative argmax); encode
                                 # parity vs pure-Python reference in
                                 # test_training_ops.py
        "events_rolling_distinct_hll",  # DataSketches HLL estimates are
        # engine-specific; pinned vs the exact tier in
        # tests/test_sketch_quality.py::test_rolling_distinct_hll_tracks_exact
        "dedup_incremental_minhash",  # xxhash64 band signatures (same
        # family as dedup_near_minhash); output-equivalence to the full
        # rerun proven in tests/test_dedup_pipeline.py
        "text_quality_classifier",  # ln() in the fixed-point llr — the
        # no-transcendentals-in-hash-checked-outputs rule; golden pin +
        # held-out AUC gate in tests/test_training_ops.py
        "dedup_keep_best_quality",  # composes two rows-only tiers
        # (minhash clusters x NB scores); invariants pinned in
        # tests/test_dedup_pipeline.py
        "sim_ann_incremental",  # probes the persisted IVF index (cell
        # assignment is engine-specific); recall floor + plan gate in
        # tests/test_ann.py
        "text_langid_classifier",  # ln() in the fixed-point weights;
        # golden pin + separable-fixture accuracy/macro-F1 floors in
        # tests/test_training_ops.py
    }


def test_approx_percentile_bounded_by_exact(spark, sf_dir):
    from kinesis_handler_spark.registry import all_queries

    qs = all_queries()
    exact = {
        r["o_orderpriority"]: (r["p50"], r["p90"], r["lo"], r["hi"])
        for r in qs["agg_percentiles"](spark, sf_dir).collect()
    }
    for r in qs["agg_approx_percentile"](spark, sf_dir).collect():
        p50, p90, lo, hi = exact[r["o_orderpriority"]]
        # GK sketch with accuracy=10000 on sf0.01-sized groups: tight
        assert lo <= r["p50_approx"] <= hi
        assert lo <= r["p90_approx"] <= hi
        assert abs(r["p50_approx"] - p50) <= 0.05 * (hi - lo)
        assert abs(r["p90_approx"] - p90) <= 0.05 * (hi - lo)
