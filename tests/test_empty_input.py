"""Totality on empty input: every declared query must EXECUTE against a
schema-identical, zero-row copy of the fixture tables.

Why this matters at 100 TB: partition pruning, selective filters, and
per-tenant slicing routinely hand an operator ZERO rows (a new tenant, a
future date range, an empty shard).  An operator that assumes "at least
one row" — head-of-list, np.stack of an empty batch, sqrt(N) index
sizing, division by a count — kills the whole job on the one empty
slice.  This suite pins the property that every query in the registry is
a TOTAL function of its input: on empty tables it returns a well-formed
(usually empty) DataFrame instead of raising.

Value semantics on empty input are intentionally NOT pinned here (a
global aggregate may legitimately return one row of zeros/NULLs); the
oracle suite covers values.  This suite pins execution only.
"""

from __future__ import annotations

import os

import pytest

from kinesis_handler_spark.registry import all_queries

_EMPTY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".fixture_cache",
    "sf_empty",
)

_QUERIES = all_queries()


@pytest.fixture(scope="session")
def empty_dir(spark) -> str:
    """Zero-row parquet twin of every fixture table, cached on disk.

    Twins mirror the RAW physical schemas (events.ts stays int64 nanos)
    so ``tables.table``'s normalization layers run unchanged.
    """
    from pyspark.sql import functions as F  # noqa: F401 - parity import

    from kinesis_handler_spark.tables import TABLES

    marker = os.path.join(_EMPTY_DIR, "_TWIN_COMPLETE")
    if not os.path.exists(marker):
        src = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        for name in TABLES:
            raw = spark.read.parquet(f"{src}/{name}.parquet")
            raw.limit(0).write.mode("overwrite").parquet(
                os.path.join(_EMPTY_DIR, f"{name}.parquet")
            )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return _EMPTY_DIR


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_total_on_empty_input(spark, empty_dir, name):
    df = _QUERIES[name](spark, empty_dir)
    n = df.count()
    assert n >= 0
    # The schema must be fully resolved (no analysis-time surprises
    # deferred into the empty plan).
    assert len(df.schema.fields) > 0
