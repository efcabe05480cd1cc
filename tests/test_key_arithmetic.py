"""Exactness gates for the r7 overflow-free key arithmetic.

The extreme-key twin (tools/make_dirty_twin.py, ``keys`` mode) proves
the QUERIES survive hostile ids end-to-end; these tests pin the two
underlying FORMULAS against an independent big-int reference over the
whole int64 domain, so a future refactor cannot quietly change either:

* the split-multiply Knuth sampling bucket
  (``queries.pipeline._bucket_col`` / ``_bucket_sql``) must equal
  ``pmod(id, 2^32) * 2654435761 mod 2^32 mod 1000`` computed in
  arbitrary-precision Python, and the naive ``id * K`` form wherever
  that form does not overflow;
* the bitwise oracle's HUGEINT wrap (``scalar_bitwise``) must equal
  Java's two's-complement ``<< 3``.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_handler_spark.queries.pipeline import (
    _KNUTH,
    _MOD,
    _bucket_sql,
)

I64_MIN, I64_MAX = -(2**63), 2**63 - 1
EDGES = [
    I64_MIN, I64_MIN + 1, -(2**32) - 1, -(2**32), -(2**32) + 1,
    -999_983, -1000, -1, 0, 1, 999, 1000, 2**32 - 1, 2**32, 2**32 + 1,
    2**53 - 1, 2**53, I64_MAX - 1, I64_MAX,
]


def _ref_bucket(x: int) -> int:
    # Python % on a positive modulus IS pmod (floor-mod, non-negative).
    return ((x % _MOD) * _KNUTH) % _MOD % 1000


def _ref_shl3(x: int) -> int:
    # Java two's-complement wrap of x << 3.
    return ((x << 3) + 2**63) % 2**64 - 2**63


@settings(max_examples=30, deadline=None)
@given(xs=st.lists(st.integers(I64_MIN, I64_MAX), min_size=1, max_size=50))
def test_bucket_sql_matches_bigint_reference(xs):
    xs = xs + EDGES
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    got = [r[0] for r in con.execute(
        f"SELECT {_bucket_sql('x')} FROM t ORDER BY rowid"
    ).fetchall()]
    want = [_ref_bucket(x) for x in xs]
    assert got == want
    assert all(0 <= b < 1000 for b in got)


def test_bucket_equals_naive_form_where_it_does_not_overflow():
    # The commit claim: for the fixtures' non-negative sub-2^32 ids the
    # split form is bit-identical to the naive (id * K) % 2^32 % 1000.
    con = duckdb.connect()
    n = con.execute(
        f"""SELECT count(*) FROM (
              SELECT range AS x FROM range(0, 2000000, 7)
            ) WHERE (x * {_KNUTH}) % {_MOD} % 1000 <> {_bucket_sql('x')}"""
    ).fetchone()[0]
    assert n == 0


@settings(max_examples=30, deadline=None)
@given(xs=st.lists(st.integers(I64_MIN, I64_MAX), min_size=1, max_size=50))
def test_hugeint_shl_wrap_matches_java_semantics(xs):
    xs = xs + EDGES
    wrap = (
        "CAST((((CAST(x AS HUGEINT) * 8) % 18446744073709551616"
        " + 18446744073709551616 + 9223372036854775808)"
        " % 18446744073709551616) - 9223372036854775808 AS BIGINT)"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    got = [r[0] for r in con.execute(
        f"SELECT {wrap} FROM t ORDER BY rowid"
    ).fetchall()]
    want = [_ref_shl3(x) for x in xs]
    assert got == want


def test_spark_column_forms_match_reference(spark):
    # One Spark round for the Column-side implementations over the edge
    # set: _bucket_col vs the big-int reference, shiftleft vs Java wrap
    # (shiftleft IS the engine's semantics; this pins that the oracle's
    # reference function models it correctly).
    import pyspark.sql.functions as F

    from kinesis_handler_spark.queries.pipeline import _bucket_col

    df = spark.createDataFrame([(x,) for x in EDGES], "doc_id bigint")
    rows = df.select(
        "doc_id",
        _bucket_col("doc_id").alias("b"),
        F.shiftleft(F.col("doc_id"), 3).alias("s"),
    ).collect()
    for r in rows:
        assert r.b == _ref_bucket(r.doc_id), r
        assert r.s == _ref_shl3(r.doc_id), r
