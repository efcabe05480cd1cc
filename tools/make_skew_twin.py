"""Build a HOT-KEY skew twin for bench + parity (VERDICT r8 item 2).

SCALE.md claims the engine's join/agg family survives skewed key
distributions via AQE skew-join splitting and the explicit salting
paths (``functions/skew.py::salted_join``, ``agg_count_distinct_salted``).
This tool manufactures the adversarial input that claim is about: the
same tables, same row counts, same schemas and physical parquet types
(written by DuckDB, like ``make_dirty_twin.py``), but with ~30% of the
fact-side foreign keys collapsed onto ONE hot entity:

* ``orders.o_custkey``   → the MIN real custkey on ~30% of orders
  (one customer owns ~30% of all orders — the customer⋈orders and
  groupBy(custkey) hot partition);
* ``lineitem.l_suppkey`` → the MIN real suppkey on ~30% of lineitems
  (supplier⋈lineitem skew);
* ``lineitem.l_partkey`` → the MIN real partkey on the same rows
  (part⋈lineitem skew);
* ``events.user_id``     → the MIN real user on ~30% of events (every
  per-user window/sessionize partition gets a 30%-of-corpus key).

Selection is DETERMINISTIC (``pmod(row_key, 10) < 3``), so two builds
of the twin are identical and Spark-vs-DuckDB parity sweeps can hash
against it.  NULL keys stay NULL (the dirty-data contract is a
different axis); dimension tables and documents/embeddings are copied
verbatim.

Usage:
  PYTHONPATH=. python tools/make_skew_twin.py [src_sf_dir] [out_dir]
Defaults: src=/root/testdata/sf0.1, out=.fixture_cache/sf0.1_skew
(the bench twin; pass sf0.01 + sf0.01_skew for the parity twin).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kinesis_handler_spark.tables import TABLES  # noqa: E402

#: fraction numerator out of 10: pmod(key, 10) < 3  →  ~30% of rows
HOT_MOD, HOT_LT = 10, 3


def _hot(sel_key: str, col: str, hot_scalar: str) -> str:
    """REPLACE expression: remap ``col`` to the hot scalar on the
    deterministic ~30% slice, preserving NULLs and the other 70%."""
    pm = f"((({sel_key}) % {HOT_MOD}) + {HOT_MOD}) % {HOT_MOD}"
    return (
        f"CASE WHEN {sel_key} IS NOT NULL AND {col} IS NOT NULL "
        f"AND {pm} < {HOT_LT} THEN ({hot_scalar}) ELSE {col} END AS {col}"
    )


def build(src: str, out: str) -> None:
    # Same immutability discipline as make_dirty_twin.build: derived
    # fixture caches are keyed by the dir basename and assume sources
    # never change in place — wipe before rebuild.
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    hot_cust = f"SELECT MIN(c_custkey) FROM '{src}/customer.parquet'"
    hot_supp = f"SELECT MIN(s_suppkey) FROM '{src}/supplier.parquet'"
    hot_part = f"SELECT MIN(p_partkey) FROM '{src}/part.parquet'"
    hot_user = (
        f"SELECT MIN(user_id) FROM '{src}/events.parquet' "
        f"WHERE user_id IS NOT NULL"
    )
    replaces = {
        "orders": [_hot("o_orderkey", "o_custkey", hot_cust)],
        "lineitem": [
            _hot("l_orderkey", "l_suppkey", hot_supp),
            _hot("l_orderkey", "l_partkey", hot_part),
        ],
        "events": [_hot("event_id", "user_id", hot_user)],
    }
    for t in TABLES:
        path = f"{src}/{t}.parquet"
        if t in replaces:
            body = (
                f"SELECT * REPLACE ({', '.join(replaces[t])}) "
                f"FROM '{path}'"
            )
        else:
            body = f"SELECT * FROM '{path}'"
        con.execute(
            f"COPY ({body}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    # visibility: report the achieved hot share per skewed axis
    for t, key, col in (
        ("orders", "o_orderkey", "o_custkey"),
        ("lineitem", "l_orderkey", "l_suppkey"),
        ("events", "event_id", "user_id"),
    ):
        top, share = con.execute(
            f"SELECT {col}, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM "
            f"'{out}/{t}.parquet') FROM '{out}/{t}.parquet' "
            f"WHERE {col} IS NOT NULL GROUP BY 1 ORDER BY 2 DESC LIMIT 1"
        ).fetchone()
        print(f"{t}.{col}: hottest key {top} owns {share:.1%} of rows")
    print(f"skew twin written to {out}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(_REPO, ".fixture_cache", "sf0.1_skew")
    )
    build(src, out)
