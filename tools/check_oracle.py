"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive multiset of normalized values.  Stricter than any
reasonable hash: values must match exactly (floats bit-for-bit, decimals
numerically with scale normalized), so if this passes, the driver's
hash comparison passes.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from decimal import Decimal

import duckdb

from kinesis_handler_spark.registry import QUERIES, all_oracles, all_queries
from kinesis_handler_spark.tables import TABLES


def _normalize(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"n:{v}"
    if isinstance(v, Decimal):
        # scale-insensitive numeric normalization (1.10 == 1.1)
        return f"n:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 1e15:
            return f"n:{int(v)}"  # unify 5.0 (float) with 5 (int/decimal)
        return f"f:{v!r}"
    if isinstance(v, dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"t:{v.isoformat()}T00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_normalize(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def _rows_to_multiset(rows, col_order):
    return sorted(
        "|".join(_normalize(row[i]) for i in col_order) for row in rows
    )


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def check_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        return True, f"rows-only: {len(s_rows)} rows"
    cur = con.execute(q.oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={s_cols} duckdb={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    s_ms = _rows_to_multiset(s_rows, s_order)
    d_ms = _rows_to_multiset(d_rows, d_order)
    if s_ms != d_ms:
        diff = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:3]
        return False, f"value mismatch ({len(s_ms)} rows), first diffs: {diff}"
    return True, f"OK: {len(s_rows)} rows hash-equal"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(all_queries())
    all_oracles()  # force registration
    from kinesis_handler_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb_conn(sf_dir)
    failures = 0
    for name in names:
        try:
            ok, msg = check_query(spark, con, name, sf_dir)
        except Exception as exc:  # noqa: BLE001 - report and continue
            ok, msg = False, f"EXCEPTION: {type(exc).__name__}: {exc}"
        print(f"{'PASS' if ok else 'FAIL'}  {name:28s} {msg}"[:300], flush=True)
        failures += not ok
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
