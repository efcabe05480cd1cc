"""Local replica of the driver's t2 correctness gate — TYPE-STRICT.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive multiset of values.

Round-1 lesson (VERDICT.md "What's wrong" #4): the old version here
normalized Decimal/int/float into one numeric space, so locally-green
queries failed the driver's hash, which does NOT normalize.  This
version is deliberately stricter than the driver:

* An output column typed DECIMAL, ARRAY/LIST, MAP, FLOAT32/REAL, or
  HUGEINT on EITHER side is an immediate failure ("type violation"),
  even if values match — those types are exactly what broke 14 driver
  rows in round 1.  Allowed output types: boolean, int32/int64, double,
  string, binary, date, timestamp.
* Values are compared without cross-type unification: an int never
  equals a float, a Decimal never equals anything.  Floats must match
  bit-for-bit.

If this passes, the driver's hash comparison passes.

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

# Spark simpleString type prefixes allowed in a driver-checked output.
_SPARK_OK = ("boolean", "tinyint", "smallint", "int", "bigint", "double",
             "string", "binary", "date", "timestamp")
# DuckDB type names allowed (cursor.description type ids).
_DUCK_OK = ("BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "DOUBLE",
            "VARCHAR", "BLOB", "DATE", "TIMESTAMP", "NUMBER", "STRING",
            "DATETIME", "Timestamp", "bool", "object")


def spark_type_violations(sdf) -> list[str]:
    bad = []
    for f in sdf.schema.fields:
        t = f.dataType.simpleString()
        if not t.startswith(_SPARK_OK):
            bad.append(f"{f.name}:{t}")
    return bad


def duckdb_type_violations(con, sql: str) -> list[str]:
    # DESCRIBE gives concrete DuckDB types (cursor.description loses
    # precision — everything numeric shows as NUMBER).
    bad = []
    for name, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        u = typ.upper()
        if ("DECIMAL" in u or "HUGEINT" in u or u == "FLOAT" or u == "REAL"
                or "[]" in u or "LIST" in u or "MAP" in u or "STRUCT" in u):
            bad.append(f"{name}:{typ}")
    return bad


def _normalize(v):
    """Type-strict canonical form: no cross-type numeric unification."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, Decimal):
        return f"DECIMAL!:{v}"  # never matches an int or float
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"  # bit-for-bit
    if isinstance(v, dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"t:{v.isoformat()}T00:00:00"
    if isinstance(v, (list, tuple)):
        return "ARRAY!:[" + ",".join(_normalize(x) for x in v) + "]"
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
    s_bad = spark_type_violations(sdf)
    if s_bad and q.oracle is not None:
        return False, f"TYPE violation (spark): {s_bad}"
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        return True, f"rows-only: {len(s_rows)} rows"
    d_bad = duckdb_type_violations(con, q.oracle)
    if d_bad:
        return False, f"TYPE violation (duckdb): {d_bad}"
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
    return True, f"OK: {len(s_rows)} rows hash-equal (strict)"


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
