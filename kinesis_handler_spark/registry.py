"""Declared-query registry.

Every engine operator from SURVEY.md §2.B registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) an
equivalent ANSI-SQL oracle string for the driver's DuckDB hash check.

Cross-engine determinism rules (why oracle hashes match):

* Aggregates over double columns are computed through exact DECIMAL
  arithmetic on both sides — float summation order varies with Spark
  partitioning, decimal sums do not.
* Averages are ``CAST(exact-decimal-sum AS DOUBLE) / count`` — one
  deterministic IEEE division instead of an engine-specific AVG.
* Per-row expressions stick to operations IEEE-754 defines exactly
  (+,-,*,/,sqrt) or integer/string/date ops; no transcendental functions
  in hash-checked outputs.
* Every computed column is aliased identically in the DataFrame code and
  the oracle SQL (driver compares after sorting columns by name).
* Ties in top-k / rank queries always carry a deterministic tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str


QUERIES: dict[str, DeclaredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an engine query. ``oracle=None`` marks a rows-only check
    (genuinely non-SQL-expressible operator)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = DeclaredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import kinesis_handler_spark.queries  # noqa: F401  (registration side effect)

    return {n: q.fn for n, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    import kinesis_handler_spark.queries  # noqa: F401

    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}
