"""Driver contract for the spark-graft builder (PySpark target).

Thin glue over :mod:`kinesis_handler_spark`: every operator from
SURVEY.md §2.B registers a ``(spark, sf_dir) -> DataFrame`` callable and
(when SQL-expressible) a DuckDB oracle in
``kinesis_handler_spark/registry.py``; this module just exposes the
registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from kinesis_handler_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return all_queries()["agg_groupby_pricing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; non-SQL-expressible ops
    (engine-specific sketches/signatures) are omitted => rows-only."""
    return all_oracles()
