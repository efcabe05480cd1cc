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
* FINAL output columns are restricted to boolean/int/bigint/double/
  string/binary/date/timestamp.  Never surface DECIMAL (engines
  disagree on representation), ARRAY/MAP (unhashable by the driver's
  canonicalizer), FLOAT32 (widening differs), or let a DuckDB
  ``SUM(bigint)`` escape as HUGEINT — wrap in ``CAST(... AS BIGINT)``.
  Decimal arithmetic stays INTERNAL; convert once at the end, and
  quantize scale-12 product sums to ``DECIMAL(38,6)`` before the double
  cast so both engines round identically (see functions/numeric.py).
* A decimal whose INTEGER REPRESENTATION (value × 10^scale) can exceed
  2^53 must be FLOOR-quantized to ``DECIMAL(38,0)`` before the double
  cast: past 2^53 Spark casts the exact BigDecimal but DuckDB converts
  int128 then divides by 10^scale (two roundings), and decimal
  DOWNSCALE itself truncates in DuckDB while Spark rounds half-up.
  FLOOR + integer→double is single-rounded everywhere (see
  ``agg_corr_regression``).
  ``tools/check_oracle.py`` enforces all of this type-strictly.
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


# The external driver hash-checks only the FIRST 50 queries() entries per
# round; with >50 oracle-backed queries, full verification rotates across
# rounds.  _FRONT is REGENERATED each round by
# ``PYTHONPATH=. python tools/rotate_tiers.py --write`` from the verdict
# history across all CORRECTNESS_r*.json:
#   1. oracle-backed queries with NO green verdict in any round (new or
#      previously broken) — these need a verdict most;
#   2. oracle-backed queries by last-green round ascending (stalest first);
#   3. rows-only queries never occupy a verdict slot (no hash check).
# Everything past _FRONT follows in registration order via _driver_order.
# Round-4 rotation (post-r3 history + this round's additions):
_FRONT = [
    "window_range_interval",  # NEVER GREEN
    "join_asof_nearest",  # NEVER GREEN
    "window_lag_lead",  # NEVER GREEN
    "embed_quantize",  # NEVER GREEN
    "join_agg_topk",  # NEVER GREEN
    "events_funnel",  # NEVER GREEN
    "events_retention",  # NEVER GREEN
    "multimodal_header_parse",  # NEVER GREEN
    "agg_weighted_avg",  # NEVER GREEN
    "set_except_all",  # NEVER GREEN
    "agg_min_max_by",  # NEVER GREEN
    "agg_bool_conditional",  # NEVER GREEN
    "text_chunk_overlap",  # NEVER GREEN
    "text_repetition_ratio",  # NEVER GREEN
    "sample_hash_stratified",  # NEVER GREEN
    "events_transition",  # NEVER GREEN
    "events_anomaly_zscore",  # NEVER GREEN
    "agg_corr_regression",  # NEVER GREEN
    "pipeline_corpus_prep",  # NEVER GREEN
    "join_multi_star",  # NEVER GREEN
    "agg_having_join_back",  # NEVER GREEN
    "sql_scan_agg_q6",  # NEVER GREEN
    "scalar_regex_redact",  # NEVER GREEN
    "source_orc_scan",  # NEVER GREEN
    "source_range_spine",  # NEVER GREEN
    "multimodal_features",  # NEVER GREEN
    "join_returns_by_customer",  # NEVER GREEN
    "agg_promo_share",  # NEVER GREEN
    "agg_late_shipment_priority",  # NEVER GREEN
    "events_daily_ma",  # NEVER GREEN
    "sample_uniform_per_stratum",  # NEVER GREEN
    "embed_random_projection",  # NEVER GREEN
    "sql_window_topn",  # NEVER GREEN
    "multimodal_decode_bmp",  # NEVER GREEN
    "multimodal_decode_wav",  # NEVER GREEN
    "audit_referential_integrity",  # NEVER GREEN
    "fuzzy_match_blocked",  # NEVER GREEN
    "agg_custdist",  # NEVER GREEN
    "filter_disjunctive",  # NEVER GREEN
    "join_nation_volume",  # NEVER GREEN
    "join_inactive_rich_customers",  # NEVER GREEN
    "text_tfidf_topterms",  # last green r1
    "text_quality_score",  # last green r1
    "text_lang_profile",  # last green r1
    "dedup_near_jaccard",  # last green r1
    "sim_cosine_topk",  # last green r1
    "multimodal_binary_meta",  # last green r1
    "udf_transformer",  # last green r1
    "udaf_grouped_pandas",  # last green r1
    "sessionize_gap",  # last green r1
]


def _driver_order() -> list[str]:
    names = list(QUERIES)
    front = [n for n in _FRONT if n in names]
    rest_oracle = [
        n for n in names
        if n not in front and QUERIES[n].oracle is not None
    ]
    rest_rows_only = [
        n for n in names if n not in front and QUERIES[n].oracle is None
    ]
    return front + rest_oracle + rest_rows_only


def all_queries() -> dict[str, QueryFn]:
    import kinesis_handler_spark.queries  # noqa: F401  (registration side effect)

    return {n: QUERIES[n].fn for n in _driver_order()}


def all_oracles() -> dict[str, str]:
    import kinesis_handler_spark.queries  # noqa: F401

    return {
        n: QUERIES[n].oracle
        for n in _driver_order()
        if QUERIES[n].oracle is not None
    }
