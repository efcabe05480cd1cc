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
# rounds.  _FRONT is regenerated each round from tools/rotate_tiers.py
# (verdict history across all CORRECTNESS_r*.json):
#   1. oracle-backed queries with NO green verdict in any round — the 6
#      formerly NTZ-broken queries (fixed in tables.py this round) plus the
#      22 that never received a driver slot;
#   2. oracle-backed queries by last-green round ascending (stalest first);
#   3. everything else (recently-green, then rows-only) in registration
#      order via _driver_order.
# Round-4 rotation (rotate_tiers.py output, post-r3 history):
_FRONT = [
    # never green (25): 6 NTZ-fixed + 19 never-slotted
    "window_range_interval", "join_asof_nearest", "window_lag_lead",
    "embed_quantize", "join_agg_topk", "events_funnel", "events_retention",
    "multimodal_header_parse", "agg_weighted_avg", "set_except_all",
    "agg_min_max_by", "agg_bool_conditional", "text_chunk_overlap",
    "text_repetition_ratio", "sample_hash_stratified", "events_transition",
    "events_anomaly_zscore", "agg_corr_regression", "pipeline_corpus_prep",
    "join_multi_star", "agg_having_join_back", "sql_scan_agg_q6",
    "scalar_regex_redact", "source_orc_scan", "source_range_spine",
    # newly oracle-backed this round (was rows-only; never driver-checked)
    "multimodal_features",
    # new this round (never had any verdict)
    "join_returns_by_customer", "agg_promo_share",
    "agg_late_shipment_priority", "events_daily_ma",
    "sample_uniform_per_stratum", "embed_random_projection",
    # stalest green (last green r1; 29 — first 19 make the 50-cap)
    "text_tfidf_topterms", "text_quality_score", "text_lang_profile",
    "dedup_near_jaccard", "sim_cosine_topk", "multimodal_binary_meta",
    "udf_transformer", "udaf_grouped_pandas", "sessionize_gap",
    "window_first_last", "agg_median_mode", "join_scalar_subquery",
    "text_ngram_bigrams", "embed_vector_stats", "dedup_keep_latest",
    "dedup_embedding_cosine", "scan_filter_project", "filter_pushdown_dates",
    "agg_count_distinct", "agg_count_distinct_salted", "join_left_outer",
    "join_full_outer", "join_semi", "join_anti", "join_range_theta",
    "json_extract_props", "validate_predicate", "scalar_date", "scalar_math",
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
