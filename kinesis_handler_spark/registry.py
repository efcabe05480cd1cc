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

NULL rules (dirty data must hash-match too — enforced by the dirty-twin
parity sweep, ``tools/make_dirty_twin.py`` + ``tests/test_dirty_parity.py``):

* Every ORDER BY in a window/top-k pins ``NULLS LAST`` explicitly on
  BOTH sides: Spark defaults ascending sorts to NULLS FIRST, DuckDB to
  NULLS LAST.
* Event-time window queries filter ``ts IS NOT NULL`` explicitly on both
  sides — Spark's ``window()``/``session_window`` silently drop NULL
  timestamps, SQL date_trunc oracles don't.
* String building uses NULL-propagating ``concat``/``||``, never
  ``concat_ws`` (which skips NULL parts) in a hash-checked output.
* ``format_string`` renders NULL arguments as the literal string
  "null" — NULL-guard composite ordering keys built with it.
* DuckDB's UNPIVOT drops NULL values; write melt oracles as UNION ALL.
* Python kernels NULL-propagate explicitly (pandas ``astype`` raises on
  NaN; ``np.stack`` dies on NULL/ragged vectors — see
  ``_clean_embeddings`` and the media-builder filters).
* Finite-but-out-of-range doubles (±1e308) NULL through the bounded
  decimal casts (``functions/numeric.py dec_t``) — ANSI would raise
  NUMERIC_VALUE_OUT_OF_RANGE mid-aggregate otherwise.
* NaN/±Inf parity is deliberately OUT of scope (totality only,
  ``tests/test_null_input.py``): Spark's ANSI double→decimal cast maps
  non-finite to NULL while DuckDB errors even under TRY_CAST — the
  engines genuinely diverge, and Spark's NULL-as-undecodable is the
  robust semantics this engine keeps.
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
# Round-5 rotation (refreshed late-round after the suite grew 126->148): the
# 20 never-driver-checked queries added this round go first, then the 20
# r1-stale queries, then the 4 queries whose broadcast hints were removed this
# round (need a fresh driver verdict on the changed plans), then a ONE-TIME
# exception to rule 3: the 3 rows-only queries the driver has never executed
# (absent from all CORRECTNESS_r1-r4 artifacts) take slots so r5 records
# cold-execution evidence (spark_rows) for them, then r3-stale fillers.
_FRONT = [
    "text_token_bpe",  # added r5, never driver-checked
    "contamination_ngram_overlap",  # added r5, never driver-checked
    "text_entropy",  # added r5, never driver-checked
    "text_unigram_logloss",  # added r5, never driver-checked
    "multimodal_decode_png",  # added r5, never driver-checked
    "multimodal_resize",  # added r5, never driver-checked
    "source_partitioned_scan",  # added r5, never driver-checked
    "agg_order_priority_exists",  # added r5, never driver-checked
    "agg_value_share",  # added r5, never driver-checked
    "join_top_revenue_supplier",  # added r5, never driver-checked
    "agg_supplier_cnt",  # added r5, never driver-checked
    "agg_small_qty_revenue",  # added r5, never driver-checked
    "join_large_orders",  # added r5, never driver-checked
    "join_sole_blame_supplier",  # added r5, never driver-checked
    "join_min_price_supplier",  # added r5, never driver-checked
    "sql_correlated_subqueries",  # added r5, never driver-checked
    "events_rolling_distinct",  # added r5, never driver-checked
    "join_market_share",  # added r5, never driver-checked
    "agg_profit_by_nation_year",  # added r5, never driver-checked
    "join_dominant_supplier",  # added r5, never driver-checked
    "window_first_last",  # last driver-green r1 (stalest)
    "agg_median_mode",  # last driver-green r1 (stalest)
    "join_scalar_subquery",  # last driver-green r1 (stalest)
    "text_ngram_bigrams",  # last driver-green r1 (stalest)
    "embed_vector_stats",  # last driver-green r1 (stalest)
    "dedup_keep_latest",  # last driver-green r1 (stalest)
    "dedup_embedding_cosine",  # last driver-green r1 (stalest)
    "scan_filter_project",  # last driver-green r1 (stalest)
    "filter_pushdown_dates",  # last driver-green r1 (stalest)
    "agg_count_distinct",  # last driver-green r1 (stalest)
    "agg_count_distinct_salted",  # last driver-green r1 (stalest)
    "join_left_outer",  # last driver-green r1 (stalest)
    "join_full_outer",  # last driver-green r1 (stalest)
    "join_semi",  # last driver-green r1 (stalest)
    "join_anti",  # last driver-green r1 (stalest)
    "join_range_theta",  # last driver-green r1 (stalest)
    "json_extract_props",  # last driver-green r1 (stalest)
    "validate_predicate",  # last driver-green r1 (stalest)
    "scalar_date",  # last driver-green r1 (stalest)
    # scalar_math (r1-stale, locally green at 3 SFs) yields its slot to the
    # latest never-checked query; it rotates back in r6.
    "join_bucketed_colocated",  # added latest r5, never driver-checked
    "join_multi_star",  # broadcast hint removed this round - re-verify
    "agg_promo_share",  # broadcast hint removed this round - re-verify
    "filter_disjunctive",  # broadcast hint removed this round - re-verify
    "join_nation_volume",  # broadcast hint removed this round - re-verify
    "agg_approx_percentile",  # rows-only, never driver-run - one-time cold-exec evidence
    "dedup_embedding_ann",  # rows-only, never driver-run - one-time cold-exec evidence
    "dedup_pipeline_scale",  # rows-only, never driver-run - one-time cold-exec evidence
    "events_gapfill_interpolate",  # added late r5, never driver-checked
    "window_frame_exclude",  # added late r5, never driver-checked
    "text_heavy_hitters",  # added late r5, never driver-checked
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
