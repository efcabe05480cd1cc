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
* Multi-pass window oracles (gaps-and-islands: LAG pass feeding a
  running-SUM pass) anchor EVERY pass on ONE total order: the first
  pass emits ``ROW_NUMBER() OVER (same window)`` and later passes
  ``ORDER BY rn``.  Ordering each pass independently by the semantic
  key — even with tie-breaks — is NOT total under full-row duplicates,
  and DuckDB's parallel window may permute the tied rows between
  passes (~5% flake, r6 verdict headline).  Spark computes co-windowed
  functions in one sort and needs no anchor.  Pinned by the 10×
  repeat-run gate in tests/test_dirty_parity.py.
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
  FLOOR + integer→double is single-rounded everywhere
  (``functions/numeric.floor_sum``).  WHICH sums can cross 2^53: any
  sum into a group of BOUNDED cardinality (global / per-year /
  per-nation / per-flag) grows linearly with corpus size and MUST
  floor-quantize — the round-6 sf1.0 magnitude audit found three such
  sums already past the bound and six within 100× of it, all now
  floored.  Per-entity sums (per-customer / per-order / per-part) stay
  bounded because the entity COUNT grows instead, and keep the
  fractional ``DECIMAL(38,6)`` quantization.
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

Extreme-value rules (r7 ``times``/``keys`` twins — the full BIGINT,
timestamp, and calendar ranges are legal input):

* Key arithmetic never multiplies a raw key: pre-reduce pmod-style
  first (``(pmod(key, m) * k) % m``, multiply split so intermediates
  stay < 2^49) — BOTH engines raise on int64 overflow under ANSI, so
  ``key * 2654435761`` is a job-killer, not a hash.  Bit-identical to
  the naive form on sub-2^32 non-negative ids.
* Spark ``shiftleft`` wraps two's-complement; DuckDB ``<<`` raises on
  overflow — oracles reproduce the wrap via a HUGEINT intermediate.
* Nullable int64 columns NEVER cross a pandas-UDF boundary as ints:
  Arrow→pandas turns them into float64, silently corrupting ids above
  2^53 (chaos-twin find).  Render to string JVM-side or pre-filter
  null-free (the media builders' ``isNotNull``).
* tz-aware TIMESTAMP outputs cannot represent instants within a day of
  0001-01-01 through the Python bridge (CPython DST fold-probe) — emit
  TIMESTAMP_NTZ for derived instants; date arithmetic that can cross
  9999-12-31 NULLs on overflow (unrepresentable→NULL rule).
* Window frames never end at UNBOUNDED FOLLOWING unless they start at
  UNBOUNDED PRECEDING (Spark evaluates shrinking suffix frames
  O(n^2) per partition — plan-gated in ``tests/test_plan_quality.py``).
* JSON field extraction is ``try_cast``-total and parser-honest (the
  ``json`` twin): a JSON number can exceed int64, be a float, or be
  1e400, and an ANSI CAST of the extracted token raises on all of
  them; oracles use DuckDB's real JSON functions (``json_type`` /
  ``json_extract_string`` / ``json_keys``), never regex-scraping,
  which an embedded '"k": 123' inside a STRING value fools.
  Empty-array/map indexing uses ``F.get``/``try_element_at`` (ANSI
  ``[0]`` raises).  Out of parity scope, documented: malformed JSON
  (streaming dead-letter contract) and duplicate-key objects
  (RFC 8259 interop-undefined; Spark first-wins, DuckDB last-wins).
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
# Round-7 rotation (VERDICT.md r6 "Next round" item 2): head slots go to
# the 9 queries whose VALUES changed in the round-6 2^53 floor-
# quantization but whose green driver rows predate the change (judge
# re-verified all 9 locally; driver-side evidence still needed), then
# dedup_simhash (rows-only, plan re-banded r6 — same one-time exception
# to rule 3 as r5/r6, per the verdict's explicit ask for fresh rows
# evidence), then the 3 gaps-and-islands queries whose ORACLE SQL was
# rewritten this round (rn-anchored total order, duplicate-row-proof —
# the driver runs our oracle, so the new SQL deserves a driver pass).
# Remaining 37 slots: the 10 r3-stale fillers displaced in r6, then the
# r4-stale tier in rotate_tiers order.  Rotated OUT (fresh r6 evidence
# in CORRECTNESS_r06.json): the 5 never-checked head entries and the 10
# r6-changed tail entries.
_FRONT = [
    # rule 1 (never-checked first): the six round-7 operators
    # (queries/training.py assembly ops, embed_pca, tokenizer_bpe_train)
    # have no driver evidence in any round — they outrank every
    # stale-green tier.  embed_pca and tokenizer_bpe_train are rows-only
    # (iterative eigen/merge algorithms, no SQL oracle exists) and take
    # the same one-time never-checked exception dedup_simhash uses.
    "pack_context_windows",  # new r7 - never driver-checked
    "corpus_mixture_weights",  # new r7 - never driver-checked
    "dedup_span_exact",  # new r7 - never driver-checked
    "pack_greedy_bins",  # new r7 - never driver-checked
    "embed_pca",  # new r7, rows-only - never driver-checked
    "tokenizer_bpe_train",  # new r7, rows-only - never driver-checked
    "graph_pagerank",  # new r7 - never driver-checked
    "corpus_inverted_index",  # new r7 - never driver-checked
    "graph_triangle_count",  # new r7 - never driver-checked
    "events_cdc_apply",  # new r7 - never driver-checked
    "dedup_span_trim",  # new r7 - never driver-checked
    "sql_recursive_cte",  # new r7 wave 2 - never driver-checked
    "agg_time_weighted_avg",  # new r7 wave 2 - never driver-checked
    "join_interval_overlap",  # new r7 wave 2 - never driver-checked
    "window_skyline_pareto",  # new r7 wave 2 - never driver-checked
    "corpus_domain_token_budget",  # new r7 wave 2 - never driver-checked
    "agg_rfm_segmentation",  # new r7 wave 3 - never driver-checked
    "agg_abc_classification",  # new r7 wave 3 - never driver-checked
    "agg_benford_first_digit",  # new r7 wave 3 - never driver-checked
    "window_ewma_dyadic",  # new r7 wave 3 - never driver-checked
    "text_concordance",  # new r7 wave 3 - never driver-checked
    "source_xml_scan",  # new r7 wave 3 (Spark 4 native XML) - never driver-checked
    "pipeline_filter_funnel",  # new r7 wave 3 - never driver-checked
    "agg_promo_share",  # value changed r6 (2^53 floor) - driver evidence stale
    "filter_disjunctive",  # value changed r6 (2^53 floor) - driver evidence stale
    "join_nation_volume",  # value changed r6 (2^53 floor) - driver evidence stale
    "join_multi_star",  # value changed r6 (2^53 floor) - driver evidence stale
    "sql_scan_agg_q6",  # value changed r6 (2^53 floor) - driver evidence stale
    "join_market_share",  # value changed r6 (2^53 floor) - driver evidence stale
    "agg_profit_by_nation_year",  # value changed r6 (2^53 floor) - driver evidence stale
    "agg_small_qty_revenue",  # value changed r6 (2^53 floor) - driver evidence stale
    "agg_corr_regression",  # value changed r6 (2^53 floor) - driver evidence stale
    "dedup_simhash",  # rows-only; plan re-banded r6 - one-time fresh-rows evidence
    "scd2_intervals",  # oracle rewritten r7 (rn total order) - re-verify
    "sessionize_gap",  # oracle rewritten r7 (rn total order) - re-verify
    "window_session_batch",  # oracle rewritten r7 (rn total order) - re-verify
    "source_json_scan",  # last green r3
    "agg_stats_moments",  # last green r3
    "agg_percentiles",  # last green r3
    "agg_string_concat",  # last green r3
    "window_ntile_percent",  # last green r3
    # (reshape_unpivot / agg_histogram / window_time_slide /
    # window_rank_topn / topk_per_group — r3-green, UNCHANGED — yielded
    # their staleness-refresh slots to the five wave-3 r7 queries
    # above (never-checked outranks stale-but-green); rotate back r8.)
    # (join_returns_by_customer — r4-green, UNCHANGED — yielded its
    # staleness-refresh slot to pipeline_filter_funnel; rotate back r8.)
    "agg_late_shipment_priority",  # last green r4
    "events_daily_ma",  # last green r4
    "sample_uniform_per_stratum",  # last green r4
    "audit_referential_integrity",  # last green r4
    # (fuzzy_match_blocked — r4-green, UNCHANGED — yielded its
    # staleness-refresh slot to source_xml_scan; rotate back r8.)
    # (dedup_near_jaccard / sim_cosine_topk — r4-green, UNCHANGED —
    # yielded their slots to events_cdc_apply / dedup_span_trim;
    # rotate back in r8.)
    # (agg_custdist / join_inactive_rich_customers / text_tfidf_topterms
    # / text_quality_score / text_lang_profile — r4-green, UNCHANGED —
    # yielded their staleness-refresh slots to the five wave-2 r7
    # queries above, which have NO driver evidence yet and outrank any
    # stale-but-green tier; rotate back in r8.)
    # (multimodal_binary_meta / udf_transformer / multimodal_features —
    # r4-green, UNCHANGED — yielded their staleness-refresh slots to the
    # three late-r7 queries above; they rotate back in r8.)
    "scalar_bitwise",  # r7: HUGEINT wrap oracle - fresh oracle evidence
    "scalar_map_json",  # r7: typed-map contract - k_value now BIGINT
    "events_gapfill_interpolate",  # r7: O(n) running-frame rewrite - fresh plan evidence
    "scalar_date",  # r7: due_date NULL-on-overflow + NTZ month start - outputs re-typed
    "json_extract_props",  # r7: try_cast total contract - k now BIGINT
    "multimodal_header_parse",  # last green r4
    "multimodal_decode_bmp",  # last green r4
    "multimodal_decode_wav",  # last green r4
    "sample_hash_stratified",  # last green r4
    "events_anomaly_zscore",  # last green r4
    "pipeline_corpus_prep",  # last green r4
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
