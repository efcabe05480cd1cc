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
# Round-10 rotation (VERDICT.md r9 "Next round" item 1):
# CORRECTNESS_r09 came back 50/50 clean, so the whole r9 front yielded
# its slots.  Output of ``tools/rotate_tiers.py --write`` with TWO
# manual substitutions mandated by the changed-since-checked guard
# (r9 ask #8, tests/test_registry_front.py): ``web_url_dedup`` (green
# r9 but REWRITTEN this round — www-fold fix + collision-real seeding)
# and ``join_bloom_prefilter`` (green r9 but its ``bloom_might_contain``
# helper was rewritten — helper changes are outside the fingerprint's
# scope and are fronted by hand per the source_fingerprint docstring)
# replace the freshest r7 fills, as does the late-round addition
# text_length_percentile_filter and web_html_extract (never green —
# rule 1).  Shape: the never-green queries first, then the ENTIRE remaining r6 tier (34 —
# includes the r9-rewritten join_asof_nearest, and join_interval_overlap
# rides in the r7 tier), then stalest r7.  After this round no
# oracle-backed query has pre-r7 evidence.  dedup_incremental_minhash,
# text_quality_classifier, and dedup_keep_best_quality are rows-only
# (golden-pinned) and take no slot.
_FRONT = [
    # CHANGED r13 (changed-since-checked guard outranks evidence
    # staleness): both span queries share the new hash-prefiltered
    # _span_first_pos front half, and the triangle corner credit is
    # one explode pass — all three hash-equal at sf0.01/sf0.1 locally,
    # interleaved calibrated CPU A/Bs in OPTIMIZATION_r13.md.  They
    # displace the three stalest r9-green tail fills past slot 50.
    "dedup_span_exact",
    "dedup_span_trim",
    "graph_triangle_count",
    "udaf_grouped_pandas",  # CHANGED r13: bucketed grouped-pandas kernel
    "agg_min_max_by",  # last green r8
    "agg_bool_conditional",  # last green r8
    "window_time_slide",  # last green r8
    "window_range_interval",  # last green r8
    "events_funnel",  # last green r8
    "events_retention",  # last green r8
    "window_rank_topn",  # last green r8
    "topk_per_group",  # last green r8
    "text_lm_bigram_logloss",  # last green r9
    "text_pii_audit",  # last green r9
    "text_stats",  # last green r9
    "text_normalize",  # last green r9
    "dedup_components",  # last green r9
    "dedup_containment",  # last green r9
    "window_first_last",  # last green r9
    "dedup_keep_latest",  # last green r9
    "window_time_bucket",  # last green r9
    "events_transition",  # last green r9
    "text_line_dedup",  # last green r9
    "scan_filter_project",  # last green r9
    "filter_pushdown_dates",  # last green r9
    "project_compute",  # last green r9
    "agg_global",  # last green r9
    "agg_groupby_pricing",  # last green r9
    "agg_count_distinct",  # last green r9
    "agg_count_distinct_salted",  # last green r9
    "agg_rollup",  # last green r9
    "join_left_outer",  # last green r9
    "join_full_outer",  # last green r9
    "join_semi",  # last green r9
    "join_anti",  # last green r9
    "join_range_theta",  # last green r9
    "validate_predicate",  # last green r9
    "layout_zorder",  # last green r9
    "sketch_count_min",  # last green r9
    "source_partitioned_scan",  # last green r9
    "agg_order_priority_exists",  # last green r9
    "agg_value_share",  # last green r9
    "join_top_revenue_supplier",  # last green r9
    "agg_supplier_cnt",  # last green r9
    "join_large_orders",  # last green r9
    "join_sole_blame_supplier",  # last green r9
    "join_min_price_supplier",  # last green r9
    "sql_correlated_subqueries",  # last green r9
    "events_rolling_distinct",  # last green r9
    "window_frame_exclude",  # last green r9
    "join_dominant_supplier",  # last green r9
    "split_train_holdout",  # last green r9
    "sql_recursive_cte",  # last green r10
    "agg_time_weighted_avg",  # last green r10
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


def source_fingerprint(name: str) -> str:
    """sha256 over the query function's source text plus its oracle SQL —
    the identity the changed-since-checked front guard tracks
    (tests/front_source_hashes.json).  A query whose fingerprint moved
    after its last driver hash-check has UNVERIFIED current behavior no
    matter how green its history looks (the r9 skew rewrites exposed
    this: ``join_asof_nearest`` was rewritten two rounds after its last
    check and kept its stale green until manual adjudication).  Scope is
    deliberately the ask's: the registered function body + oracle.  A
    change hidden in a shared helper is NOT caught — when editing a
    helper, add its callers to ``_FRONT`` by hand (r10 precedent:
    ``bloom_might_contain`` → ``join_bloom_prefilter``)."""
    import hashlib
    import inspect

    q = QUERIES[name]
    text = inspect.getsource(q.fn) + "\n---oracle---\n" + (q.oracle or "")
    return hashlib.sha256(text.encode()).hexdigest()


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
