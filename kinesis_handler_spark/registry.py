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
# Round-6 rotation (VERDICT.md r5 "Next round" item 1): head slots go to the
# 5 queries no driver round ever checked — the 3 never-green oracle-backed
# (source_text_scan, scd2_intervals, window_groups_frame) plus, as the same
# ONE-TIME exception to rule 3 used in r5, the 2 rows-only queries absent
# from every CORRECTNESS_r1-r5 artifact (events_rolling_distinct_hll,
# sim_ann_ivf_search — cold-execution evidence only) — then scalar_math
# (yielded its r5 slot) and the r3-stale remainder.  With these 6 green,
# driver evidence covers 155/155 declared queries.
# Late-round re-rotation: the tail 10 slots go to queries whose semantics
# or plans CHANGED in round 6 (NULLS LAST pins, as-of ordering, the 2^53
# floor-quantization, heavy-hitters checkpoint, bucketed-table sidecar) —
# changed > r3-stale, the r5 precedent; the displaced r3-stale fillers
# rotate back in r7.  (agg_histogram / window_session_batch also changed
# but only on inputs absent from clean driver fixtures — extreme prices /
# duplicate timestamps — so they wait for r7 with the stale tier.)
_FRONT = [
    "source_text_scan",  # NEVER GREEN
    "scd2_intervals",  # NEVER GREEN
    "window_groups_frame",  # NEVER GREEN
    "events_rolling_distinct_hll",  # rows-only, never driver-run - one-time cold-exec evidence
    "sim_ann_ivf_search",  # rows-only, never driver-run - one-time cold-exec evidence
    "scalar_math",  # last green r1
    "text_stats",  # last green r3
    "text_normalize",  # last green r3
    "dedup_components",  # last green r3
    "window_time_bucket",  # last green r3
    "project_compute",  # last green r3
    "agg_global",  # last green r3
    "agg_groupby_pricing",  # last green r3
    "agg_rollup",  # last green r3
    "agg_cube",  # last green r3
    "agg_grouping_sets",  # last green r3
    "agg_filtered_pivot",  # last green r3
    "join_inner_equi",  # last green r3
    "join_broadcast_dims",  # last green r3
    "join_exists_correlated",  # last green r3
    "agg_distinct_multi",  # last green r3
    "join_null_safe",  # last green r3
    "profile_table",  # last green r3
    "route_case_tag",  # last green r3
    "scalar_string",  # last green r3
    "scalar_array",  # last green r3
    "scalar_array_explode",  # last green r3
    "scalar_map_json",  # last green r3
    "scalar_conditional_null",  # last green r3
    "scalar_struct",  # last green r3
    "scalar_hash",  # last green r3
    "scalar_bitwise",  # last green r3
    "sort_multi_key",  # last green r3
    "limit_topk",  # last green r3
    "set_union_all",  # last green r3
    "set_intersect",  # last green r3
    "set_except",  # last green r3
    "dedup_exact",  # last green r3
    "set_intersect_all",  # last green r3
    "source_csv_scan",  # last green r3
    "events_gapfill_interpolate",  # semantics/plan changed r6 - re-verify
    "events_transition",  # semantics/plan changed r6 - re-verify
    "window_first_last",  # semantics/plan changed r6 - re-verify
    "window_lag_lead",  # semantics/plan changed r6 - re-verify
    "window_running_frame",  # semantics/plan changed r6 - re-verify
    "join_asof_nearest",  # semantics/plan changed r6 - re-verify
    "join_asof_latest",  # semantics/plan changed r6 - re-verify
    "agg_weighted_avg",  # semantics/plan changed r6 - re-verify
    "text_heavy_hitters",  # semantics/plan changed r6 - re-verify
    "join_bucketed_colocated",  # semantics/plan changed r6 - re-verify
    # 10 r3-stale fillers yielded slots to the r6 changed queries; they
    # rotate back in r7: agg_histogram, agg_percentiles,
    # agg_stats_moments, agg_string_concat, reshape_unpivot,
    # source_json_scan, window_ntile_percent, window_rank_topn,
    # window_session_batch, window_time_slide
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
