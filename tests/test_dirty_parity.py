"""Cross-engine parity ON DIRTY DATA — the regression gate for the
hostile-input alignment program.

`tools/make_dirty_twin.py` builds DuckDB-written twin corpora that
preserve physical parquet types, so `tools/check_oracle.py` (the
type-strict driver-gate replica) can hash-compare Spark vs DuckDB on
them.  The sweeps found, and the fixes aligned, five drift families:

* NULL semantics (20 queries): NULL ordering in rankings, NULL-ts
  window membership, concat_ws-vs-``||``, format_string rendering NULL
  as the string "null", UNPIVOT dropping NULL values, a pandas kernel
  raising on NULL inputs;
* duplicate keys (3): oracles keying on a then-non-unique vec_id;
* empty corpus (3): Spark's rollup/cube omitting the SQL-standard
  grand-total row, format_string of NULL aggregates;
* ragged vectors (2): divergent empty/NULL-element array folds, ANSI
  element_at raising where DuckDB indexing yields NULL;
* unicode text (2): Java lower('İ') emits i+combining-dot, DuckDB
  plain i — normalize_text strips \\p{M} identically on both engines.

Gating strategy: each axis re-checks its once-drifted queries on its
own twin every run (cheap, isolates the axis on failure), and ONE
``slow`` sweep runs all 155 queries against the ``chaos`` twin — the
union of every hostile shape, so any drift on any axis also drifts
there.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _twin(name: str, mode: str) -> str:
    out = os.path.join(_REPO, ".fixture_cache", name)
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.make_dirty_twin import build

        build("/root/testdata/sf0.001", out, mode)
    return out


def _sweep(twin: str, queries: list[str]) -> None:
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_oracle.py"),
         twin, *queries],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
        cwd=_REPO,
        timeout=1800,
    )
    last = [ln for ln in out.stdout.splitlines() if "queries pass" in ln]
    m = re.search(r"(\d+)/(\d+) queries pass", last[-1]) if last else None
    ok = m and m.group(1) == m.group(2) and (
        not queries or int(m.group(2)) == len(queries)
    )
    assert ok, (
        "dirty-parity drift:\n"
        + "\n".join(ln for ln in out.stdout.splitlines() if ln.startswith("FAIL"))
    )


ONCE_DRIFTED = {
    "nulls": ("sf_dirty", [
        "window_rank_topn", "topk_per_group", "sql_window_topn",
        "window_ntile_percent", "limit_topk", "dedup_exact",
        "sample_uniform_per_stratum", "sessionize_gap", "agg_string_concat",
        "reshape_unpivot", "agg_min_max_by", "scalar_string", "scalar_hash",
        "scalar_map_json", "udf_transformer", "window_frame_exclude",
        "window_time_slide", "window_session_batch", "window_time_bucket",
        "multimodal_resize",
        # r6: drifted once the twin gained MIXED-null events rows (live
        # user_id + NULL ts / duplicate ts) — unpinned window ORDER BY,
        # plus the session oracle's missing tie-break (ADVICE r5 class).
        "scd2_intervals", "window_groups_frame", "events_transition",
        "window_first_last", "window_lag_lead", "window_running_frame",
        # r6 second wave: mixed-null rows extended to orders/lineitem/
        # customer — NULL o_orderdate under a live o_custkey made the
        # as-of distance NULL, and Spark's NULLS-FIRST default crowned
        # the unknown-distance order "nearest".
        "join_asof_nearest", "join_asof_latest",
        # r11: the twin gained LIVE-TEXT NULL-lang document rows — a
        # NULL-lang doc trained a NULL language profile whose argmax
        # tie-break diverged (Spark NULLS FIRST vs DuckDB NULLS LAST);
        # profiles now exclude NULL lang on both engines, and the
        # two-level percentile rank joins null-safe on lang.
        "text_lang_profile", "text_length_percentile_filter",
    ]),
    "dups": ("sf_dup", [
        "dedup_embedding_cosine", "embed_quantize", "sim_cosine_topk",
        "embed_random_projection", "multimodal_resize",
    ]),
    "empty": ("sf_void", ["agg_rollup", "agg_cube", "profile_table"]),
    "ragged": ("sf_ragged_duck", ["embed_vector_stats", "scalar_array"]),
    "unicode": ("sf_unicode", ["text_normalize", "source_text_scan"]),
    # r7: extreme-but-legal temporal values (TIMESTAMP_NS range edges,
    # pre-epoch, calendar floor/ceiling, 1582 cutover).  Three finds on
    # the first sweeps: scalar_date's due_date crossed the year-9999
    # calendar ceiling (datetime.date caps at 9999 — now
    # NULL-on-overflow); scalar_date's order_month_start crashed the
    # tz-aware Python bridge within a day of the 0001-01-01 floor
    # (CPython's DST fold probe — now surfaced as TIMESTAMP_NTZ); and
    # events_gapfill_interpolate's [CURRENT ROW, UNBOUNDED FOLLOWING]
    # frame went O(n^2) on a 213k-day spine (now a running frame over
    # day DESC; plan-gated in test_plan_quality).  The gapfill spine
    # (~150 s here) is exercised by the slow chaos sweep, not this
    # cheap per-run gate.
    "times": ("sf_times", ["scalar_date"]),
    # r7 second wave: extreme-but-legal 64-bit keys (INT64 edges,
    # negatives, a negative prime; FK pairs share the extreme so joins
    # match).  First sweep found two fatal classes — the Knuth sampling
    # hash (doc_id * 2654435761) and the media-synthesis arithmetic
    # (doc_id*7 etc.) overflow int64, and BOTH engines raise under ANSI
    # semantics, so one scraper-assigned full-range id killed the job;
    # DuckDB additionally raises where Spark's shiftleft wraps.  All
    # key arithmetic is now pre-reduced pmod-style (bit-identical on
    # the fixtures' ids) and the bitwise oracle reproduces the
    # two's-complement wrap through a HUGEINT intermediate.
    "keys": ("sf_keys", [
        "sample_hash_stratified", "pipeline_corpus_prep", "scalar_bitwise",
        "multimodal_features", "multimodal_header_parse",
        "multimodal_decode_bmp", "multimodal_decode_wav",
        "multimodal_decode_png", "multimodal_resize",
    ]),
    # r7 third wave: hostile-but-VALID JSON payloads in events.props
    # (int64-edge and beyond-int64 numbers, floats, quoted numbers,
    # nested/array/bool/null values, missing and case-mismatched keys,
    # 1e400, an embedded '"k": 123' string decoy).  First probe showed
    # the old ANSI CAST(get_json_object(...) AS INT) RAISES on most of
    # them — one float payload killed the job — and map_keys(...)[0]
    # raises on the empty object; the old regex oracles also matched
    # the decoy inside a string value.  Both queries now carry
    # documented total contracts (try_cast token extraction; the
    # all-or-nothing typed map) with real-parser oracles.  Malformed
    # JSON stays the streaming dead-letter layer's contract; duplicate
    # keys are interop-undefined (RFC 8259) and excluded.
    # The twin's duplicated-value rows also caught a fatal engine
    # divergence in events_anomaly_zscore: near-constant groups make
    # the variance term float-negative, where Spark sqrt gives NaN but
    # DuckDB raises — now GREATEST(·, 0)-clamped on both sides.
    "json": ("sf_json", [
        "json_extract_props", "scalar_map_json", "events_anomaly_zscore",
    ]),
    # A tenth drift surfaced only on CHAOS (keys × nulls interaction,
    # invisible to either axis alone): an int64 column with NULLs in
    # the batch crosses Arrow→pandas as float64, so udf_transformer's
    # extreme user_id 9223372036854775800 (not float64-representable)
    # silently became INT64_MIN.  Ids now cross the pandas-UDF boundary
    # as JVM-rendered strings; the chaos full sweep is the gate.
}


@pytest.mark.parametrize("mode", sorted(ONCE_DRIFTED))
def test_once_drifted_queries_stay_aligned(mode):
    name, queries = ONCE_DRIFTED[mode]
    _sweep(_twin(name, mode), queries)


@pytest.mark.slow
def test_full_suite_parity_on_chaos_corpus():
    """All 155 queries hash-match DuckDB on the union of every hostile
    shape: NULL rows, duplicate rows, ragged vectors, unicode text."""
    _sweep(_twin("sf_chaos", "chaos"), [])


# The three gaps-and-islands queries whose DuckDB oracles were caught
# nondeterministic under full-row duplicates (r6 verdict headline find:
# ~5% standalone flake on scd2_intervals, higher under CPU contention;
# the two siblings shared the latent two-pass shape).  Fixed by emitting
# ROW_NUMBER() in the same window pass as the LAG and ordering the
# running-SUM pass by that rn.  A single green sweep cannot prove a
# flake is gone, so this gate re-runs each oracle N times and demands
# one identical multiset hash that also matches Spark's answer.
ISLAND_ORACLES = ["scd2_intervals", "sessionize_gap", "window_session_batch"]
_REPEAT = 10


@pytest.mark.parametrize("name", ISLAND_ORACLES)
def test_island_oracles_deterministic_on_duplicates(spark, name):
    """Repeat-run gate: the oracle's multiset hash is stable across
    _REPEAT evaluations on the chaos twin (full-row duplicates present)
    and equals Spark's bit-stable answer every time."""
    import hashlib

    from kinesis_handler_spark.registry import QUERIES, all_oracles
    from tools.check_oracle import _rows_to_multiset, duckdb_conn

    all_oracles()
    twin = _twin("sf_chaos", "chaos")
    q = QUERIES[name]
    sdf = q.fn(spark, twin)
    s_cols = sdf.columns
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    s_ms = _rows_to_multiset([tuple(r) for r in sdf.collect()], s_order)
    s_hash = hashlib.sha256("\n".join(s_ms).encode()).hexdigest()
    seen = set()
    for _ in range(_REPEAT):
        con = duckdb_conn(twin)
        try:
            cur = con.execute(q.oracle)
            d_cols = [c[0] for c in cur.description]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            d_ms = _rows_to_multiset(cur.fetchall(), d_order)
        finally:
            con.close()
        seen.add(hashlib.sha256("\n".join(d_ms).encode()).hexdigest())
    assert seen == {s_hash}, (
        f"{name}: duckdb oracle produced {len(seen)} distinct hashes over "
        f"{_REPEAT} runs (spark match: {s_hash in seen})"
    )
