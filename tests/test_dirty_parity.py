"""Cross-engine parity ON DIRTY DATA — the regression gate for the
NULL-semantics alignment pass.

`tools/make_dirty_twin.py` builds a NULL-riddled corpus that preserves
physical parquet types, so `tools/check_oracle.py` (the type-strict
driver-gate replica) can hash-compare Spark vs DuckDB on it.  The first
sweep found 20 impl/oracle drifts (NULL ordering in rankings, NULL-ts
window membership, concat_ws-vs-|| NULL handling, format_string
rendering NULL as "null", UNPIVOT dropping NULL values, GROUP BY
collapsing duplicate media ids, a pandas kernel raising on NULL...).
All are aligned now; this file keeps them aligned:

* the default-run test re-checks exactly the 20 once-drifted queries;
* the ``slow``-marked test sweeps all 155 (same cost as a driver gate).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TWIN = os.path.join(_REPO, ".fixture_cache", "sf_dirty")

ONCE_DRIFTED = [
    "window_rank_topn", "topk_per_group", "sql_window_topn",
    "window_ntile_percent", "limit_topk", "dedup_exact",
    "sample_uniform_per_stratum", "sessionize_gap", "agg_string_concat",
    "reshape_unpivot", "agg_min_max_by", "scalar_string", "scalar_hash",
    "scalar_map_json", "udf_transformer", "window_frame_exclude",
    "window_time_slide", "window_session_batch", "window_time_bucket",
    "multimodal_resize",
]


@pytest.fixture(scope="session")
def dirty_twin() -> str:
    if not os.path.exists(os.path.join(_TWIN, "events.parquet")):
        from tools.make_dirty_twin import build

        build("/root/testdata/sf0.001", _TWIN)
    return _TWIN


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
    import re

    last = [ln for ln in out.stdout.splitlines() if "queries pass" in ln]
    m = re.search(r"(\d+)/(\d+) queries pass", last[-1]) if last else None
    ok = m and m.group(1) == m.group(2) and (
        not queries or int(m.group(2)) == len(queries)
    )
    assert ok, (
        "dirty-parity drift:\n"
        + "\n".join(ln for ln in out.stdout.splitlines() if ln.startswith("FAIL"))
    )


def test_once_drifted_queries_stay_aligned_on_dirty_data(dirty_twin):
    _sweep(dirty_twin, ONCE_DRIFTED)


@pytest.mark.slow
def test_full_suite_parity_on_dirty_data(dirty_twin):
    _sweep(dirty_twin, [])


@pytest.fixture(scope="session")
def dup_twin() -> str:
    """Twin with the first five rows of every table duplicated verbatim
    — catches per-row-impl vs GROUP-BY-oracle drift and operators that
    quietly assume key uniqueness (first sweep: three vector queries
    whose oracles keyed on a then-non-unique vec_id)."""
    out = os.path.join(_REPO, ".fixture_cache", "sf_dup")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.make_dirty_twin import build

        build("/root/testdata/sf0.001", out, "dups")
    return out


ONCE_DRIFTED_ON_DUPS = [
    "dedup_embedding_cosine", "embed_quantize", "sim_cosine_topk",
    "embed_random_projection", "multimodal_resize",
]


def test_once_drifted_queries_stay_aligned_on_duplicate_keys(dup_twin):
    _sweep(dup_twin, ONCE_DRIFTED_ON_DUPS)


@pytest.mark.slow
def test_full_suite_parity_on_duplicate_keys(dup_twin):
    _sweep(dup_twin, [])


@pytest.fixture(scope="session")
def void_twin() -> str:
    """Zero-row, full-schema twin — DuckDB-readable sibling of the
    Spark-only empty twin.  First sweep: Spark's rollup/cube omit the
    SQL-standard grand-total row over empty input (oracles mirror with
    HAVING COUNT(*) > 0), and profile_table's format_string rendered a
    NULL min/max as the string "null"."""
    out = os.path.join(_REPO, ".fixture_cache", "sf_void")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.make_dirty_twin import build

        build("/root/testdata/sf0.001", out, "empty")
    return out


ONCE_DRIFTED_ON_EMPTY = ["agg_rollup", "agg_cube", "profile_table"]


def test_once_drifted_queries_stay_aligned_on_empty_corpus(void_twin):
    _sweep(void_twin, ONCE_DRIFTED_ON_EMPTY)


@pytest.mark.slow
def test_full_suite_parity_on_empty_corpus(void_twin):
    _sweep(void_twin, [])


@pytest.fixture(scope="session")
def ragged_twin() -> str:
    """Twin whose embeddings table carries empty / wrong-dimension /
    NULL-element vectors.  First sweep: embed_vector_stats folded them
    divergently (DuckDB list_sum skips NULL elements, Spark's aggregate
    propagates; now under the _clean_embeddings contract) and
    scalar_array's ANSI element_at raised on the empty vector (now
    try_element_at, matching DuckDB's NULL)."""
    out = os.path.join(_REPO, ".fixture_cache", "sf_ragged_duck")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.make_dirty_twin import build

        build("/root/testdata/sf0.001", out, "ragged")
    return out


ONCE_DRIFTED_ON_RAGGED = ["embed_vector_stats", "scalar_array"]


def test_once_drifted_queries_stay_aligned_on_ragged_vectors(ragged_twin):
    _sweep(ragged_twin, ONCE_DRIFTED_ON_RAGGED)


@pytest.mark.slow
def test_full_suite_parity_on_ragged_vectors(ragged_twin):
    _sweep(ragged_twin, [])


@pytest.fixture(scope="session")
def unicode_twin() -> str:
    """Twin whose documents carry emoji/ZWJ, CJK, RTL, combining marks,
    zero-width characters, and case-mapping edge cases (ß, İ).  First
    sweep: Java's lower('İ') emits i+combining-dot while DuckDB's emits
    plain i — normalize_text now strips combining marks between lower()
    and the keep-class replace, identically on both engines."""
    out = os.path.join(_REPO, ".fixture_cache", "sf_unicode")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.make_dirty_twin import build

        build("/root/testdata/sf0.001", out, "unicode")
    return out


ONCE_DRIFTED_ON_UNICODE = ["text_normalize", "source_text_scan"]


def test_once_drifted_queries_stay_aligned_on_unicode_text(unicode_twin):
    _sweep(unicode_twin, ONCE_DRIFTED_ON_UNICODE)


@pytest.mark.slow
def test_full_suite_parity_on_unicode_text(unicode_twin):
    _sweep(unicode_twin, [])
