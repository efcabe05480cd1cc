"""Sampled sf1.0 cross-engine parity — the regression gate for the
2^53 magnitude class (VERDICT r6 item 5).

Round 6's full-suite sf1.0 sweep (PARITY_SF1.json) caught a class of
defect no smaller SF can show: money sums whose magnitude crosses 2^53
at 10x data, where the decimal→double conversion quantizes differently
on Spark and DuckDB (ULP drift).  The fix — floor-quantizing every
bounded-group money sum (functions/numeric.floor_sum; rule in
registry.py's docstring) — holds only as long as NEW aggregates follow
the rule, so this marked test re-runs the highest-magnitude aggregates
against DuckDB at sf1.0 every time it's invoked:

    python -m pytest tests/ -m sf1      (measured 1m43s, one Spark session)

Selection: every query that carries a floor-quantized sum (the ones
the class actually bit in r6), the next tier of large revenue
aggregates that would cross the bound at the NEXT 10x, and the three
gaps-and-islands queries whose oracles were rewritten in r7 (their
duplicate-row determinism deserves the big-corpus check too).

The sf1.0 corpus is the deterministic tiled replica built by
tools/make_sf1.py (first run builds it, ~2 min; see SCALE.md for why
tiling is the honest construction).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF1 = os.path.join(_REPO, ".fixture_cache", "sf1.0")

# Every floor_sum / floor(sum(decimal)) carrier (the 2^53 class)...
FLOOR_QUANTIZED = [
    "agg_global",
    "agg_groupby_pricing",
    "agg_weighted_avg",
    "agg_corr_regression",
    "agg_promo_share",
    "agg_profit_by_nation_year",
    "agg_small_qty_revenue",
    "filter_disjunctive",
    "join_broadcast_dims",
    "join_market_share",
    "join_multi_star",
    "join_nation_volume",
    "sql_scan_agg_q6",
    "events_anomaly_zscore",
    "cow_schema_evolution",  # r10: per-segment acctbal floor_sum
]
# ...the next magnitude tier (large revenue sums that would cross 2^53
# at the next 10x; still decimal-exact today, watched here)...
NEXT_MAGNITUDE = [
    "agg_having_join_back",
    "agg_value_share",
    "agg_late_shipment_priority",
    "join_top_revenue_supplier",
    "join_dominant_supplier",
    "join_returns_by_customer",
]
# ...and the r7-rewritten gaps-and-islands oracles.
ISLAND = ["scd2_intervals", "sessionize_gap", "window_session_batch"]

SF1_QUERIES = FLOOR_QUANTIZED + NEXT_MAGNITUDE + ISLAND


def _ensure_sf1() -> str:
    if not os.path.exists(os.path.join(_SF1, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "make_sf1.py"), _SF1],
            check=True,
            env={**os.environ, "PYTHONPATH": _REPO},
            cwd=_REPO,
            timeout=1800,
        )
    return _SF1


@pytest.mark.sf1
def test_high_magnitude_aggregates_hold_at_sf1():
    """One strict check_oracle sweep of the 2^53-watch set at sf1.0.

    A single subprocess (one Spark startup) covers all 23 queries;
    runtime: measured 102 s on the reference box (local[8])."""
    sf1 = _ensure_sf1()
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_oracle.py"),
         sf1, *SF1_QUERIES],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": _REPO},
        cwd=_REPO,
        timeout=1800,
    )
    last = [ln for ln in out.stdout.splitlines() if "queries pass" in ln]
    m = re.search(r"(\d+)/(\d+) queries pass", last[-1]) if last else None
    ok = m and m.group(1) == m.group(2) == str(len(SF1_QUERIES))
    assert ok, (
        "sf1.0 magnitude-class drift:\n"
        + "\n".join(
            ln for ln in out.stdout.splitlines() if ln.startswith("FAIL")
        )
        + f"\n(tail: {out.stdout[-300:]})"
    )
