"""Structural invariants of the series-repair operators
(queries/timeseries.py) — properties that must hold on ANY fixture
generation, complementing the DuckDB hash checks (which pin exact
values on the CURRENT fixtures).  This is the fixture-drift insurance
the round-2/3 events.ts break showed the hash checks alone don't give.
"""

from __future__ import annotations

from collections import defaultdict

import kinesis_handler_spark.queries  # noqa: F401 - triggers registration
from kinesis_handler_spark.registry import QUERIES


def test_gapfill_spine_is_dense_and_interpolation_bounded(spark, sf_dir):
    rows = QUERIES["events_gapfill_interpolate"].fn(spark, sf_dir).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        # dense daily spine, endpoints observed
        days = [r["day"].toordinal() for r in rs]
        assert days == list(range(days[0], days[-1] + 1)), user
        assert rs[0]["is_observed"] and rs[-1]["is_observed"], user
        # every gap row sits within [min, max] of the surrounding
        # observed values (linear interpolation is bounded by its
        # endpoints), and no filled value is NULL
        obs_idx = [i for i, r in enumerate(rs) if r["is_observed"]]
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(rs[a]["value_filled"], rs[b]["value_filled"])
            hi = max(rs[a]["value_filled"], rs[b]["value_filled"])
            for i in range(a + 1, b):
                v = rs[i]["value_filled"]
                assert v is not None, (user, rs[i]["day"])
                assert lo - 1e-9 <= v <= hi + 1e-9, (user, rs[i]["day"])


def test_scd2_intervals_tile_history(spark, sf_dir):
    rows = QUERIES["scd2_intervals"].fn(spark, sf_dir).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        # versions are 1..n with no gaps; intervals tile: each
        # valid_to equals the next valid_from; exactly one open
        # (NULL valid_to) interval — the current one, last by version
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], (user, a["version"])
            # consecutive runs differ in the tracked attribute
            assert a["event_type"] != b["event_type"], (user, a["version"])
        assert rs[-1]["valid_to"] is None
        assert all(r["valid_to"] is not None for r in rs[:-1])
        assert all(r["n_events"] >= 1 for r in rs)


def test_groups_frame_matches_rows_reconstruction(spark, sf_dir):
    # Reconstruct GROUPS-frame semantics independently in Python from
    # the raw events: per (user, day) sums, then each row's group_sum
    # = sum over day-groups at group-index distance <= 1.
    from kinesis_handler_spark.tables import table

    out = QUERIES["window_groups_frame"].fn(spark, sf_dir).collect()
    assert out
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    daily = defaultdict(float)
    for r in ev:
        daily[(r["user_id"], r["ts"].date())] += r["value"]
    by_user_days = defaultdict(list)
    for (u, d) in daily:
        by_user_days[u].append(d)
    expect = {}
    for u, days in by_user_days.items():
        days.sort()
        for i, d in enumerate(days):
            window = days[max(0, i - 1) : i + 2]
            expect[(u, d)] = sum(daily[(u, w)] for w in window)
    for r in out:
        # double-sum reconstruction tolerance (impl uses exact decimal)
        assert abs(r["group_sum"] - expect[(r["user_id"], r["day"])]) < 1e-6, (
            r["user_id"],
            r["day"],
        )
