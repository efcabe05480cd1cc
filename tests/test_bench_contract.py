"""Bench stdout contract: the driver records only the LAST 2000 chars of
bench.py stdout (BENCH_r2..r5 all show a 2000-char ``tail``), so the
final printed line must be a COMPLETE JSON document comfortably under
that window, and it must round-trip back to the full named per-query
map via tools/expand_bench.py."""

from __future__ import annotations

import json

from bench import compact_line
from kinesis_handler_spark.registry import all_queries
from tools.expand_bench import expand

# Worst-case-ish per-query seconds: full 3-decimal precision, two digits
# before the point (no current query exceeds 5 s at sf0.1).
_FAKE_SECONDS = 12.345


def _fake_result(error_names=()):
    names = sorted(all_queries())
    timings = {n: _FAKE_SECONDS for n in names if n not in set(error_names)}
    out = {
        "metric": "total_declared_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "calib": {
            "start": {"cpu_sec": 12.345, "cpu_mean": 12.345,
                      "shuffle_sec": 12.345, "shuffle_mean": 12.345},
            "end": {"cpu_sec": 12.345, "cpu_mean": 12.345,
                    "shuffle_sec": 12.345, "shuffle_mean": 12.345},
        },
        "sf": 0.1,
    }
    if error_names:
        out["errors"] = {n: "RuntimeError: boom" for n in error_names}
        out["error_count"] = len(error_names)
    return out


def test_compact_line_fits_driver_tail_window():
    line = compact_line(_fake_result())
    # 2000-char tail minus the trailing newline minus headroom for any
    # stray log line the JVM appends after our print.
    assert len(line) <= 1800, f"compact line {len(line)} chars — too big"
    parsed = json.loads(line)
    assert parsed["n_queries"] == len(all_queries())
    assert len(parsed["qvals"]) == parsed["n_queries"]


def test_compact_line_roundtrips_to_named_map():
    full = _fake_result()
    parsed = json.loads(compact_line(full))
    assert expand(parsed) == full["queries"]


def test_compact_line_roundtrips_with_errors():
    errs = ("agg_global", "join_inner_equi")
    full = _fake_result(error_names=errs)
    parsed = json.loads(compact_line(full))
    assert parsed["qerr"] == sorted(errs)
    assert expand(parsed) == full["queries"]
    assert len(json.dumps(parsed, separators=(",", ":"))) <= 1800


def test_verbose_line_still_first_contract():
    # The verbose artifact keeps the named map for humans/BENCH_LOCAL.
    full = _fake_result()
    assert isinstance(full["queries"], dict)
    assert set(full["queries"]) == set(all_queries())


def test_artifact_name_derives_from_actual_sf():
    # r7 verdict item 5: a bench run at sf1.0 must never clobber the
    # sf0.1 baseline artifact — the filename is keyed by the actual sf.
    from bench import default_artifact

    assert default_artifact(0.1) == "BENCH_LOCAL.json"
    assert default_artifact(1.0) == "BENCH_SF1.json"
    assert default_artifact(0.01) == "BENCH_SF0.01.json"
    assert default_artifact(0.001) == "BENCH_SF0.001.json"
    assert default_artifact(0.1) != default_artifact(1.0)


def test_equal_count_name_divergence_is_detected():
    # ADVICE r6: a rename (or one query added + one removed) keeps the
    # count equal, so the old alignment check passed while every timing
    # after the first divergent name was silently misattributed.  The
    # qfp fingerprint turns that into a hard error.
    import pytest

    full = _fake_result()
    parsed = json.loads(compact_line(full))
    names = sorted(full["queries"])
    renamed = names[:10] + ["zz_renamed_query"] + names[11:]
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        expand(parsed, names=renamed)
    # same-name expansion still round-trips
    assert expand(parsed, names=names) == full["queries"]


def test_chunk_lines_rebuild_named_map():
    # VERDICT r12 ask #2: the named per-query map must be recoverable
    # by a line-scanning consumer — chunked JSON lines, each complete,
    # each under the tail-window budget, merging to the full map.
    from bench import chunk_lines

    full = _fake_result()
    lines = chunk_lines(full)
    merged: dict = {}
    qfps = set()
    for i, ln in enumerate(lines):
        assert len(ln) <= 1600, f"chunk {i} is {len(ln)} chars"
        rec = json.loads(ln)
        assert rec["metric"] == "declared_query_seconds_part"
        assert rec["part"] == i + 1
        assert rec["parts"] == len(lines)
        qfps.add(rec["qfp"])
        assert not set(rec["queries"]) & set(merged), "overlapping chunks"
        merged.update(rec["queries"])
    assert len(qfps) == 1
    assert merged == full["queries"]


def test_chunk_lines_do_not_change_the_tail_contract():
    # The LAST stdout line must remain the compact line: chunks are
    # printed BEFORE it (pinned here against bench.py's print order),
    # so a tail-only consumer parses exactly what it parsed in r12.
    import inspect

    import bench

    src = inspect.getsource(bench)
    main_part = src[src.index('__main__') :]
    assert main_part.index("chunk_lines") < main_part.index(
        "compact_line"
    ), "compact line must stay last on stdout"
