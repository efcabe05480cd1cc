"""Environment-drift gate: the full query surface must run under a
VANILLA SparkSession (none of session.py's confs, non-UTC timezone) —
i.e. the session the external driver actually builds.

Runs tools/vanilla_sweep.py in a SUBPROCESS because the pytest session
already holds a JVM configured by session.py; a fresh process is the
only way to get a genuinely bare session.

Motivation (VERDICT.md rounds 2-3): the driver's fixtures changed
events.ts to parquet timestamp[us]-no-tz (TIMESTAMP_NTZ), which broke 6
queries under the driver's vanilla session while every locally-run test
stayed green — because session.py's UTC/nanosAsLong confs masked the
drift.  This test would have caught that before the driver did.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.slow
def test_all_queries_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_DIR, "tools", "vanilla_sweep.py"),
         SF_DIR],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO_DIR,
    )
    # The JSON line is the last stdout line (Spark may log above it).
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no output; stderr tail: {proc.stderr[-2000:]}"
    report = json.loads(lines[-1])
    assert report["failures"] == {}, (
        f"queries broken under vanilla session: {report['failures']}"
    )
    assert report["ts_ok"], "events.ts normalization is session-TZ-dependent"
    assert proc.returncode == 0
