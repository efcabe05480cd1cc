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
import tempfile

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.slow
def test_all_queries_run_on_vanilla_session():
    # cwd is a NEUTRAL directory, not the repo: a driver launched from
    # the repo root lets executor workers import the package through
    # the inherited cwd, masking missing-addPyFile bugs (round-5 find:
    # every mapInPandas query failed from any other cwd until
    # deploy.ensure_shipped).  The sweep must prove the package ships.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_DIR, "tools", "vanilla_sweep.py"),
         SF_DIR],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=tempfile.gettempdir(),
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


def test_cluster_conf_is_coherent():
    from kinesis_handler_spark.session import cluster_conf

    c = cluster_conf(executors=1000, cores_per_executor=4)
    # 2x total cores, and every value is a string (submit-tool friendly)
    assert c["spark.sql.shuffle.partitions"] == "8000"
    assert all(isinstance(v, str) for v in c.values())
    # scan task sizing consistent with the advisory post-shuffle size
    assert (
        c["spark.sql.files.maxPartitionBytes"]
        == c["spark.sql.adaptive.advisoryPartitionSizeInBytes"]
    )
    # the local session must remain able to apply the runtime-settable
    # subset (sql.* confs) without error
    from kinesis_handler_spark.session import get_spark

    spark = get_spark("cluster-conf-test", cpus=2, shuffle_partitions=2)
    for k, v in c.items():
        if k.startswith("spark.sql.") and k != "spark.sql.shuffle.partitions":
            before = spark.conf.get(k, None)
            spark.conf.set(k, v)
            # restore: the session is shared process-wide in pytest
            if before is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, before)
