from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from kinesis_handler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("KHS_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (vanilla-session sweep etc.)"
    )
    config.addinivalue_line(
        "markers",
        "sf1: parity checks against the synthesized sf1.0 corpus "
        "(builds .fixture_cache/sf1.0 on first run; ~4 min total)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("khs-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
