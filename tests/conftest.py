from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythondataingestionprocess_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Round-18 test-budget split (VERDICT r17 item 3): the default run is
# the DRIVER-SIZED gate — the full suite outgrew the round driver's
# pytest window (r17 VERIFY tail cut at ~85% with zero failures;
# measured 32m51s for 928 tests on this host), so the multi-ten-second
# PROBE tests (randomized walks, multi-batch replay/idempotency
# probes, streaming lifecycle runs, large parity sweeps) are marked
# ``@pytest.mark.slow`` and skipped unless SPARK_GRAFT_FULL_TESTS=1.
# The builder's full gate (run at least once per round, and after any
# change touching a marked area) is:
#
#     SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q
#
# Driver-facing gates (plan-sweep antipattern scan, oracle parity
# rows, bench output contract, registry rotation) are NEVER marked —
# they keep running in the default gate regardless of cost.
RUN_SLOW = os.environ.get("SPARK_GRAFT_FULL_TESTS", "") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute/multi-ten-second probe; skipped unless "
        "SPARK_GRAFT_FULL_TESTS=1 (the builder's full gate)",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(
        reason="slow probe; set SPARK_GRAFT_FULL_TESTS=1 for the full gate"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pdip-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
