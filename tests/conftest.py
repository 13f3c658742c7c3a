from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_pipeline_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_nodeids() -> set[str]:
    with open(_SLOW_LIST) as fh:
        return {
            line.strip()
            for line in fh
            if line.strip() and not line.startswith("#")
        }


def pytest_collection_modifyitems(config, items):
    """Apply the ``slow`` marker from tests/slow_tests.txt (the default
    lane deselects it via pytest.ini addopts). Ids that match nothing
    in a FULL collection are reported as an error so a rename cannot
    silently promote a 30s test back into the default lane unnoticed
    — partial collections (single-file runs) skip that check."""
    slow = _slow_nodeids()
    seen = set()
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
            seen.add(item.nodeid)
    args = [a for a in config.invocation_params.args if not str(a).startswith("-")]
    full_run = all(str(a).rstrip("/").endswith("tests") for a in args) or not args
    stale = slow - seen
    if full_run and stale:
        raise pytest.UsageError(
            "tests/slow_tests.txt lists nodeids that no longer exist "
            f"(update the list): {sorted(stale)[:5]}"
        )


@pytest.fixture(scope="session")
def spark():
    session = get_session("event_pipeline_spark_tests")
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
