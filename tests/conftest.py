from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sentinel_imagery_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Round 13: the default pytest lane excludes tests listed in
# tests/slow_manifest.txt (see pytest.ini). The manifest holds node
# IDs measured >= 2 s serially; unknown/renamed IDs are ignored and
# new tests default INTO the fast lane.
_SLOW_MANIFEST = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "slow_manifest.txt"
)


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SLOW_MANIFEST) as fh:
            slow_ids = {
                ln.strip()
                for ln in fh
                if ln.strip() and not ln.startswith("#")
            }
    except FileNotFoundError:
        return
    for item in items:
        nid = item.nodeid.replace(os.sep, "/")
        if not nid.startswith("tests/"):
            nid = "tests/" + nid.split("tests/")[-1]
        if nid in slow_ids:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
