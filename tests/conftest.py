from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TEST = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST


@pytest.fixture(scope="session")
def spark():
    from greenexp_r_spark.session import build_session
    s = build_session(app="greenexp-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()
