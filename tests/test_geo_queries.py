"""Oracle-parity tests for the geo query registry (mirrors the
driver's CORRECTNESS gate at small scale)."""

from __future__ import annotations

import pytest

from greenexp_r_spark import registry

from .conftest import SF_TEST
from . import oracle_harness

FAST = [
    "q_availability_ndvi",
    "q_landcover_fractions",
    "q_cover_pct",
    "q_accessibility_euclidean",
    "q_knn_parks",
]


@pytest.mark.parametrize("name", FAST)
def test_fast_queries_match_oracle(spark, name):
    spec = registry.build_registry()[name]
    oracle_harness.compare(spec.spark(spark, SF_TEST), spec.oracle, SF_TEST)


def test_network_matches_oracle(spark):
    spec = registry.build_registry()["q_accessibility_network"]
    oracle_harness.compare(spec.spark(spark, SF_TEST), spec.oracle, SF_TEST)


def test_largest_component_matches_oracle(spark):
    spec = registry.build_registry()["q_largest_component"]
    oracle_harness.compare(spec.spark(spark, SF_TEST), spec.oracle, SF_TEST)
