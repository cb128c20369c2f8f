from __future__ import annotations

import pytest

from greenexp_r_spark.registry_geo2 import build_geo2_registry

from .conftest import SF_TEST
from . import oracle_harness


@pytest.mark.parametrize("name", sorted(build_geo2_registry().keys()))
def test_geo2_matches_oracle(spark, name):
    spec = build_geo2_registry()[name]
    df = spec.spark(spark, SF_TEST)
    if spec.oracle is None:
        assert df.count() > 0          # rows-only contract
    else:
        oracle_harness.compare(df, spec.oracle, SF_TEST)


from greenexp_r_spark.registry_relational import build_relational_registry


@pytest.mark.parametrize("name", sorted(build_relational_registry().keys()))
def test_relational_matches_oracle(spark, name):
    spec = build_relational_registry()[name]
    oracle_harness.compare(spec.spark(spark, SF_TEST), spec.oracle, SF_TEST)
