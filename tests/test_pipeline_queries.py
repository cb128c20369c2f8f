"""Oracle-parity tests for the training-data pipeline queries."""

from __future__ import annotations

import pytest

from greenexp_r_spark.registry_pipeline import build_pipeline_registry

from .conftest import SF_TEST
from . import oracle_harness

NAMES = sorted(build_pipeline_registry().keys())


@pytest.mark.parametrize("name", NAMES)
def test_pipeline_query_matches_oracle(spark, name):
    spec = build_pipeline_registry()[name]
    df = spec.spark(spark, SF_TEST)
    if spec.oracle is None:
        # rows-only gate entry (non-SQL-expressible, e.g. k-means
        # training); invariants live in dedicated tests
        assert df.count() >= 0
        return
    oracle_harness.compare(df, spec.oracle, SF_TEST)


def test_dedup_finds_planted_duplicates(spark):
    from greenexp_r_spark.operators import dedup
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    corpus = dedup.augmented_corpus(docs)
    groups = dedup.exact_duplicates(corpus).toPandas()
    # every 10th doc has an exact copy → at least n/10 groups
    n = docs.count()
    assert groups["dup_group_min"].nunique() >= n // 10


def test_minhash_finds_neardups(spark):
    from greenexp_r_spark.operators import dedup
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(dedup.augmented_corpus(docs)).toPandas()
    # exact copies (jaccard 1.0) must all be found; near-dups mostly
    exact_found = pairs[pairs.jaccard >= 0.9999]
    assert len(exact_found) >= docs.count() // 10
    near = pairs[(pairs.doc_b >= 2_000_000) & (pairs.doc_a == pairs.doc_b - 2_000_000)]
    assert len(near) > 0
