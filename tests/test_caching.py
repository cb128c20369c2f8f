"""Cache hygiene: operators that persist intermediates must not leak
them across a long-lived session (VERDICT r02 'What's wrong #6')."""

from __future__ import annotations

from tests.conftest import SF_TEST


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_tracked_persists_released(spark):
    from greenexp_r_spark import world
    from greenexp_r_spark.operators import dedup, similarity
    from greenexp_r_spark.plans.caching import release_caches

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    emb = spark.read.parquet(f"{SF_TEST}/embeddings.parquet")

    release_caches()
    n1 = dedup.minhash_lsh_pairs(docs).count()
    assert not _cache_manager_empty(spark)   # cache live while in use
    n2 = similarity.neardup_pairs(emb).count()
    # building the second operator released the first's cache; release
    # the second explicitly and the manager must be empty
    release_caches()
    assert _cache_manager_empty(spark)
    # results unaffected by cache lifecycle
    assert n1 == dedup.minhash_lsh_pairs(docs).count()
    assert n2 == similarity.neardup_pairs(emb).count()
    release_caches()
