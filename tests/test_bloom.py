"""Portable Bloom filter (operators/bloom.py): cross-engine bit-parity
of the word table and the membership verdicts, the no-false-negative
guarantee, and a useful false-positive rate."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from greenexp_r_spark.dialect import DUCK
from greenexp_r_spark.operators import bloom as B

from .oracle_harness import compare

KEYS_SQL = ("SELECT CAST(doc_id AS VARCHAR) AS term "
            "FROM documents WHERE doc_id % 3 = 0")
PROBE_SQL = "SELECT CAST(doc_id AS VARCHAR) AS term FROM documents"


def _keys(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where("doc_id % 3 = 0")
            .select(F.col("doc_id").cast("string").alias("term")))


def _probe(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("term")))


def test_bloom_words_match_duckdb_bitwise(spark, sf_dir):
    compare(B.bloom_build(_keys(spark, sf_dir)),
            B.bloom_sql(DUCK, KEYS_SQL), sf_dir)


def test_membership_matches_duckdb_and_never_misses(spark, sf_dir):
    bloom = B.bloom_build(_keys(spark, sf_dir))
    probe = _probe(spark, sf_dir)
    got = probe.select("term", B.bloom_member(bloom)
                       .alias("may_match"))
    compare(got, B.member_sql(DUCK, KEYS_SQL, PROBE_SQL), sf_dir)
    # no false negatives: every true member passes
    misses = (got.where(~F.col("may_match"))
              .where(F.col("term").cast("long") % 3 == 0).count())
    assert misses == 0


def test_fp_rate_within_theory(spark, sf_dir):
    keys = _keys(spark, sf_dir).cache()
    try:
        n = keys.count()
        bloom = B.bloom_build(keys)
        non = _probe(spark, sf_dir) \
            .where(F.col("term").cast("long") % 3 != 0).cache()
        n_non = non.count()
        fp = B.bloom_semi_join(non, bloom).count()
        theory = (1 - math.exp(-B.BLOOM_K * n
                               / (B.BLOOM_WORDS * B.BLOOM_LANES))) \
            ** B.BLOOM_K
        assert fp / n_non <= max(2 * theory, 0.02), \
            f"fp rate {fp / n_non:.4f} vs theory {theory:.4f}"
    finally:
        keys.unpersist()
        non.unpersist()


def test_semi_join_is_pruning_superset(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("term", F.col("doc_id").cast("string"))
    bloom = B.bloom_build(_keys(spark, sf_dir))
    kept = B.bloom_semi_join(docs, bloom).cache()
    try:
        exact = docs.where("doc_id % 3 = 0")
        # superset of the exact semi-join ...
        assert kept.where("doc_id % 3 = 0").count() == exact.count()
        # ... and a real prune (strictly smaller than the input)
        assert kept.count() < docs.count()
    finally:
        kept.unpersist()
