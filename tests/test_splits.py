"""Leakage-free split assignment (operators/splits.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from greenexp_r_spark.operators import dedup, splits


def test_bands_proportions_and_determinism(spark):
    df = spark.range(0, 100_000).select(
        splits.split_col(F.col("id")).alias("split"))
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    n = sum(counts.values())
    assert n == 100_000
    assert abs(counts["train"] / n - 0.96) < 0.01
    assert abs(counts["valid"] / n - 0.02) < 0.005
    assert abs(counts["test"] / n - 0.02) < 0.005
    again = {r["split"]: r["n"] for r in
             spark.range(0, 100_000)
             .select(splits.split_col(F.col("id")).alias("split"))
             .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert again == counts


def test_split_sql_matches_column(spark):
    got = [r[0] for r in
           spark.range(0, 5_000)
           .select(splits.split_col(F.col("id"))).collect()]
    want = [r[0] for r in duckdb.connect().execute(
        f"SELECT {splits.split_sql('r')} FROM range(0, 5000) t(r)"
    ).fetchall()]
    assert got == want


def test_cluster_members_never_straddle_splits(spark, sf_dir):
    from greenexp_r_spark.registry_pipeline import _docs
    groups = splits.leakage_free_split(
        dedup.dedup_groups(dedup.augmented_corpus(_docs(spark, sf_dir))))
    bad = (groups.groupBy("group_id")
           .agg(F.countDistinct("split").alias("k"))
           .where(F.col("k") > 1).count())
    assert bad == 0
    assert groups.where(F.col("group_size") > 1).count() > 0


def test_corpus_select_split_is_cluster_keyed(spark, sf_dir):
    # every kept doc is its own keeper, so the doc-keyed split must
    # equal the group-keyed split of its cluster row
    from greenexp_r_spark.registry_pipeline import _docs
    docs = _docs(spark, sf_dir)
    kept = dedup.corpus_select(docs).select("doc_id", "split")
    groups = splits.leakage_free_split(
        dedup.dedup_groups(dedup.augmented_corpus(docs)))
    j = (kept.join(groups.select("doc_id",
                                 F.col("split").alias("gsplit")),
                   "doc_id"))
    assert j.where(F.col("split") != F.col("gsplit")).count() == 0
