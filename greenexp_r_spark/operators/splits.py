"""Leakage-free train/valid/test split assignment.

The standard held-out-split step of a pretraining pipeline, with the
property the naive per-document hash split gets WRONG: near-duplicate
documents must never straddle splits (a test document whose near-twin
sits in train leaks the benchmark).  The fix is to key the split draw
on the document's dedup-cluster CANONICAL id (the group keeper from
``dedup.dedup_groups``; unclustered documents are their own keeper),
so every member of a cluster lands in the same split by construction.

Pure column expressions — an affine per-mille draw off the canonical
key and a three-way CASE — so the assignment is zero-cost inside any
existing scan, deterministic across runs/engines, and SQL-exact
(multiplier kept small: DuckDB raises on BIGINT overflow where Spark
wraps — the sampling.py lesson).

Bands (per mille): train < 960, valid < 980, test otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SPLIT_MUL, SPLIT_ADD = 69_621, 113   # MINSTD-variant multiplier
TRAIN_PM, VALID_PM = 960, 980


def split_draw(key: Column) -> Column:
    return (key * SPLIT_MUL + SPLIT_ADD) % 1000


def split_col(key: Column) -> Column:
    """'train' | 'valid' | 'test' from the canonical-key draw."""
    d = split_draw(key)
    return (F.when(d < TRAIN_PM, F.lit("train"))
            .when(d < VALID_PM, F.lit("valid"))
            .otherwise(F.lit("test")))


def split_sql(key: str) -> str:
    """DuckDB/Spark-shared rendering of :func:`split_col`."""
    d = f"((({key}) * {SPLIT_MUL} + {SPLIT_ADD}) % 1000)"
    return (f"CASE WHEN {d} < {TRAIN_PM} THEN 'train' "
            f"WHEN {d} < {VALID_PM} THEN 'valid' ELSE 'test' END")


def leakage_free_split(groups) -> "DataFrame":  # noqa: F821
    """Adds `split` to a (group_id, doc_id, ...) cluster frame keyed
    off group_id — every cluster member shares the assignment."""
    return groups.withColumn("split", split_col(F.col("group_id")))
