"""Explicit skew handling (north_rule: "skewed urban cells are salted
and split before the shuffle").

AQE's skew-join splitting is the backstop (enabled in session.py); this
module is the *explicit* path for the known-skewed spatial joins: 70%
of parks sit in 3 hotspot cells (FIXTURES §2), so the points⋈cell-layer
join key distribution is pathological by construction.

Mechanism (classic salt+replicate):
  1. a cheap driver-visible histogram of the build-side key column
     finds keys with count > threshold (the histogram is
     O(distinct cells) — bounded by world_area/cell², tiny even at
     10^12 points);
  2. the probe side appends salt = pmod(xxhash64(row key), n_salt) for
     hot keys (0 otherwise);
  3. the build side replicates hot-key rows once per salt value;
  4. the join key becomes (key, salt) — hot keys now spread over
     n_salt reducers.
Results are identical to the unsalted join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> list:
    """Driver-side list of keys whose row count exceeds threshold."""
    rows = (df.groupBy(key).count()
            .where(F.col("count") > threshold)
            .select(key).collect())
    return [r[0] for r in rows]


def salt_probe(df: DataFrame, key: str, hot: list, n_salt: int,
               row_key: str) -> DataFrame:
    """Append `_salt`: hash-derived for hot keys, 0 otherwise."""
    if not hot:
        return df.withColumn("_salt", F.lit(0))
    is_hot = F.col(key).isin(hot)
    return df.withColumn(
        "_salt",
        F.when(is_hot, F.pmod(F.xxhash64(F.col(row_key)), F.lit(n_salt)))
         .otherwise(F.lit(0)).cast("int"))


def salt_build(df: DataFrame, key: str, hot: list, n_salt: int) -> DataFrame:
    """Replicate hot-key rows across all salt values."""
    if not hot:
        return df.withColumn("_salt", F.lit(0))
    is_hot = F.col(key).isin(hot)
    salts = F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salt - 1))) \
             .otherwise(F.array(F.lit(0)))
    return (df.withColumn("_salt", F.explode(salts))
            .withColumn("_salt", F.col("_salt").cast("int")))


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                row_key: str, threshold: int, n_salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join on `key` with explicit hot-key salting; drop-in for
    probe.join(build, key, how)."""
    hot = hot_keys(probe, key, threshold)
    p = salt_probe(probe, key, hot, n_salt, row_key)
    b = salt_build(build, key, hot, n_salt)
    return p.join(b, [key, "_salt"], how).drop("_salt")
