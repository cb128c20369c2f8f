"""Generic 1-D range (interval containment) join — the second classic
operator Spark's DataFrame API lacks: pair every point row with every
interval row whose ``[lo, hi]`` contains it, optionally also matching
equi-keys.

Expressed naively (``points JOIN intervals ON v BETWEEN lo AND hi``)
Catalyst can only plan a broadcast-nested-loop join — O(|P|·|I|)
comparisons, the thing that dies first at 100 TB.  The scale-safe
plan used here is the bucketed equi-join:

  1. pick a bucket width ``w`` (default: the widest interval span, so
     every interval covers at most TWO buckets);
  2. explode each interval into its covered bucket ids
     ``floor(lo/w) .. floor(hi/w)`` — a bounded sequence, no UDF;
  3. map each point to its single bucket ``floor(v/w)``;
  4. shuffle equi-join on (keys…, bucket) and re-check the exact
     containment predicate.

Cost is one equi-shuffle of |P| + ~2·|I| rows and an exact filter —
the same shape as every banded join in this repo (LSH dedup, tile
zonal).  Skew bound: points land in ONE bucket each, so a hot bucket
is at worst (points in w) × (intervals overlapping it); a single
domain-spanning outlier interval degrades ``w`` — pass an explicit
``bucket_width`` (or pre-split giant intervals) in that regime, the
classic multi-level refinement.

Domains are integer (epoch micros via ``unix_micros`` for timestamps
— ≡ DuckDB ``epoch_us`` under the repo's UTC session), so the bucket
arithmetic and the containment predicate are integer-exact
cross-engine; the DuckDB oracle is the plain inequality join
(tests/test_rangejoin.py pins per-row parity).

Reference analog: none in GreenExp_R (LLM-pipeline brief); the
bucket-explode shape follows the repo's zonal tile join
(operators/zonal_tiles.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_BUCKET = "_rj_bucket"
_V = "_rj_v"
_LO = "_rj_lo"
_HI = "_rj_hi"


def _as_long(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("long")


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               keys: Sequence[str] = (),
               bucket_width: int | None = None,
               closed: str = "both") -> DataFrame:
    """Inner containment join: all points columns + all intervals
    columns (names must not collide apart from ``keys``, which are
    taken from the points side).

    closed   'both'  → lo <= v <= hi   (default)
             'left'  → lo <= v <  hi
             'right' → lo <  v <= hi
             'neither' → lo < v < hi
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed={closed!r}")
    keys = list(keys)
    dup = (set(points.columns) & set(intervals.columns)) - set(keys)
    if dup:
        raise ValueError(f"colliding non-key columns: {sorted(dup)}")

    p_t = dict(zip(points.schema.names,
                   (f.dataType.simpleString()
                    for f in points.schema.fields)))[point_col]
    i_t = dict(zip(intervals.schema.names,
                   (f.dataType.simpleString()
                    for f in intervals.schema.fields)))[lo_col]
    p = points.withColumn(_V, _as_long(F.col(point_col), p_t))
    iv = (intervals
          .withColumn(_LO, _as_long(F.col(lo_col), i_t))
          .withColumn(_HI, _as_long(F.col(hi_col), i_t)))

    if bucket_width is None:
        # widest span ⇒ every interval covers ≤ 2 buckets; ONE scalar
        # driver fetch, deterministic (no sampling)
        row = iv.agg(F.max(F.col(_HI) - F.col(_LO)).alias("m")).first()
        bucket_width = max(int(row["m"] or 0) + 1, 1)
    w = int(bucket_width)

    iv_b = iv.withColumn(
        _BUCKET,
        F.explode(F.sequence(F.floor(F.col(_LO) / w),
                             F.floor(F.col(_HI) / w))))
    p_b = p.withColumn(_BUCKET, F.floor(F.col(_V) / w))

    lo_ok = (F.col(_LO) <= F.col(_V) if closed in ("both", "left")
             else F.col(_LO) < F.col(_V))
    hi_ok = (F.col(_V) <= F.col(_HI) if closed in ("both", "right")
             else F.col(_V) < F.col(_HI))
    if keys:
        ren = {k: f"_rj_{k}" for k in keys}
        ren[_BUCKET] = _BUCKET + "_i"
        iv_r = iv_b.withColumnsRenamed(ren)
        cond = [F.col(k) == F.col(f"_rj_{k}") for k in keys]
        cond.append(F.col(_BUCKET) == F.col(_BUCKET + "_i"))
        joined = p_b.join(iv_r, cond, "inner")
    else:
        joined = p_b.join(iv_b, on=[_BUCKET], how="inner")
    out = joined.filter(lo_ok & hi_ok)
    drop = [_BUCKET, _BUCKET + "_i", _V, _LO, _HI] \
        + [f"_rj_{k}" for k in keys]
    return out.drop(*[c for c in drop if c in out.columns])
