"""Count-min sketch over the corpus vocabulary + heavy hitters.

At 100 TB you cannot afford (and rarely need) the exact term→count
table: the CMS compresses it to a fixed d×w counter grid that is
(a) mergeable — per-task partial grids sum, so the shuffle carries at
most d×w rows per task regardless of corpus size — and (b) one-sided:
estimates never undercount, so a heavy-hitter scan over the sketch is
guaranteed to RECALL every true heavy hitter (precision is then
restored by one exact count over the candidate set only — the same
bounded-verify shape as the LSH dedup family).

Determinism is the point of this implementation: the d hash rows are
fixed affine maps of the repo's portable word hash (multiply-add mod
2^31-1, then mod w), so the ENTIRE sketch is integer arithmetic that
DuckDB replays bit-for-bit (tests/test_sketch.py) — a sketch you can
hash-compare across engines, resume across reruns, and union across
corpus increments.

Error contract (Cormode & Muthukrishnan 2005): est(t) >= true(t)
always; est(t) <= true(t) + eps·N with prob 1-delta for w = ceil(e/
eps), d = ceil(ln 1/delta).  The recall guarantee needs only the
one-sided bound, so it holds deterministically.

Reference analog: none in GreenExp_R (LLM-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import constants as C
from ..functions import text as T

CMS_D = 4                      # hash rows
CMS_W = 2048                   # counters per row
# fixed affine maps (a_j, b_j) on the word hash, mod P31 then mod w —
# odd multipliers, pairwise distinct; portability doctrine: small
# enough that wh * a stays far inside BIGINT
CMS_ROWS = ((40503, 17), (48271, 101), (69621, 257), (16807, 911))


def _bucket(wh: F.Column, j: int, w: int) -> F.Column:
    a, b = CMS_ROWS[j]
    return ((wh * a + b) % C.P31) % w


def _bucket_sql(wh: str, j: int, w: int) -> str:
    a, b = CMS_ROWS[j]
    return f"(((({wh}) * {a} + {b}) % {C.P31}) % {w})"


def cms_build(docs: DataFrame, d: int = CMS_D,
              w: int = CMS_W) -> DataFrame:
    """The sketch as a (j, bucket, counter) table — at most d×w rows
    total, reached through ONE map-side-combinable aggregate (each
    token contributes d (j, bucket) pairs via a literal-array
    posexplode; no per-row Python)."""
    wh = T.word_hash(F.col("term"))
    pairs = F.array(*[_bucket(wh, j, w) for j in range(d)])
    toks = (docs.select(F.explode(T.words(F.col("text")))
                        .alias("term"))
            .where(F.length("term") > 0))
    return (toks.select(F.posexplode(pairs).alias("j", "bucket"))
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("counter")))


def cms_estimate(terms: DataFrame, sketch: DataFrame,
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(term, est) for every row of ``terms`` — the min over the d
    counter cells.  The sketch is d×w rows: ALWAYS broadcast."""
    wh = T.word_hash(F.col("term"))
    keyed = terms.select(
        "term", F.posexplode(
            F.array(*[_bucket(wh, j, w) for j in range(d)]))
        .alias("j", "bucket"))
    return (keyed.join(F.broadcast(sketch), ["j", "bucket"], "left")
            .groupBy("term")
            .agg(F.min(F.coalesce("counter", F.lit(0)))
                 .cast("long").alias("est")))


def heavy_hitters(docs: DataFrame, phi_ppm: int = 2000,
                  d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Terms with true frequency >= phi_ppm·N/1e6 → (term, cnt, est).

    Two bounded passes: the sketch scan nominates candidates (one-
    sided ⇒ no true heavy hitter can be missed), then ONE exact count
    restricted to candidate terms (a broadcast semi-join) removes the
    false positives.  Never materializes the full vocabulary counts.
    """
    sketch = cms_build(docs, d, w)
    toks = (docs.select(F.explode(T.words(F.col("text")))
                        .alias("term"))
            .where(F.length("term") > 0))
    n = toks.count()
    thresh = (phi_ppm * n) // 1_000_000
    cand = (cms_estimate(toks.distinct(), sketch, d, w)
            .where(F.col("est") >= thresh))
    exact = (toks.join(F.broadcast(cand.select("term")), "term")
             .groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    return (exact.join(F.broadcast(cand), "term")
            .where(F.col("cnt") >= thresh)
            .select("term", "cnt", "est"))


# ------------------------------------------------------------- oracles

def cms_sql(d_, d: int = CMS_D, w: int = CMS_W,
            table: str = "documents") -> str:
    """DuckDB rendering of :func:`cms_build` (bit-exact)."""
    wr = d_.split("text")
    base = f"SELECT {wr} AS warr FROM {table}"
    exploded = d_.explode_range(base, "p", "1", d_.asize("warr"))
    wh = T.word_hash_sql("term")
    cases = " ".join(
        f"WHEN {j} THEN {_bucket_sql('twh', j, w)}" for j in range(d))
    return f"""
WITH toks AS (
  SELECT {d_.elem('warr', 'p')} AS term
  FROM ({exploded}) _w
  WHERE length({d_.elem('warr', 'p')}) > 0
),
keyed AS (
  SELECT j, CASE j {cases} END AS bucket
  FROM (SELECT CAST({wh} AS BIGINT) AS twh FROM toks) _t,
       (SELECT unnest(generate_series(0, {d - 1})) AS j) _j
)
SELECT CAST(j AS INT) AS j, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS counter
FROM keyed GROUP BY j, bucket
"""
