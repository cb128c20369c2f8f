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
# the shared portable multi-hash family (constants.AFFINE_ROWS) on
# the word hash, mod P31 then mod w — odd multipliers, pairwise
# distinct, small enough that wh * a stays far inside BIGINT
CMS_ROWS = C.AFFINE_ROWS


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
    # checkpoint the (d×w ≤ 8k rows) sketch: it feeds both the
    # candidate estimate and the N derivation, and every CMS row's
    # counters sum to the total token count — so N comes free from
    # row 0 instead of a second full explode+count corpus scan
    sketch = cms_build(docs, d, w).localCheckpoint(eager=True)
    toks = (docs.select(F.explode(T.words(F.col("text")))
                        .alias("term"))
            .where(F.length("term") > 0))
    n = (sketch.where(F.col("j") == 0)
         .agg(F.sum("counter")).first()[0]) or 0
    thresh = (phi_ppm * n) // 1_000_000
    cand = (cms_estimate(toks.distinct(), sketch, d, w)
            .where(F.col("est") >= thresh))
    exact = (toks.join(F.broadcast(cand.select("term")), "term")
             .groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    return (exact.join(F.broadcast(cand), "term")
            .where(F.col("cnt") >= thresh)
            .select("term", "cnt", "est"))


# ----------------------------------------------------------------- HLL
# HyperLogLog distinct-count over the same portability doctrine: the
# register table (register → max rank) is pure integer arithmetic on
# the 31-bit Horner key hash — groupBy + MAX, bit-exact in DuckDB and
# cellwise-max mergeable across corpus increments.  Only the final
# scalar estimate involves floats, and it is computed DRIVER-side
# from the collected (m-row) register table, so engine float-sum
# ordering never enters.  (Spark's own approx_count_distinct is this
# sketch JVM-side; this one you can persist, merge, and replay.)

HLL_B = 10                     # 2^10 = 1024 registers
HLL_M = 1 << HLL_B
# rank window: the key hash is < P31 (31 bits); after % m the
# quotient fits in 21 bits
HLL_WBITS = 21


def hll_registers(docs: DataFrame, col: str = "term",
                  pre_exploded: bool = False) -> DataFrame:
    """(register, max_rank) over the distinct values of ``col`` (by
    construction — duplicates collapse inside MAX).  One explode +
    one map-side-combinable MAX aggregate, ≤ m rows out per task."""
    from .bloom import key_hash
    toks = docs if pre_exploded else (
        docs.select(F.explode(T.words(F.col("text"))).alias(col))
            .where(F.length(col) > 0))
    h = key_hash(F.col(col))
    reg = (h % HLL_M).alias("register")
    w = F.floor(h / HLL_M).cast("long")
    # rank = leading zeros of w in a 21-bit window, + 1;
    # bit_length(w) = length(bin(w)) for w > 0 in BOTH engines
    rank = (F.when(w > 0, HLL_WBITS + 1 - F.length(F.bin(w)))
            .otherwise(HLL_WBITS + 1)).cast("long")
    return (toks.select(reg, rank.alias("rank"))
            .groupBy("register")
            .agg(F.max("rank").cast("long").alias("max_rank")))


def hll_estimate(registers) -> float:
    """Scalar HLL estimate from a collected register table (list of
    Rows or (register, max_rank) pairs) — standard bias-corrected
    harmonic mean with the small-range linear-counting correction."""
    import math
    regs = [0] * HLL_M
    for r in registers:
        try:
            reg, rank = r["register"], r["max_rank"]
        except (TypeError, KeyError):
            reg, rank = r
        regs[int(reg)] = int(rank)
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -x for x in regs)
    e = alpha * m * m / s
    zeros = regs.count(0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


def hll_sql(d_, table: str = "documents") -> str:
    """DuckDB rendering of :func:`hll_registers` (bit-exact)."""
    from .bloom import key_hash_sql
    wr = d_.split("text")
    base = f"SELECT {wr} AS warr FROM {table}"
    exploded = d_.explode_range(base, "p", "1", d_.asize("warr"))
    kh = key_hash_sql("term")
    return f"""
WITH toks AS (
  SELECT {d_.elem('warr', 'p')} AS term
  FROM ({exploded}) _w
  WHERE length({d_.elem('warr', 'p')}) > 0
),
keyed AS (
  SELECT CAST(h % {HLL_M} AS BIGINT) AS register,
         CAST(h // {HLL_M} AS BIGINT) AS w
  FROM (SELECT CAST({kh} AS BIGINT) AS h FROM toks) _h
)
SELECT register,
       CAST(MAX(CASE WHEN w > 0
                     THEN {HLL_WBITS} + 1 - length(bin(w))
                     ELSE {HLL_WBITS} + 1 END) AS BIGINT) AS max_rank
FROM keyed GROUP BY register
"""


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
