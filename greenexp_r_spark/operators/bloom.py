"""Portable Bloom filter + map-side semi-join pruning.

THE join optimization at 100 TB: when a huge fact table joins a
key set that is small-ish but too large (or too remote) to broadcast
as an exact hash table, ship a Bloom filter of the keys instead and
drop non-matching rows AT THE SCAN — a pure projection, zero shuffle,
no false negatives.  Spark's own runtime row-group pruning uses the
same idea (``spark.sql.optimizer.runtime.bloomFilter``); this is the
explicit, engine-portable version the pipeline can persist next to a
corpus increment (e.g. "keys already deduped") and reuse across runs.

Portability doctrine: k fixed affine maps of a 16-char Horner key
hash set bit p = h_j(key) mod m; words are BIGINTs with **62 usable lanes**
(DuckDB raises on ``1::BIGINT << 63`` where Java wraps — lane 62 is
the highest both engines agree on), so the filter's word table and
every membership verdict are bit-identical across Spark and DuckDB
(tests/test_bloom.py).

Scale notes: the built filter is ≤ m/62 BIGINT rows (8 KB at the
default m) — collected once and embedded as a literal array, the
membership test is whole-stage-codegen ``element_at & mask`` per
hash, no join at all.  For filters past literal-array comfort
(~10^7 bits) the same word table broadcast-joins on word_idx instead;
the bit math is unchanged.

Reference analog: none in GreenExp_R (LLM-pipeline brief); classic
Bloom 1970 + the broadcast-bloom join-pruning pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .. import constants as C

BLOOM_LANES = 62               # usable bits per BIGINT word
BLOOM_WORDS = 1024             # default filter: 63,488 bits
BLOOM_K = 4
# the shared portable multi-hash family (one source of truth with
# sketch.CMS_ROWS)
BLOOM_ROWS = C.AFFINE_ROWS


BLOOM_HASH_LEN = 16            # Horner prefix length
BLOOM_HASH_MUL = 131


def key_hash(key: Column) -> Column:
    """Portable Bloom key hash: Horner chain over the first 16 chars
    (rpad-truncated — Spark and DuckDB agree) plus the length.  Base
    131 > any ASCII code point, so equal-length keys under 17 chars
    collide only through the mod — the repo's 2-char word_hash is
    deliberately weak (its users verify exactly afterwards) and would
    sink a Bloom filter's fp rate; this one is fixed-depth codegen,
    no HOF."""
    padded = F.rpad(key, BLOOM_HASH_LEN, "_")
    h = F.lit(0).cast("long")
    for i in range(BLOOM_HASH_LEN):
        h = (h * BLOOM_HASH_MUL
             + F.ascii(F.substring(padded, i + 1, 1))) % C.P31
    return (h * BLOOM_HASH_MUL + F.length(key)) % C.P31


def key_hash_sql(key: str) -> str:
    padded = f"rpad({key}, {BLOOM_HASH_LEN}, '_')"
    # seed BIGINT (the substrdup.py lesson: DuckDB infers INT32 from
    # ascii() and the Horner chain overflows at runtime otherwise)
    h = "CAST(0 AS BIGINT)"
    for i in range(BLOOM_HASH_LEN):
        h = (f"(({h}) * {BLOOM_HASH_MUL}"
             f" + ascii(substr({padded}, {i + 1}, 1))) % {C.P31}")
    return f"((({h}) * {BLOOM_HASH_MUL} + length({key})) % {C.P31})"


def _m_bits(m_words: int) -> int:
    return m_words * BLOOM_LANES


def _pos(kh: Column, j: int, m_words: int) -> Column:
    a, b = BLOOM_ROWS[j]
    return ((kh * a + b) % C.P31) % _m_bits(m_words)


def _pos_sql(kh: str, j: int, m_words: int) -> str:
    a, b = BLOOM_ROWS[j]
    return f"(((({kh}) * {a} + {b}) % {C.P31}) % {_m_bits(m_words)})"


def _pow2() -> Column:
    """Literal [1, 2, 4, ..., 2^61] — lane→mask lookup (pyspark's
    shiftleft only takes a literal shift amount, so the mask comes
    from element_at instead; the values are exact integers either
    way, which is all cross-engine parity needs)."""
    return F.array(*[F.lit(1 << i).cast("long")
                     for i in range(BLOOM_LANES)])


def _mask(p: Column) -> Column:
    return F.element_at(_pow2(),
                        (p % BLOOM_LANES).cast("int") + F.lit(1))


def bloom_build(keys: DataFrame, key_col: str = "term",
                m_words: int = BLOOM_WORDS,
                k: int = BLOOM_K) -> DataFrame:
    """(word_idx, bits) — ≤ m_words rows, one map-side-combinable
    bit_or aggregate; ``key_col`` must be a string column (hashed with
    :func:`key_hash`)."""
    kh = key_hash(F.col(key_col))
    pairs = F.array(*[_pos(kh, j, m_words) for j in range(k)])
    pos = (keys.where(F.col(key_col).isNotNull())
           .select(F.explode(pairs).alias("p")))
    return (pos.select(
        F.floor(F.col("p") / BLOOM_LANES).cast("long")
        .alias("word_idx"),
        _mask(F.col("p")).alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits")))


def bloom_member(bloom: DataFrame, key_col: str = "term",
                 m_words: int = BLOOM_WORDS,
                 k: int = BLOOM_K) -> Column:
    """Boolean membership column usable in any projection/filter over
    a DataFrame carrying ``key_col`` — ZERO shuffle: the word table is
    collected once (≤ m_words longs) into a literal array and each
    hash probes it with element_at inside codegen."""
    rows = {r["word_idx"]: r["bits"] for r in bloom.collect()}
    words = F.array(*[F.lit(int(rows.get(i, 0))).cast("long")
                      for i in range(m_words)])
    kh = key_hash(F.col(key_col))
    cond = F.lit(True)
    for j in range(k):
        p = _pos(kh, j, m_words)
        w = F.element_at(
            words, (F.floor(p / BLOOM_LANES) + 1).cast("int"))
        cond = cond & (w.bitwiseAND(_mask(p)) != 0)
    return cond


def bloom_semi_join(df: DataFrame, bloom: DataFrame,
                    key_col: str = "term",
                    m_words: int = BLOOM_WORDS,
                    k: int = BLOOM_K) -> DataFrame:
    """Rows of ``df`` whose key MAY be in the filter (superset of the
    exact semi-join: no false negatives, fp rate ≈ (1-e^{-kn/m})^k).
    The standard use composes an exact verify after it, on the
    surviving sliver only."""
    return df.where(bloom_member(bloom, key_col, m_words, k))


# ------------------------------------------------------------- oracles

def bloom_sql(d, keys_query: str, key: str = "term",
              m_words: int = BLOOM_WORDS, k: int = BLOOM_K) -> str:
    """DuckDB rendering of :func:`bloom_build` over ``keys_query``
    (a query producing a ``key`` column)."""
    kh = key_hash_sql(key)
    cases = " ".join(
        f"WHEN {j} THEN {_pos_sql('kh', j, m_words)}"
        for j in range(k))
    return f"""
WITH ks AS (SELECT CAST({kh} AS BIGINT) AS kh FROM ({keys_query}) _k),
pos AS (
  SELECT CASE j {cases} END AS p
  FROM ks, (SELECT unnest(generate_series(0, {k - 1})) AS j) _j
)
SELECT CAST({d.idiv('p', str(BLOOM_LANES))} AS BIGINT) AS word_idx,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % {BLOOM_LANES} AS INT))
            AS BIGINT) AS bits
FROM pos GROUP BY word_idx
"""


def member_sql(d, keys_query: str, probe_query: str,
               key: str = "term", m_words: int = BLOOM_WORDS,
               k: int = BLOOM_K) -> str:
    """DuckDB rendering of per-row membership verdicts over
    ``probe_query`` (columns: the key + anything else; output adds
    ``may_match``) — join-based replay of the literal-array probe."""
    kh = key_hash_sql(key)
    checks = []
    for j in range(k):
        p = _pos_sql("kh", j, m_words)
        w = d.idiv(f"({p})", str(BLOOM_LANES))
        m = f"(CAST(1 AS BIGINT) << CAST(({p}) % {BLOOM_LANES} AS INT))"
        checks.append(
            f"COALESCE((SELECT bits FROM bloom b WHERE b.word_idx = "
            f"({w})), 0) & {m} <> 0")
    return f"""
WITH bloom AS ({bloom_sql(d, keys_query, key, m_words, k)})
SELECT {key},
       ({' AND '.join(checks)}) AS may_match
FROM (SELECT {key}, CAST({kh} AS BIGINT) AS kh
      FROM ({probe_query}) _p) _q
"""
