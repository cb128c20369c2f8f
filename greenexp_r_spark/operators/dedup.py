"""Deduplication operators for the training-data pipeline:
exact (hash-groupBy), MinHash+LSH, SimHash with nibble-block LSH.

Corpus: the driver's documents are all distinct, so dedup queries run
over an *augmented corpus* with deterministically planted duplicates —
exact copies (doc_id+1_000_000 for every 10th doc) and near-dups with
the last word dropped (doc_id+2_000_000 for every 7th doc).  The same
construction is embedded in the oracle SQL.

Scale notes:
  * exact dedup: one hash aggregate on a 64-bit content hash — the
    canonical 100 TB shape (shuffle carries (hash, id), never text).
  * MinHash-LSH: signatures are map-side array math; candidate
    generation is an equi-join on (band, band_hash) — no cross join
    anywhere; verification joins only candidate pairs' shingle sets.
  * SimHash: 16-bit signature; pigeonhole blocking on 4 nibbles turns
    hamming≤3 search into an equi-join too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import constants as C
from ..functions import text as T

EXACT_DUP_MOD = 10
NEAR_DUP_MOD = 7


def augmented_corpus(docs: DataFrame) -> DataFrame:
    """documents ∪ exact copies ∪ last-word-dropped near-dups."""
    base = docs.select("doc_id", "text")
    exact = (base.where(F.col("doc_id") % EXACT_DUP_MOD == 0)
             .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    # drop last word: substr(text, 1, len - instr(reverse(text), ' '))
    trimmed = F.expr(
        "substr(text, 1, length(text) - instr(reverse(text), ' '))")
    near = (base.where(F.col("doc_id") % NEAR_DUP_MOD == 0)
            .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                    trimmed.alias("text")))
    return base.unionByName(exact).unionByName(near)


def corpus_sql() -> str:
    """The identical corpus as a SQL fragment (both dialects)."""
    return f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
    WHERE doc_id % {EXACT_DUP_MOD} = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           substr(text, 1, length(text) - instr(reverse(text), ' ')) AS text
    FROM documents WHERE doc_id % {NEAR_DUP_MOD} = 0
    """


def exact_duplicates(corpus: DataFrame) -> DataFrame:
    """Exact dedup groups: (text → member doc_ids).  Emits one row per
    duplicated document: (dup_group_min, doc_id).  The group key is the
    minimum doc_id of the identical-text group (stable canonical
    representative), never the text itself — at scale the shuffle key
    is a 64-bit hash + the verify join."""
    groups = (corpus
              .groupBy("text")
              .agg(F.min("doc_id").alias("dup_group_min"),
                   F.count(F.lit(1)).alias("group_size"))
              .where(F.col("group_size") > 1))
    return (corpus.join(groups, "text")
            .select("dup_group_min", "doc_id", "group_size")
            .orderBy("dup_group_min", "doc_id"))


def _shingles(corpus: DataFrame) -> DataFrame:
    """Distinct word-bigram shingle hashes per doc (doc_id, sh)."""
    w = T.words(F.col("text"))
    e = (corpus.select("doc_id", w.alias("warr"))
         .where(F.size("warr") >= 2)
         .withColumn("pos",
                     F.explode(F.sequence(F.lit(1), F.size("warr") - 1))))
    wh1 = T.word_hash(F.element_at(F.col("warr"), F.col("pos").cast("int")))
    wh2 = T.word_hash(
        F.element_at(F.col("warr"), (F.col("pos") + 1).cast("int")))
    return (e.select("doc_id", T.shingle_hash(wh1, wh2).alias("sh"))
            .distinct())


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7): min over shingles of 8 affine permutations."""
    sh = _shingles(corpus)
    aggs = [F.min(T.minhash(F.col("sh"), a, b)).alias(f"mh{j}")
            for j, (a, b) in enumerate(C.MINHASH_PERMS)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(corpus: DataFrame,
                      jaccard_threshold: float = C.JACCARD_THRESHOLD
                      ) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact Jaccard verify.

    Plan: signatures → explode to (band, h1, h2) keys → self equi-join
    on the band key → distinct candidate pairs → join each side's
    shingle set → |∩| vs set sizes → Jaccard filter.
    Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    sh = _shingles(corpus).persist()
    aggs = [F.min(T.minhash(F.col("sh"), a, b)).alias(f"mh{j}")
            for j, (a, b) in enumerate(C.MINHASH_PERMS)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    n_bands = len(C.MINHASH_PERMS) // C.MINHASH_BAND_ROWS
    # single-pass banding: posexplode of a struct array (a union of
    # per-band selects would recompute the signature aggregate per band)
    band_arr = F.array(*[
        F.struct(F.col(f"mh{2 * b}").alias("h1"),
                 F.col(f"mh{2 * b + 1}").alias("h2"))
        for b in range(n_bands)])
    bands = sig.select(
        "doc_id", F.posexplode(band_arr).alias("band", "hs")
    ).select("doc_id", "band", F.col("hs.h1").alias("h1"),
             F.col("hs.h2").alias("h2"))
    l = bands.select(F.col("doc_id").alias("doc_a"), "band", "h1", "h2")
    r = bands.select(F.col("doc_id").alias("doc_b"), "band", "h1", "h2")
    cand = (l.join(r, ["band", "h1", "h2"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (cand
             .join(sh.select(F.col("doc_id").alias("doc_a"),
                             F.col("sh").alias("sa")), "doc_a")
             .join(sh.select(F.col("doc_id").alias("doc_b"),
                             F.col("sh").alias("sb")), "doc_b")
             .where(F.col("sa") == F.col("sb"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    out = (inter
           .join(sizes.select(F.col("doc_id").alias("doc_a"),
                              F.col("n_sh").alias("na")), "doc_a")
           .join(sizes.select(F.col("doc_id").alias("doc_b"),
                              F.col("n_sh").alias("nb")), "doc_b"))
    jac = (F.col("n_inter").cast("double")
           / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"))
    return (out.select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= jaccard_threshold))


def simhash_signatures(corpus: DataFrame,
                       bits: int = C.SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): per bit, majority vote over shingle hashes."""
    sh = _shingles(corpus)
    sums = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[F.sum(F.when(F.shiftright(F.col("sh"), b).bitwiseAND(1) == 1, 1)
                .otherwise(0)).alias(f"c{b}") for b in range(bits)])
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"c{b}") * 2 > F.col("n_sh"),
                     F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_pairs(corpus: DataFrame,
                  max_hamming: int = C.SIMHASH_MAX_HAMMING) -> DataFrame:
    """Pairs with simhash hamming distance ≤ 3, found by pigeonhole
    nibble blocking (a pair differing in ≤3 of 32 bits damages ≤3 of
    the 8 nibbles, so it must agree on ≥1) — equi-join, no cross join.
    Output: (doc_a, doc_b, hamming)."""
    sig = simhash_signatures(corpus)
    # single-pass nibble explosion (union-of-selects would recompute
    # the signature aggregate once per nibble)
    nib_arr = F.array(*[
        F.shiftright(F.col("simhash"), 4 * k).bitwiseAND(15)
        for k in range(C.SIMHASH_BLOCKS)])
    nib = sig.select("doc_id", "simhash",
                     F.posexplode(nib_arr).alias("nk", "nv"))
    l = nib.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("sim_a"), "nk", "nv")
    r = nib.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("sim_b"), "nk", "nv")
    cand = (l.join(r, ["nk", "nv"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sim_a", "sim_b").distinct())
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.select("doc_a", "doc_b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
