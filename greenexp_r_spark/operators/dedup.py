"""Deduplication operators for the training-data pipeline:
exact (hash-first groupBy), MinHash+LSH, SimHash with block LSH.

Corpus: the driver's documents are all distinct, so dedup queries run
over an *augmented corpus* with deterministically planted duplicates —
exact copies (doc_id+1_000_000 for every 10th doc) and near-dups with
the last word dropped (doc_id+2_000_000 for every 7th doc).  The same
construction is embedded in the oracle SQL.

Scale notes (the 100 TB shapes):
  * exact dedup is two-phase: phase 1 shuffles only (xxhash64(text),
    doc_id) to find candidate hash groups; phase 2 semi-joins the
    corpus down to those candidates and groups the *surviving slice*
    by text (exact — collisions can't merge distinct texts).  Full
    documents are never shuffled corpus-wide.
  * MinHash signatures are 100% row-local: the distinct shingle set
    and all 8 permutation mins are array expressions (array_distinct /
    transform / array_min) — zero shuffle before the band stage.
    Candidate generation is an equi-join on (band, h1, h2); the exact
    Jaccard verify joins shingle arrays for candidate pairs only and
    compares them row-locally with array_intersect.
  * SimHash signatures are row-local too (per-bit majority via
    size(filter(sh_arr, ...))).  60-bit signature, pigeonhole blocking
    on 4 × 15-bit blocks: a pair within hamming ≤ 3 damages ≤ 3
    blocks, so it must agree on ≥ 1 — an equi-join with a 32_768-value
    keyspace per block (vs 16 for the round-1 nibble scheme, whose
    n/16-sized buckets made candidate volume quadratic in the corpus).
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
    """Exact dedup groups: one row per duplicated document,
    (dup_group_min, doc_id, group_size), group key = min doc_id of the
    identical-text group.

    Two-phase hash-first plan: the corpus-wide shuffle carries only
    (xxhash64(text), doc_id); full text is shuffled solely for the
    candidate slice whose hash repeats (the actual duplicates), where
    the exact text groupBy settles collisions.
    """
    hashed = corpus.select("doc_id", "text",
                           F.xxhash64("text").alias("h"))
    cand_h = (hashed.groupBy("h")
              .agg(F.count(F.lit(1)).alias("n"))
              .where(F.col("n") > 1)
              .select("h"))
    slice_ = hashed.join(cand_h, "h", "left_semi")
    groups = (slice_
              .groupBy("text")
              .agg(F.min("doc_id").alias("dup_group_min"),
                   F.count(F.lit(1)).alias("group_size"))
              .where(F.col("group_size") > 1))
    return (slice_.join(groups, "text")
            .select("dup_group_min", "doc_id", "group_size"))


def word_hashes_np(text: str):
    """int64 word-hash array for one document — the numpy twin of
    functions.text.word_hash over split(' ') (empties kept): wh =
    ascii(first char of w||'_')·P1 + ascii(second char of w||'_')·P2 +
    len(w).  Byte-vectorized for ASCII; per-word ord() fallback for
    non-ASCII (Spark ascii() is codepoint-of-first-char and length()
    is chars, not bytes)."""
    import numpy as np
    try:
        b = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    except UnicodeEncodeError:
        ws = text.split(" ")
        return np.array(
            [ord((w + "_")[0]) * C.WORDHASH_P1
             + (ord((w + "_")[1]) if len(w + "_") >= 2 else 0)
             * C.WORDHASH_P2 + len(w) for w in ws], dtype=np.int64)
    sp = np.flatnonzero(b == 32)
    starts = np.empty(len(sp) + 1, dtype=np.int64)
    starts[0] = 0
    starts[1:] = sp + 1
    ends = np.empty(len(sp) + 1, dtype=np.int64)
    ends[:-1] = sp
    ends[-1] = len(b)
    lens = ends - starts
    safe = max(len(b) - 1, 0)
    i1 = np.minimum(starts, safe)
    i2 = np.minimum(starts + 1, safe)
    bb = b if len(b) else np.zeros(1, dtype=np.uint8)
    c1 = np.where(lens >= 1, bb[i1], 95).astype(np.int64)
    c2 = np.where(lens >= 2, bb[i2],
                  np.where(lens == 1, 95, 0)).astype(np.int64)
    return c1 * C.WORDHASH_P1 + c2 * C.WORDHASH_P2 + lens


def _doc_shingles_np(text: str):
    """One document's word-bigram shingle stream (pre-distinct):
    shingle = (wh_i·MUL + wh_{i+1}) mod P31 over `word_hashes_np`.
    Returns None when the doc has < 2 words."""
    wh = word_hashes_np(text)
    if len(wh) < 2:
        return None
    return (wh[:-1] * C.SHINGLE_MUL + wh[1:]) % C.P31


def shingle_arrays(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh_arr): the distinct word-bigram shingle hash set per
    document as a row-local array — zero shuffle.

    r6: one Arrow-batched numpy pass (`_doc_shingles_np`) instead of
    the JVM sequence/transform/element_at expression tree — HOF
    lambdas are interpreted (no codegen) and this was the single
    biggest cost inside every dedup query (4.8 s per compute at
    sf1.0, recomputed by each of the four q_dedup_neardup arms).
    Distinct keeps FIRST-OCCURRENCE order (pd.unique), matching
    array_distinct exactly."""
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (ArrayType, LongType, StructField,
                                   StructType)

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("sh_arr", ArrayType(LongType()))])

    def shingle(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, arrs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                sh = _doc_shingles_np(text)
                if sh is None:
                    continue
                ids.append(doc_id)
                arrs.append(pd.unique(sh))
            if not ids:
                continue      # an all-short-docs batch: empty typed
                              # frames trip Arrow's NumPyConverter
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "sh_arr": pd.Series(arrs,
                                                    dtype="object")})

    from ..plans.widen import widen
    # several sequential dedup-arm jobs re-read the persisted result:
    # size tasks at ~512 KB of source so scheduling overhead stays
    # small (A/B: q_dedup_neardup 4.6 s vs 5.3 s at sf1.0)
    return widen(corpus.select("doc_id", "text"),
                 bytes_per_task=512 * 1024) \
        .mapInPandas(shingle, schema)


def shingle_table(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh_arr, mh0..mh7, simhash) in ONE Arrow pass — the
    shingle stream is already flattened per batch, so the MinHash
    permutation mins and the per-bit SimHash majorities ride the same
    reduceat sweep instead of two more Python round trips over the
    persisted array table (r6: the dedup union ran 4 passes)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (ArrayType, LongType, StructField,
                                   StructType)

    schema = StructType(
        [StructField("doc_id", LongType()),
         StructField("sh_arr", ArrayType(LongType()))]
        + [StructField(f"mh{j}", LongType())
           for j in range(len(C.MINHASH_PERMS))]
        + [StructField("simhash", LongType())])
    bit_perms = C.SIMHASH_BIT_PERMS[:C.SIMHASH_BITS]

    def kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, arrs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                sh = _doc_shingles_np(text)
                if sh is None:
                    continue
                ids.append(doc_id)
                arrs.append(pd.unique(sh))
            if not ids:
                continue
            sizes = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                                count=len(arrs))
            flat = np.concatenate(arrs)
            offs = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            out = {"doc_id": pd.Series(ids, dtype="int64"),
                   "sh_arr": pd.Series(arrs, dtype="object")}
            for j, (a, b) in enumerate(C.MINHASH_PERMS):
                out[f"mh{j}"] = np.minimum.reduceat(
                    (flat * a + b) % C.P31, offs)
            sim = np.zeros(len(arrs), dtype=np.int64)
            for bnum, (a, bb) in enumerate(bit_perms):
                ones = ((flat * a + bb) % C.P31) & 1
                cb = np.add.reduceat(ones, offs)
                sim += np.where(cb * 2 > sizes,
                                np.int64(1) << bnum, 0)
            out["simhash"] = sim
            yield pd.DataFrame(out)

    from ..plans.widen import widen
    return widen(corpus.select("doc_id", "text"),
                 bytes_per_task=512 * 1024) \
        .mapInPandas(kern, schema)


def _flat_shingles(pdf):
    """Flatten a batch's shingle arrays → (flat int64 array, doc
    offsets for np.*.reduceat, per-doc sizes)."""
    import numpy as np
    arrs = pdf["sh_arr"].to_numpy()
    sizes = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                        count=len(arrs))
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrs]) \
        if len(arrs) else np.empty(0, dtype=np.int64)
    offs = np.zeros(len(arrs), dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    return flat, offs, sizes


def minhash_signatures_from_arrays(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7): min over shingles of 8 affine permutations.

    The mins are one Arrow-batched numpy pass (affine transform on the
    flattened shingle stream + minimum.reduceat per doc) — round-2
    lesson: per-element higher-order-function lambdas are interpreted
    on the JVM (no codegen), ~5× slower than the vectorized batch.
    Same integer formula as the SQL oracle ((sh·a + b) mod 2³¹−1, all
    products < 2⁶², exact in int64).  Still zero-shuffle: mapInPandas
    is a narrow map over the row-local shingle arrays.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType())]
        + [StructField(f"mh{j}", LongType())
           for j in range(len(C.MINHASH_PERMS))])

    def sig(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            flat, offs, _ = _flat_shingles(pdf)
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for j, (a, b) in enumerate(C.MINHASH_PERMS):
                h = (flat * a + b) % C.P31
                out[f"mh{j}"] = np.minimum.reduceat(h, offs)
            yield pd.DataFrame(out)

    return sh.mapInPandas(sig, schema)


def char_shingle_arrays(corpus: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh_arr): distinct char n-gram hash set per document —
    the character-level dedup representation for text without reliable
    word boundaries (CJK, concatenated tokens, minified markup) where
    word-bigram shingles under-segment.  Row-local JVM expressions
    (sequence → transform → xxhash64(substring)), zero shuffle, and
    the SAME array shape as shingle_arrays, so the whole MinHash-LSH
    machinery (signatures, banding, exact-Jaccard verify) reuses it
    through the `shingler` parameter."""
    sh = F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(length(text) - {n - 1}, 0)), "
        f"i -> pmod(xxhash64(substring(text, i, {n})), {C.P31})))")
    return (corpus.select("doc_id", sh.alias("sh_arr"))
            .where(F.size("sh_arr") >= 1))


def ngram_jaccard_pairs(corpus: DataFrame, n: int = 3,
                        jaccard_threshold: float = C.JACCARD_THRESHOLD
                        ) -> DataFrame:
    """Char n-gram Jaccard near-dup pairs: identical plan shape to the
    word-shingle minhash_lsh_pairs — candidates from banded MinHash
    over the n-gram sets, then EXACT n-gram Jaccard verification.
    Completeness vs exhaustive all-pairs Jaccard is asserted on the
    dup fixture in tests/test_round4_ops.py."""
    return minhash_lsh_pairs(corpus, jaccard_threshold,
                             shingler=lambda c: char_shingle_arrays(c, n))


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    return minhash_signatures_from_arrays(shingle_arrays(corpus))


# Above this corpus size the bucket-local routes (collect_list of one
# band bucket's member arrays in a single aggregation buffer) risk an
# oversized task on a pathological bucket; route back to the banded
# equi-join + join-attached verify.
DEDUP_BUCKET_MAX = 2_000_000


def _group_pair_counts(arrs, ids):
    """Exact pairwise set-intersection counts for one bucket.

    arrs: list of distinct-element int64 arrays (one per member, in
    `ids` order).  Returns (ia, ib, inter, lens): member-index pairs
    with ib < ia, their intersection sizes, and per-member set sizes.
    Fully vectorized: group the flattened (member, element) stream by
    element, enumerate all within-group index pairs with the
    prefix-range trick, then count identical pairs.  Each member's
    array is distinct, so pair multiplicity == |A∩B| exactly."""
    import numpy as np
    K = len(arrs)
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=K)
    mem = np.repeat(np.arange(K, dtype=np.int64), lens)
    flat = np.concatenate(arrs) if K else np.empty(0, dtype=np.int64)
    so = np.lexsort((mem, flat))
    g = flat[so]
    m = mem[so]
    if not len(g):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), lens)
    new = np.empty(len(g), dtype=bool)
    new[0] = True
    new[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(new)
    gid = np.cumsum(new) - 1
    r = np.arange(len(g)) - starts[gid]
    P = int(r.sum())
    if P == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), lens)
    a = np.repeat(m, r)
    out_idx = (np.arange(P) - np.repeat(np.cumsum(r) - r, r)
               + np.repeat(starts[gid], r))
    b = m[out_idx]                      # b < a (secondary sort is mem)
    uk, cnt = np.unique(a * K + b, return_counts=True)
    return uk // K, uk % K, cnt, lens


def _signatures_with_arrays(sh: DataFrame) -> DataFrame:
    """minhash_signatures_from_arrays + the sh_arr column riding
    along, so band buckets can be built self-contained (no verify
    join later)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (ArrayType, LongType, StructField,
                                   StructType)

    schema = StructType(
        [StructField("doc_id", LongType())]
        + [StructField(f"mh{j}", LongType())
           for j in range(len(C.MINHASH_PERMS))]
        + [StructField("sh_arr", ArrayType(LongType()))])

    def sig(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            flat, offs, _ = _flat_shingles(pdf)
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for j, (a, b) in enumerate(C.MINHASH_PERMS):
                h = (flat * a + b) % C.P31
                out[f"mh{j}"] = np.minimum.reduceat(h, offs)
            out["sh_arr"] = pdf["sh_arr"]
            yield pd.DataFrame(out)

    return sh.mapInPandas(sig, schema)


def _minhash_pairs_bucketed(sh: DataFrame,
                            jaccard_threshold: float) -> DataFrame:
    """Bucket-local exact-Jaccard verify: every (band, h1, h2) bucket
    arrives as a self-contained collect_list of (doc_id, sh_arr)
    members, and only verified pairs ≥ threshold leave Python.  At
    sf1.0 the joined route materialized 6.5M distinct candidate-pair
    rows through a self-join + distinct + two array-attaching joins;
    here the only corpus-sized shuffle is the band groupBy (each
    doc's array rides once per band).  Semantics identical: a pair is
    emitted iff it shares ≥1 band key AND exact shingle-set Jaccard ≥
    threshold (hash-collision buckets yield jac 0 and drop in both
    routes)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    bands = _band_keys_with_arrays(sh)
    buckets = (bands.groupBy("band", "h1", "h2")
               .agg(F.collect_list(F.struct("doc_id", "sh_arr"))
                    .alias("members"))
               .where(F.size("members") >= 2))
    schema = StructType([
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("jaccard", DoubleType()),
    ])

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            oa, ob, oj = [], [], []
            for members in pdf["members"]:
                ids = np.array([m["doc_id"] for m in members],
                               dtype=np.int64)
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                arrs = [np.asarray(members[o]["sh_arr"], dtype=np.int64)
                        for o in order]
                ia, ib, inter, lens = _group_pair_counts(arrs, ids)
                if not len(ia):
                    continue
                jac = inter / (lens[ia] + lens[ib] - inter)
                keep = jac >= jaccard_threshold
                # members sorted by doc_id and ib < ia → doc_a < doc_b
                oa.extend(ids[ib[keep]])
                ob.extend(ids[ia[keep]])
                oj.extend(jac[keep])
            yield pd.DataFrame({"doc_a": pd.Series(oa, dtype="int64"),
                                "doc_b": pd.Series(ob, dtype="int64"),
                                "jaccard": pd.Series(oj,
                                                     dtype="float64")})

    return buckets.mapInPandas(verify, schema).distinct()


def _band_keys_with_arrays(sh: DataFrame) -> DataFrame:
    """(doc_id, band, h1, h2, sh_arr) — band keys with the shingle
    array carried through the explode."""
    sig = sh if "mh0" in sh.columns else _signatures_with_arrays(sh)
    n_bands = len(C.MINHASH_PERMS) // C.MINHASH_BAND_ROWS
    band_arr = F.array(*[
        F.struct(F.col(f"mh{2 * b}").alias("h1"),
                 F.col(f"mh{2 * b + 1}").alias("h2"))
        for b in range(n_bands)])
    return sig.select(
        "doc_id", "sh_arr", F.posexplode(band_arr).alias("band", "hs")
    ).select("doc_id", "band", F.col("hs.h1").alias("h1"),
             F.col("hs.h2").alias("h2"), "sh_arr")


def minhash_lsh_pairs(corpus: DataFrame,
                      jaccard_threshold: float = C.JACCARD_THRESHOLD,
                      shingler=None, sh: DataFrame | None = None
                      ) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact Jaccard verify.

    Plan: row-local signatures → posexplode to (band, h1, h2) keys →
    self equi-join on the band key → distinct candidate pairs → join
    each side's shingle *array* → row-local array_intersect Jaccard.
    The only shuffles are the band join and the candidate-bounded
    array joins.  Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    if sh is None:
        from ..plans.caching import tracked_persist
        # plain shingle_arrays: the combined shingle_table would also
        # sweep the 60 simhash bit permutations this caller never uses
        sh = tracked_persist((shingler or shingle_arrays)(corpus))
    if sh.count() <= DEDUP_BUCKET_MAX:
        return _minhash_pairs_bucketed(sh, jaccard_threshold)
    return _minhash_pairs_joined(sh, jaccard_threshold)


def _minhash_pairs_joined(sh: DataFrame,
                          jaccard_threshold: float) -> DataFrame:
    """Banded equi-join candidates + join-attached exact-Jaccard
    verify — the arbitrarily-large-corpus route (no oversized
    collect_list buckets)."""
    sig = sh if "mh0" in sh.columns \
        else minhash_signatures_from_arrays(sh)
    bands = _band_keys(sig)
    l = bands.select(F.col("doc_id").alias("doc_a"), "band", "h1", "h2")
    r = bands.select(F.col("doc_id").alias("doc_b"), "band", "h1", "h2")
    cand = (l.join(r, ["band", "h1", "h2"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    verif = (cand
             .join(sh.select(F.col("doc_id").alias("doc_a"),
                             F.col("sh_arr").alias("sa")), "doc_a")
             .join(sh.select(F.col("doc_id").alias("doc_b"),
                             F.col("sh_arr").alias("sb")), "doc_b"))
    n_inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jac = (n_inter.cast("double")
           / (F.size("sa") + F.size("sb") - n_inter).cast("double"))
    return (verif.select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= jaccard_threshold))


def _band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band, h1, h2) — one row per LSH band of a signature."""
    n_bands = len(C.MINHASH_PERMS) // C.MINHASH_BAND_ROWS
    band_arr = F.array(*[
        F.struct(F.col(f"mh{2 * b}").alias("h1"),
                 F.col(f"mh{2 * b + 1}").alias("h2"))
        for b in range(n_bands)])
    return sig.select(
        "doc_id", F.posexplode(band_arr).alias("band", "hs")
    ).select("doc_id", "band", F.col("hs.h1").alias("h1"),
             F.col("hs.h2").alias("h2"))


def incremental_pairs(base: DataFrame, new: DataFrame,
                      jaccard_threshold: float = C.JACCARD_THRESHOLD,
                      sh_b: DataFrame | None = None,
                      sh_n: DataFrame | None = None) -> DataFrame:
    """Incremental (cross-corpus) near-dedup: match a NEW crawl batch
    against an EXISTING kept corpus — the dump-over-dump dedup step of
    CC-style pipelines (each new dump is deduped against all previous
    dumps' keep-set, not just itself).

    Genuinely a TWO-TABLE plan, not a filtered self-join: each side
    computes its own row-local signatures, the band equi-join crosses
    base×new only (no base×base or new×new candidates ever
    materialize), and the verify joins fetch shingle arrays from
    their own side.  At scale the base side's signatures are the
    precomputed artifact of earlier runs — only `new` pays the
    signature scan per increment.  Output: (doc_a = base keeper,
    doc_b = new doc, jaccard ≥ threshold).

    The gate entry (q_dedup_neardup method='incremental') proves the
    two-table banding ≡ the cross-split slice of the self-join
    semantics via the shared DuckDB oracle.
    """
    from ..plans.caching import tracked_persist
    if sh_b is None:
        sh_b = tracked_persist(shingle_arrays(base))
    if sh_n is None:
        sh_n = tracked_persist(shingle_arrays(new))
    if sh_b.count() + sh_n.count() <= DEDUP_BUCKET_MAX:
        return _incremental_pairs_bucketed(sh_b, sh_n, jaccard_threshold)
    sig_b = sh_b if "mh0" in sh_b.columns \
        else minhash_signatures_from_arrays(sh_b)
    sig_n = sh_n if "mh0" in sh_n.columns \
        else minhash_signatures_from_arrays(sh_n)
    l = _band_keys(sig_b).withColumnRenamed("doc_id", "doc_a")
    r = _band_keys(sig_n).withColumnRenamed("doc_id", "doc_b")
    cand = (l.join(r, ["band", "h1", "h2"])
            .select("doc_a", "doc_b").distinct())
    verif = (cand
             .join(sh_b.select(F.col("doc_id").alias("doc_a"),
                               F.col("sh_arr").alias("sa")), "doc_a")
             .join(sh_n.select(F.col("doc_id").alias("doc_b"),
                               F.col("sh_arr").alias("sb")), "doc_b"))
    n_inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jac = (n_inter.cast("double")
           / (F.size("sa") + F.size("sb") - n_inter).cast("double"))
    return (verif.select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= jaccard_threshold))


def _incremental_pairs_bucketed(sh_b: DataFrame, sh_n: DataFrame,
                                jaccard_threshold: float) -> DataFrame:
    """Bucket-local cross-corpus verify: band buckets carry BOTH
    sides' members tagged by side; only base x new pairs are scored
    (never base x base or new x new), exactly like the two-table band
    join.  doc_a = base keeper, doc_b = new doc."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    bb = _band_keys_with_arrays(sh_b).withColumn("side", F.lit(0))
    bn = _band_keys_with_arrays(sh_n).withColumn("side", F.lit(1))
    buckets = (bb.unionByName(bn)
               .groupBy("band", "h1", "h2")
               .agg(F.collect_list(F.struct("doc_id", "side", "sh_arr"))
                    .alias("members"))
               .where(F.size("members") >= 2))
    schema = StructType([
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("jaccard", DoubleType()),
    ])

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            oa, ob, oj = [], [], []
            for members in pdf["members"]:
                side = np.array([m["side"] for m in members],
                                dtype=np.int64)
                if side.min() == side.max():
                    continue          # one-sided bucket: no cross pair
                ids = np.array([m["doc_id"] for m in members],
                               dtype=np.int64)
                arrs = [np.asarray(m["sh_arr"], dtype=np.int64)
                        for m in members]
                ia, ib, inter, lens = _group_pair_counts(arrs, ids)
                if not len(ia):
                    continue
                cross = side[ia] != side[ib]
                ia, ib, inter = ia[cross], ib[cross], inter[cross]
                if not len(ia):
                    continue
                jac = inter / (lens[ia] + lens[ib] - inter)
                keep = jac >= jaccard_threshold
                ia, ib, jac = ia[keep], ib[keep], jac[keep]
                base_first = side[ia] == 0
                a_idx = np.where(base_first, ia, ib)
                b_idx = np.where(base_first, ib, ia)
                oa.extend(ids[a_idx])
                ob.extend(ids[b_idx])
                oj.extend(jac)
            yield pd.DataFrame({"doc_a": pd.Series(oa, dtype="int64"),
                                "doc_b": pd.Series(ob, dtype="int64"),
                                "jaccard": pd.Series(oj,
                                                     dtype="float64")})

    return buckets.mapInPandas(verify, schema).distinct()


def dedup_groups(corpus: DataFrame) -> DataFrame:
    """The dedup capstone: exact-duplicate pairs ∪ MinHash near-dup
    pairs → connected components → one row per clustered document,
    (group_id, doc_id, group_size), group_id = min doc_id of the
    cluster (the canonical keeper a training pipeline retains).
    Components via the same min-label propagation + pointer jumping
    as the road-network A10 operator (operators/network.py)."""
    from . import network

    exact = (exact_duplicates(corpus)
             .select(F.col("dup_group_min").alias("a"),
                     F.col("doc_id").alias("b")))
    near = (minhash_lsh_pairs(corpus)
            .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")))
    e = exact.unionByName(near).where(F.col("a") != F.col("b"))
    eb = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionByName(
              e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
          .distinct()
          # materialize: label propagation re-reads the edge set every
          # iteration — without this the whole exact+minhash pair
          # pipeline re-executes per round (measured ~2x the query)
          .localCheckpoint(eager=True))
    labels = network.component_labels(eb)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("group_size"))
    return (labels.join(sizes, "label")
            .select(F.col("label").alias("group_id"),
                    F.col("node_id").alias("doc_id"), "group_size"))


def corpus_select(docs: DataFrame,
                  docs_raw: DataFrame | None = None) -> DataFrame:
    """End-to-end training-corpus selection composing the pipeline:
    keep documents that (a) pass the quality threshold, (b) have a
    confirmed language ID, and (c) are either unclustered or the
    canonical keeper (min doc_id) of their dedup group; plus the
    deterministic mixture-sampling draw (operators/sampling.py, r5
    late) — rate from the source-domain hash, keep/drop from the
    doc_id hash — plus the leakage-free held-out `split`
    (operators/splits.py): every kept document is its own dedup-
    cluster keeper (non-keepers were just dropped), so keying the
    split on doc_id IS keying it on the canonical cluster id — a
    dropped near-twin can never resurface in a different split.
    Output: (doc_id, quality, predicted_lang, sample_rate_pm,
    sampled, split) for the kept set — the one-query version of a
    filter+dedup+mixture+split data pipeline."""
    from . import sampling, splits, textqa

    q = textqa.quality_score(docs).select("doc_id", "quality")
    lid = textqa.lang_id(docs).select("doc_id", "predicted_lang",
                                      "lang_match")
    smp = docs.select("doc_id", *sampling.sample_cols())
    groups = dedup_groups(augmented_corpus(
        docs if docs_raw is None else docs_raw))
    drop = (groups.where(F.col("doc_id") != F.col("group_id"))
            .select("doc_id").distinct())
    return (q.join(lid, "doc_id")
            .where((F.col("quality") > 0.3) & F.col("lang_match"))
            .join(drop, "doc_id", "left_anti")
            .join(smp, "doc_id")
            .select("doc_id", "quality", "predicted_lang",
                    "sample_rate_pm", "sampled",
                    splits.split_col(F.col("doc_id")).alias("split")))


def simhash_signatures(corpus: DataFrame,
                       bits: int = C.SIMHASH_BITS,
                       sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, simhash): per bit, majority vote over the shingle set.
    Bit b of a shingle is the parity of an affine rehash
    (SIMHASH_BIT_PERMS), so every signature bit is a fair coin and
    every 15-bit block key is uniformly distributed.

    Computed as one Arrow-batched numpy pass over the flattened
    shingle stream (add.reduceat per doc per bit) — the 60 per-bit
    JVM filter() lambdas this replaces were interpreted (no codegen).
    Identical integers to the SQL oracle; zero shuffle (narrow map).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", LongType())])
    perms = C.SIMHASH_BIT_PERMS[:bits]

    def sig(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            flat, offs, sizes = _flat_shingles(pdf)
            sim = np.zeros(len(pdf), dtype=np.int64)
            for b, (a, bb) in enumerate(perms):
                ones = ((flat * a + bb) % C.P31) & 1
                cb = np.add.reduceat(ones, offs)
                sim += np.where(cb * 2 > sizes, np.int64(1) << b, 0)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(),
                                "simhash": sim})

    if sh is not None and "simhash" in sh.columns:
        return sh.select("doc_id", "simhash")
    src = sh if sh is not None else shingle_arrays(corpus)
    return src.select("doc_id", "sh_arr").mapInPandas(sig, schema)


def simhash_pairs(corpus: DataFrame,
                  max_hamming: int = C.SIMHASH_MAX_HAMMING,
                  sh: DataFrame | None = None) -> DataFrame:
    """Pairs with simhash hamming distance ≤ 3, found by pigeonhole
    block LSH: a pair differing in ≤3 of 60 bits damages ≤3 of the
    4 15-bit blocks, so it must agree on ≥1 — an equi-join whose
    blocking keyspace is 32_768 values per block (candidate volume
    stays O(n·dup_rate), not O(n²/16) like round 1's nibbles).
    Output: (doc_a, doc_b, hamming)."""
    sig = simhash_signatures(corpus, sh=sh)
    blk_arr = F.array(*[
        F.shiftright(F.col("simhash"), C.SIMHASH_BLOCK_BITS * k)
        .bitwiseAND((1 << C.SIMHASH_BLOCK_BITS) - 1)
        for k in range(C.SIMHASH_BLOCKS)])
    blk = sig.select("doc_id", "simhash",
                     F.posexplode(blk_arr).alias("bk", "bv"))
    n = sh.count() if sh is not None else corpus.count()
    if n <= DEDUP_BUCKET_MAX:
        return _simhash_pairs_bucketed(blk, max_hamming)
    l = blk.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("sim_a"), "bk", "bv")
    r = blk.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("sim_b"), "bk", "bv")
    cand = (l.join(r, ["bk", "bv"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sim_a", "sim_b").distinct())
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.select("doc_a", "doc_b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def _simhash_pairs_bucketed(blk: DataFrame,
                            max_hamming: int) -> DataFrame:
    """Bucket-local hamming verify: each (bk, bv) block bucket arrives
    as a collect_list of (doc_id, simhash) members; pairwise
    XOR-popcount runs as one vectorized pass per bucket (byte-LUT
    popcount, numpy<2 has no bitwise_count) and only pairs with
    hamming <= max leave Python.  Same semantics as the block
    equi-join route (agree on >=1 block AND hamming <= max)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    buckets = (blk.groupBy("bk", "bv")
               .agg(F.collect_list(F.struct("doc_id", "simhash"))
                    .alias("members"))
               .where(F.size("members") >= 2)
               # tiny bucket table: AQE would coalesce it to 1-2
               # partitions and run the popcount verify single-core
               .repartition(
                   blk.sparkSession.sparkContext.defaultParallelism))
    schema = StructType([
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("hamming", LongType()),
    ])
    LUT = np.array([bin(i).count("1") for i in range(256)],
                   dtype=np.int64)

    def popcount64(x):
        return LUT[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            oa, ob, oh = [], [], []
            for members in pdf["members"]:
                ids = np.array([m["doc_id"] for m in members],
                               dtype=np.int64)
                sig = np.array([m["simhash"] for m in members],
                               dtype=np.int64)
                order = np.argsort(ids, kind="stable")
                ids, sig = ids[order], sig[order]
                x = sig[:, None] ^ sig[None, :]
                ham = popcount64(x)
                ii, jj = np.nonzero(ham <= max_hamming)
                keep = ii < jj
                oa.extend(ids[ii[keep]])
                ob.extend(ids[jj[keep]])
                oh.extend(ham[ii[keep], jj[keep]])
            yield pd.DataFrame({"doc_a": pd.Series(oa, dtype="int64"),
                                "doc_b": pd.Series(ob, dtype="int64"),
                                "hamming": pd.Series(oh,
                                                     dtype="int64")})

    return buckets.mapInPandas(verify, schema).distinct()
