"""Byte-pair-encoding tokenizer: distributed train + Arrow apply.

The canonical LLM-training-pipeline tokenizer (Sennrich et al. 2016;
the GPT-2 family trains the same way): learn a ranked list of symbol
merges from corpus word frequencies, then tokenize by applying the
lowest-rank eligible merge repeatedly per word.

Spark-first shape:

  * ``word_counts`` — ONE hash aggregate over the exploded corpus
    (map-side partials; shuffle O(distinct words) — at web scale the
    distinct-word table is DIMENSION-sized relative to the corpus).
  * ``bpe_train`` — size-routed like the graph solvers
    (operators/network.py): when the distinct-word table fits the
    driver limit it collects once and runs the exact greedy loop in
    numpy-backed Python (each merge touches only words containing the
    merged pair — the classic trainer); past the limit it falls back
    to a distributed trainer that recomputes the pair-count aggregate
    per merge round (n_merges Spark jobs over the cached word table —
    the honest 100 TB path, same greedy semantics, proven equal in
    tests).  Ties break on (count DESC, pair lexicographic ASC) in
    BOTH paths so training is deterministic.
  * ``bpe_apply`` — tokenization is embarrassingly parallel: an
    Arrow-batched ``mapInPandas`` with the merge-rank dict broadcast;
    each batch tokenizes its DISTINCT words once (web text repeats
    words heavily) and maps rows through the per-word cache.

End-of-word marker: the trainer appends ``</w>`` to each word's final
symbol (word-boundary-aware merges, the published convention), so
"low" and "lower" share the "lo" merge but not the final symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType,
                               StructField, StructType)

from ..functions import text as T

EOW = "</w>"
DRIVER_WORD_LIMIT = 2_000_000     # distinct words; same doctrine as
                                  # network.py's driver-solve limit


def word_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — one explode + hash agg."""
    return (docs.select(F.explode(T.words(F.col(col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


# ------------------------------------------------------------ training

def _symbols(word: str) -> tuple:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _train_driver(wc: list, n_merges: int) -> list:
    """Exact greedy BPE on a (word, cnt) list — the textbook
    incremental trainer: pair counts and a pair→words inverted index
    are maintained across merges, so each round touches only the
    words containing the merged pair.  Returns ranked merges."""
    words = [[list(_symbols(w)), int(c)] for w, c in wc if w]
    counts: dict = {}
    where: dict = {}
    for idx, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + c
            where.setdefault(p, set()).add(idx)
    merges: list = []
    for _ in range(n_merges):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for idx in sorted(where.get(best, ())):
            syms, c = words[idx]
            # retract this word's old pair contributions
            for p in zip(syms, syms[1:]):
                counts[p] -= c
                if counts[p] <= 0:
                    del counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        del where[p]
            new, i, n = [], 0, len(syms)
            while i < n:
                if (i < n - 1 and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    new.append(joined)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[idx][0] = new
            for p in zip(new, new[1:]):
                counts[p] = counts.get(p, 0) + c
                where.setdefault(p, set()).add(idx)
    return merges


def _train_distributed(wc: DataFrame, n_merges: int) -> list:
    """Same greedy semantics, one pair-count aggregate per merge round
    over the cached distinct-word table.  O(n_merges) Spark jobs; the
    aggregate's shuffle carries (pair, partial count) only."""
    spark = wc.sparkSession
    # chars[0..n-2] + [last_char + EOW]; F.length (not size of the
    # split, which carries a trailing empty element) drives the slice
    sym = (wc.where(F.length("word") > 0)
           .select(F.concat(
               F.when(F.length("word") > 1,
                      F.slice(F.split("word", ""), 1,
                              F.length("word") - 1))
               .otherwise(F.array().cast("array<string>")),
               F.array(F.concat(F.substring(F.col("word"), -1, 1),
                                F.lit(EOW)))).alias("syms"),
               "cnt"))
    cur = sym.localCheckpoint()
    merges: list = []
    for _ in range(n_merges):
        pos = cur.select(
            "cnt", F.posexplode(F.slice("syms", 1, F.size("syms") - 1))
            .alias("i", "a"),
            F.col("syms").alias("syms"))
        pairs = pos.select(
            "cnt", "a",
            F.element_at("syms", F.col("i") + 2).alias("b"))
        top = (pairs.groupBy("a", "b").agg(F.sum("cnt").alias("c"))
               .orderBy(F.col("c").desc(), F.col("a").asc(),
                        F.col("b").asc())
               .limit(1).collect())
        if not top or top[0]["c"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        joined = a + b

        @F.pandas_udf(ArrayType(StringType()))
        def merge_syms(s):  # pragma: no cover - exercised via Spark
            def m(syms):
                new, i, n = [], 0, len(syms)
                while i < n:
                    if (i < n - 1 and syms[i] == a and syms[i + 1] == b):
                        new.append(joined)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                return new
            return s.map(m)

        nxt = cur.select(merge_syms("syms").alias("syms"), "cnt") \
                 .localCheckpoint()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_train(docs: DataFrame, n_merges: int = 100,
              col: str = "text",
              n_words_hint: int | None = None) -> list:
    """Learn `n_merges` ranked merges from the corpus.  Size-routed:
    driver greedy loop when the distinct-word table is dimension-sized
    (≤ DRIVER_WORD_LIMIT), distributed per-round aggregation past it
    (force with n_words_hint in tests)."""
    wc = word_counts(docs, col).localCheckpoint()
    n = n_words_hint if n_words_hint is not None \
        else wc.limit(DRIVER_WORD_LIMIT + 1).count()
    if n <= DRIVER_WORD_LIMIT:
        rows = wc.collect()
        return _train_driver([(r["word"], r["cnt"]) for r in rows],
                             n_merges)
    return _train_distributed(wc, n_merges)


# ------------------------------------------------------------- apply

def encode_word(word: str, ranks: dict) -> list:
    """Greedy BPE segmentation of one word: repeatedly merge the
    eligible pair with the LOWEST rank (the published algorithm)."""
    if not word:
        return []
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply(docs: DataFrame, merges: list, col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id_col, bpe_tokens array<string>, n_bpe_tokens) — Arrow-batched
    tokenization with a per-batch distinct-word cache (web text repeats
    words, so each distinct word is segmented once per batch)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("bpe_tokens", ArrayType(StringType())),
        StructField("n_bpe_tokens", LongType()),
    ])

    def run(batches):
        import pandas as pd
        rk = b_ranks.value
        cache: dict = {}

        def enc(w):
            t = cache.get(w)
            if t is None:
                t = cache[w] = encode_word(w, rk)
            return t

        for b in batches:
            toks = [
                [t for w in text.split(" ") for t in enc(w)]
                for text in b[col]
            ]
            yield pd.DataFrame({
                id_col: b[id_col],
                "bpe_tokens": toks,
                "n_bpe_tokens": [len(t) for t in toks],
            })

    return docs.select(id_col, col).mapInPandas(run, schema)
