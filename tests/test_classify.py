"""Trained hashed-feature quality classifier (operators/classify.py)
and incremental cross-corpus dedup (dedup.incremental_pairs)."""
from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from greenexp_r_spark import constants as C
from greenexp_r_spark.operators import classify, dedup


def _py_word_hash(w: str) -> int:
    p = w + "_"
    return (ord(p[0]) * C.WORDHASH_P1 + ord(p[1]) * C.WORDHASH_P2
            + len(w))


def _py_classifier(texts: dict[int, str]):
    """Pure-python reference of the full train→apply pipeline."""
    feats = {d: {_py_word_hash(w) % C.NB_BUCKETS
                 for w in t.split(" ")} for d, t in texts.items()}
    pos = {d: sum(w in C.STOPWORDS_EN for w in t.split(" "))
           * C.NB_STOP_NUM >= len(t.split(" "))
           for d, t in texts.items()}
    counts: dict[int, list[int]] = {}
    for d, bs in feats.items():
        for b in bs:
            np_, na = counts.get(b, (0, 0))
            counts[b] = (np_ + (1 if pos[d] else 0), na + 1)
    weights = {b: (C.NB_SCALE * (np_ + 1)) // (na + 2)
               for b, (np_, na) in counts.items()}
    out = {}
    for d, bs in feats.items():
        ev = sum(weights[b] for b in bs)
        score = ev // len(bs)
        out[d] = (len(bs), ev, score, score >= C.NB_KEEP_PM)
    return out


FIX = {
    1: "the quick brown fox jumps over the lazy dog and the cat",
    2: "zzz qqq xxx www kkk jjj mmm nnn ppp",
    3: "the the the and and of of in in to to",
    4: "alpha beta gamma delta epsilon",
    5: "a the is of to in and for on it",
}


def test_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(list(FIX.items()), "doc_id long, text string")
    got = {r.doc_id: (r.n_feat, r.evidence_pm, r.score_pm, r.clf_keep)
           for r in classify.quality_classifier(docs).collect()}
    assert got == _py_classifier(FIX)


def test_stopword_rich_beats_gibberish(spark):
    """The trained model must score the stopword-dense doc above the
    gibberish one (the label proxy is learnable from these counts)."""
    docs = spark.createDataFrame(list(FIX.items()), "doc_id long, text string")
    s = {r.doc_id: r.score_pm
         for r in classify.quality_classifier(docs).collect()}
    assert s[3] > s[2] and s[5] > s[2]


def test_apply_is_broadcast_join(spark):
    docs = spark.createDataFrame(list(FIX.items()), "doc_id long, text string")
    df = classify.classify(docs, classify.nb_train(docs))
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys or "BroadcastExchange" in phys


def test_log_odds_matches_numpy(spark):
    docs = spark.createDataFrame(list(FIX.items()), "doc_id long, text string")
    w = classify.nb_train(docs)
    got = {r.bucket: r.log_odds
           for r in classify.nb_log_odds(w).collect()}
    for r in w.collect():
        p = r.weight_pm / C.NB_SCALE
        assert math.isclose(got[r.bucket], math.log(p / (1 - p)),
                            rel_tol=1e-12)


# ---------------------------------------------------------------- dedup


def test_incremental_equals_cross_split_selfjoin(spark, sf_dir):
    """Two-table banding ≡ the cross-split slice of the self-join
    (the gate claim, asserted here at sf0.001 against the real
    operator instead of SQL)."""
    aug = dedup.augmented_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))
    base = aug.where(F.col("doc_id") < 1_000_000)
    new = aug.where(F.col("doc_id") >= 1_000_000)
    inc = dedup.incremental_pairs(base, new).toPandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    ref = dedup.minhash_lsh_pairs(aug).where(
        (F.col("doc_a") < 1_000_000) & (F.col("doc_b") >= 1_000_000)
    ).toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(inc, ref)
    assert len(inc) > 0


def test_incremental_never_pairs_within_a_side(spark):
    """New×new near-dups must NOT be reported (they are next round's
    base-side problem) — the two-table join can't produce them."""
    base = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "an identical pair of new documents right here"),
         (11, "an identical pair of new documents right here")],
        "doc_id long, text string")
    got = dedup.incremental_pairs(base, new).collect()
    assert got == []
