"""Gopher repetition filters: brute-force pandas oracle on a corpus
with engineered edge cases (single token, all-same-word, tie-broken
top bigram)."""
from __future__ import annotations

from collections import Counter

import pytest

from greenexp_r_spark.operators import textqa


DOCS = [
    (0, "a b c d e f g h"),                      # all distinct
    (1, "x"),                                    # single token: no grams
    (2, "w w w w w w"),                          # degenerate repetition
    (3, "p q p q r s"),                          # top bigram 'p q' x2
    (4, "m n m n n m m n"),                      # bigram tie -> lexicographic
]


def brute(text: str):
    w = text.split(" ")
    n, nc = len(w), len(text)
    dup_word = (n - len(set(w))) / n
    g2 = [" ".join(w[i:i + 2]) for i in range(n - 1)]
    g3 = [" ".join(w[i:i + 3]) for i in range(n - 2)]
    if g2:
        c2 = Counter(g2)
        top = min(sorted(c2), key=lambda g: (-c2[g], g))
        top_cnt, topf = c2[top], c2[top] * len(top) / nc
    else:
        top, top_cnt, topf = "", 0, 0.0
    c3 = Counter(g3)
    dup3 = sum(c * len(g) for g, c in c3.items() if c >= 2) / nc
    return dup_word, top, top_cnt, topf, dup3


def test_repetition_stats_matches_brute(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in textqa.repetition_stats(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        dup_word, top, top_cnt, topf, dup3 = brute(text)
        r = got[doc_id]
        assert r["n_tokens"] == len(text.split(" "))
        assert r["dup_word_frac"] == pytest.approx(dup_word, abs=0)
        assert r["top_bigram"] == top, (doc_id, r["top_bigram"], top)
        assert r["top_bigram_cnt"] == top_cnt
        assert r["top_bigram_frac"] == pytest.approx(topf, abs=0)
        assert r["dup_trigram_frac"] == pytest.approx(dup3, abs=0)


def test_gopher_keep_thresholds(spark):
    # a long clean doc passes; the degenerate all-same-word doc fails
    clean = " ".join(f"w{i}" for i in range(100))
    spam = " ".join(["buy now"] * 60)
    df = spark.createDataFrame([(0, clean), (1, spam)],
                               "doc_id long, text string")
    r = {x["doc_id"]: x["gopher_keep"]
         for x in textqa.repetition_stats(df).collect()}
    assert r[0] is True
    assert r[1] is False
