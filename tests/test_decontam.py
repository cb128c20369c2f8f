"""Benchmark decontamination (operators/decontam.py)."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from greenexp_r_spark import constants as C
from greenexp_r_spark.operators import decontam


def _py_word_hash(w: str) -> int:
    p = w + "_"
    return (ord(p[0]) * C.WORDHASH_P1 + ord(p[1]) * C.WORDHASH_P2
            + len(w))


def _py_ngrams(text: str, n: int = decontam.NGRAM_N) -> set[int]:
    ws = text.split(" ")
    out = set()
    for i in range(len(ws) - n + 1):
        h = _py_word_hash(ws[i])
        for k in range(1, n):
            h = (h * C.SHINGLE_MUL + _py_word_hash(ws[i + k])) % C.P31
        out.add(h)
    return out


def test_matches_pure_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words appear in this one document"),
        (3, "the quick brown fox jumps straight up high now"),
        (4, "tiny doc"),                      # < n words: 0 n-grams
        (decontam.BENCH_RESIDUE,
         "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in decontam.decontaminate(df).collect()}
    bench = _py_ngrams(" ".join(rows[-1][1].split(" ")
                                [:decontam.BENCH_WORDS]))
    for did, text in rows:
        grams = _py_ngrams(text)
        hit = len(grams & bench)
        r = got[did]
        assert r["n_ngrams"] == len(grams), did
        assert r["n_contaminated"] == hit, did
        assert r["contaminated"] == (hit > 0), did
        want = 0.0 if not grams else hit / len(grams)
        assert abs(r["overlap_frac"] - want) < 1e-12, did
    # doc 1 shares the benchmark doc's full text -> fully contaminated
    assert got[1]["contaminated"] and got[1]["overlap_frac"] == 1.0
    # doc 3 shares only the 4-word prefix "the quick brown fox jumps"
    assert got[3]["n_contaminated"] == 1
    assert 0.0 < got[3]["overlap_frac"] < 1.0
    assert not got[2]["contaminated"]
    assert got[4]["n_ngrams"] == 0 and not got[4]["contaminated"]


def test_benchmark_prompt_truncates_at_bench_words(spark):
    long_tail = " ".join(f"w{i}" for i in range(60))
    rows = [(decontam.BENCH_RESIDUE, long_tail),
            (2, " ".join(f"w{i}" for i in range(35, 45)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in decontam.decontaminate(df).collect()}
    # doc 2 overlaps only words 35..44 — past the 30-word prompt cut
    assert not got[2]["contaminated"]


def test_gate_fixture_nontrivial(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = decontam.decontaminate(docs).toPandas()
    assert len(out) == docs.count()
    n_bench = docs.where(
        F.col("doc_id") % decontam.BENCH_MOD
        == decontam.BENCH_RESIDUE).count()
    assert n_bench > 0
    # every benchmark doc with >= n words self-contaminates through
    # its own 30-word prompt prefix (overlap 1.0 only if the doc is
    # no longer than the prompt)
    bench_rows = out[(out.doc_id % decontam.BENCH_MOD
                      == decontam.BENCH_RESIDUE)
                     & (out.n_ngrams > 0)]
    assert (bench_rows.contaminated).all()
    assert (bench_rows.overlap_frac > 0.0).all()
    # and the flag must be a strict subset of the corpus, not all of it
    n_flagged = int(out.contaminated.sum())
    assert n_bench <= n_flagged < len(out)


def test_bench_join_is_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = decontam.decontaminate(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan
