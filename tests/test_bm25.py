"""BM25 relevance scoring (operators/bm25.py)."""
from __future__ import annotations

import math

from greenexp_r_spark import constants as C
from greenexp_r_spark.operators import bm25

FIX = {
    1: "dup spark scan merge dup dup",      # all four terms, tf(dup)=3
    2: "spark is a big data engine spark",  # one term twice
    3: "zzz qqq xxx",                       # zero hits → score 0
    4: "merge",                             # single-word doc
    5: "scan scan scan scan scan scan scan scan scan scan",
}
TERMS = C.BM25_TERMS


def _py_bm25(texts: dict[int, str]):
    """Pure-python reference (Lucene variant, k1=1.2 b=0.75,
    micro-unit floor quantization)."""
    n = len(texts)
    lens = {d: len(t.split(" ")) for d, t in texts.items()}
    sum_len = sum(lens.values())
    df = {t: sum(1 for x in texts.values() if t in x.split(" "))
          for t in TERMS}
    out = {}
    for d, t in texts.items():
        ws = t.split(" ")
        hits, total = 0, 0
        for q in TERMS:
            tf = ws.count(q)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75
                                            * (lens[d] * n / sum_len)))
            total += math.floor(1_000_000.0 * idf * tfn + 0.5)
        out[d] = (hits, total)
    return out


def test_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(list(FIX.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: (r.n_hit_terms, r.bm25_micro)
           for r in bm25.bm25_scores(docs).collect()}
    assert got == _py_bm25(FIX)


def test_zero_hit_doc_scores_zero(spark):
    docs = spark.createDataFrame(list(FIX.items()),
                                 "doc_id long, text string")
    row = {r.doc_id: r for r in bm25.bm25_scores(docs).collect()}[3]
    assert (row.n_hit_terms, row.bm25_micro) == (0, 0)


def test_rarer_term_outscores_common_at_equal_tf(spark):
    """idf ordering: at equal tf and doc length, the rarer query term
    must contribute more."""
    texts = {i: "spark x" for i in range(1, 9)}       # spark common
    texts[9] = "dup x"                                # dup rare
    texts[10] = "spark x"
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    s = {r.doc_id: r.bm25_micro for r in bm25.bm25_scores(docs).collect()}
    assert s[9] > s[10]


def test_duckdb_ctes_match_engine(spark):
    """The shared-SQL rendering (bm25_ctes) must reproduce the engine
    exactly on a fixture with zero-hit, single-word and repeated-term
    docs — the targeted unit for what the gate would otherwise only
    report as an opaque hash mismatch."""
    import duckdb

    from greenexp_r_spark.dialect import DUCK

    docs = spark.createDataFrame(list(FIX.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: (r.n_hit_terms, r.bm25_micro)
           for r in bm25.bm25_scores(docs).collect()}
    con = duckdb.connect()
    vals = ",".join(f"({d}, '{t}')" for d, t in FIX.items())
    terms = ", ".join(f"'{t}'" for t in TERMS)
    sql = (f"WITH documents AS (SELECT * FROM (VALUES {vals})"
           f" _t(doc_id, text)),{bm25.bm25_ctes(DUCK, terms)} "
           f"SELECT doc_id, n_hit_terms, bm25_micro FROM bm25")
    oracle = {d: (h, s) for d, h, s in con.sql(sql).fetchall()}
    assert got == oracle


def test_model_joins_are_broadcast(spark):
    docs = spark.createDataFrame(list(FIX.items()),
                                 "doc_id long, text string")
    phys = bm25.bm25_scores(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert phys.count("BroadcastHashJoin") >= 1
    for line in phys.splitlines():
        if "SortMergeJoin" in line:
            assert "doc_id#" in line, line
