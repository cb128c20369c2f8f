"""Exact-substring dedup (operators/substrdup.py)."""
from __future__ import annotations

from greenexp_r_spark.operators import substrdup


def _reference(rows, L):
    """Brute-force keep-first span coverage."""
    seen = {}
    dup_pos = {d: [] for d, _ in rows}
    for did, text in sorted(rows):
        for pos in range(1, len(text) - L + 2):
            sub = text[pos - 1:pos - 1 + L]
            if sub in seen:
                dup_pos[did].append(pos)
            else:
                seen[sub] = (did, pos)
    out = {}
    for did, text in rows:
        spans, cur = [], None
        for pos in dup_pos[did]:
            if cur and pos <= cur[1]:
                cur[1] = max(cur[1], pos + L)
                cur[2] += 1
            else:
                cur = [pos, pos + L, 1]
                spans.append(cur)
        covered = sum(e - s for s, e, _ in spans)
        out[did] = (len(text), sum(c for _, _, c in spans),
                    len(spans), covered, len(text) - covered)
    return out


def test_matches_bruteforce_reference(spark):
    L = 8
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "xx the quick brown fox sits yy"),      # shared prefix run
        (3, "totally unrelated content here 333"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (5, "zz over the lazy dog ends here qq"),
        (6, "short"),                               # < L chars
        (7, "abcabcabcabcabcabcabc"),               # self-repeating
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           substrdup.substring_dedup(df, L=L).collect()}
    want = _reference(rows, L)
    assert len(got) == len(rows)
    for did, (n, npos, nspan, ncov, clean) in want.items():
        r = got[did]
        assert (r["n_chars"], r["n_dup_positions"], r["n_spans"],
                r["n_dup_chars"], r["clean_chars"]) \
            == (n, npos, nspan, ncov, clean), did
    # the exact duplicate doc is fully covered
    assert got[4]["clean_chars"] == 0
    # the within-doc repeat is partially covered
    assert 0 < got[7]["n_dup_chars"] < got[7]["n_chars"]
    assert got[6]["n_dup_chars"] == 0


def test_keep_first_rule_is_deterministic(spark):
    # the first (doc_id, pos) occurrence is never marked duplicate
    rows = [(2, "aaaa unique spans here text"),
            (1, "aaaa unique spans here text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           substrdup.substring_dedup(df, L=10).collect()}
    assert got[1]["n_dup_chars"] == 0
    assert got[2]["clean_chars"] == 0


def test_gate_fixture_nontrivial(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = substrdup.substring_dedup(docs).toPandas()
    assert len(out) == docs.count()
    assert (out.n_dup_chars > 0).any()
    assert (out.n_dup_chars == 0).any()
    assert (out.clean_chars >= 0).all()
    assert (out.n_dup_chars <= out.n_chars).all()
