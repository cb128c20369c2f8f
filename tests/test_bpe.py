"""BPE tokenizer: driver trainer vs an independent brute-force
reference, distributed-trainer parity, and apply invariants."""
from __future__ import annotations

from collections import Counter

from greenexp_r_spark.operators import bpe


# -- independent reference trainer (full recount every round) --------

def brute_train(wc: dict, n_merges: int) -> list:
    words = {w: list(bpe._symbols(w)) for w in wc}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += wc[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        for w, syms in words.items():
            new, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    new.append(best[0] + best[1])
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    return merges


WC = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 1}


def test_driver_trainer_matches_brute():
    got = bpe._train_driver(list(WC.items()), 10)
    want = brute_train(WC, 10)
    assert got == want
    # classic corpus: 'es'-family merges dominate ('est</w>' forms)
    assert ("es", "t</w>") in got or ("e", "s") in got


def test_driver_trainer_overlapping_pairs():
    # 'aaaa': pair (a,a) counts 3 per occurrence; greedy merges L-to-R
    got = bpe._train_driver([("aaaa", 3), ("ab", 1)], 5)
    want = brute_train({"aaaa": 3, "ab": 1}, 5)
    assert got == want


def test_spark_train_paths_agree(spark):
    rows = [(i, " ".join(w for w, c in WC.items() for _ in range(c)))
            for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    driver = bpe.bpe_train(df, n_merges=8)
    dist = bpe.bpe_train(df, n_merges=8,
                         n_words_hint=bpe.DRIVER_WORD_LIMIT + 1)
    assert driver == brute_train({w: 3 * c for w, c in WC.items()}, 8)
    assert dist == driver


def test_apply_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = bpe.bpe_train(docs, n_merges=40)
    assert len(merges) > 0
    out = bpe.bpe_apply(docs, merges).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        toks = r["bpe_tokens"]
        assert r["n_bpe_tokens"] == len(toks)
        # lossless: joining tokens and stripping EOW restores the text
        joined = "".join(toks).replace(bpe.EOW, " ").rstrip(" ")
        assert joined == texts[r["doc_id"]]
    # more merges => no more tokens than fewer merges
    out10 = {r["doc_id"]: r["n_bpe_tokens"]
             for r in bpe.bpe_apply(docs, merges[:10]).collect()}
    for r in out:
        assert r["n_bpe_tokens"] <= out10[r["doc_id"]]


def test_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t</w>"), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("lowest", ranks) == ["lo", "w", "est</w>"]
    assert bpe.encode_word("test", ranks) == ["t", "est</w>"]
    assert bpe.encode_word("", ranks) == []
    assert bpe.encode_word("a", {}) == ["a</w>"]
