"""Text-analysis operators for the training-data pipeline: token
counting, quality scoring, language ID, document fingerprinting.

All per-document computations are array/higher-order-function
expressions (JVM-side, whole-stage codegen) — the 100 TB posture is
one narrow map stage, zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import constants as C
from ..functions import text as T

# 131^k mod P31, k = 0..7 — positional weights for the rolling
# fingerprint (a bounded-window polynomial hash).
FP_POWS = [pow(131, k, C.P31) for k in range(8)]


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, mean_token_len) — whitespace
    tokenization; mean length excludes the separators."""
    w = T.words(F.col("text"))
    n_tok = F.size(w).cast("long")
    n_chars = F.length("text").cast("long")
    mean_len = ((n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"))
    return docs.select(
        "doc_id", n_tok.alias("n_tokens"), n_chars.alias("n_chars"),
        mean_len.alias("mean_token_len"))


# BPE-ish pre-tokenization classes (the GPT-2-style split of letter
# runs / digit runs / punctuation, minus the unicode categories the
# ASCII corpus doesn't have).  Trivial regexes so Java (Spark) and
# RE2 (DuckDB) agree byte-for-byte.
RE_ALPHA = "[A-Za-z]+"
RE_NUM = "[0-9]+"
RE_OTHER = "[^A-Za-z0-9 ]"


def token_pieces(docs: DataFrame) -> DataFrame:
    """(doc_id, n_alpha, n_num, n_other, n_pieces) — BPE-ish
    pre-tokenizer piece counts (letter runs, digit runs, single
    punctuation marks), all JVM regexp_extract_all."""
    cnt = lambda p: F.size(
        F.regexp_extract_all(F.col("text"), F.lit(p), F.lit(0))
    ).cast("long")
    na, nn, no = cnt(RE_ALPHA), cnt(RE_NUM), cnt(RE_OTHER)
    return docs.select(
        "doc_id", na.alias("n_alpha"), nn.alias("n_num"),
        no.alias("n_other"), (na + nn + no).alias("n_pieces"))


def token_profile(docs: DataFrame) -> DataFrame:
    """token_stats + token_pieces in ONE narrow projection (single
    scan, zero shuffle) — the consolidated gate shape; the two
    component operators stay independently callable."""
    w = T.words(F.col("text"))
    n_tok = F.size(w).cast("long")
    n_chars = F.length("text").cast("long")
    mean_len = ((n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"))
    cnt = lambda p: F.size(
        F.regexp_extract_all(F.col("text"), F.lit(p), F.lit(0))
    ).cast("long")
    na, nn, no = cnt(RE_ALPHA), cnt(RE_NUM), cnt(RE_OTHER)
    return docs.select(
        "doc_id", n_tok.alias("n_tokens"), n_chars.alias("n_chars"),
        mean_len.alias("mean_token_len"), na.alias("n_alpha"),
        nn.alias("n_num"), no.alias("n_other"),
        (na + nn + no).alias("n_pieces"))


def _marker_count(warr, markers: list[str]):
    lst = ", ".join(f"'{m}'" for m in markers)
    return F.size(F.filter(warr, lambda x: x.isin(markers))).cast("long")


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stopword_cnt, stopword_ratio, quality) —
    length/stopword-ratio heuristics of C4/Gopher-style filters."""
    w = T.words(F.col("text"))
    n_tok = F.size(w).cast("long")
    stop = _marker_count(w, C.STOPWORDS_EN)
    ratio = stop.cast("double") / n_tok.cast("double")
    quality = (ratio * 0.5
               + F.least(n_tok, F.lit(100)).cast("double") / 200.0)
    return docs.select(
        "doc_id", n_tok.alias("n_tokens"), stop.alias("stopword_cnt"),
        ratio.alias("stopword_ratio"), quality.alias("quality"))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, predicted_lang, lang_match) — marker-word n-gram
    heuristic with deterministic argmax tie-break (en > nl > fr)."""
    w = T.words(F.col("text"))
    cnt_en = _marker_count(w, C.LANG_MARKERS["en"])
    cnt_nl = _marker_count(w, C.LANG_MARKERS["nl"])
    cnt_fr = _marker_count(w, C.LANG_MARKERS["fr"])
    g = F.greatest(cnt_en, cnt_nl, cnt_fr)
    pred = (F.when(cnt_en == g, "en")
            .when(cnt_nl == g, "nl")
            .otherwise("fr"))
    return docs.select(
        "doc_id", "lang", pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("lang_match"))


def text_qa(docs: DataFrame) -> DataFrame:
    """quality_score + lang_id in ONE narrow projection (single scan,
    zero shuffle) — the consolidated gate shape."""
    w = T.words(F.col("text"))
    n_tok = F.size(w).cast("long")
    stop = _marker_count(w, C.STOPWORDS_EN)
    ratio = stop.cast("double") / n_tok.cast("double")
    quality = (ratio * 0.5
               + F.least(n_tok, F.lit(100)).cast("double") / 200.0)
    cnt_en = _marker_count(w, C.LANG_MARKERS["en"])
    cnt_nl = _marker_count(w, C.LANG_MARKERS["nl"])
    cnt_fr = _marker_count(w, C.LANG_MARKERS["fr"])
    g = F.greatest(cnt_en, cnt_nl, cnt_fr)
    pred = (F.when(cnt_en == g, "en")
            .when(cnt_nl == g, "nl")
            .otherwise("fr"))
    return docs.select(
        "doc_id", "lang", n_tok.alias("n_tokens"),
        stop.alias("stopword_cnt"), ratio.alias("stopword_ratio"),
        quality.alias("quality"), pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("lang_match"))


def text_profile(docs: DataFrame) -> DataFrame:
    """token_profile + text_qa in ONE narrow projection — the r5
    slot-consolidation (both merged shapes were themselves single-scan
    projections over documents, so the union of their columns still
    costs one scan, zero shuffles).  The component operators stay
    independently callable and are proven equal in
    tests/test_pipeline_queries.py."""
    w = T.words(F.col("text"))
    n_tok = F.size(w).cast("long")
    n_chars = F.length("text").cast("long")
    mean_len = ((n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"))
    cnt = lambda p: F.size(
        F.regexp_extract_all(F.col("text"), F.lit(p), F.lit(0))
    ).cast("long")
    na, nn, no = cnt(RE_ALPHA), cnt(RE_NUM), cnt(RE_OTHER)
    stop = _marker_count(w, C.STOPWORDS_EN)
    ratio = stop.cast("double") / n_tok.cast("double")
    quality = (ratio * 0.5
               + F.least(n_tok, F.lit(100)).cast("double") / 200.0)
    cnt_en = _marker_count(w, C.LANG_MARKERS["en"])
    cnt_nl = _marker_count(w, C.LANG_MARKERS["nl"])
    cnt_fr = _marker_count(w, C.LANG_MARKERS["fr"])
    g = F.greatest(cnt_en, cnt_nl, cnt_fr)
    pred = (F.when(cnt_en == g, "en")
            .when(cnt_nl == g, "nl")
            .otherwise("fr"))
    return docs.select(
        "doc_id", "lang", n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"), mean_len.alias("mean_token_len"),
        na.alias("n_alpha"), nn.alias("n_num"), no.alias("n_other"),
        (na + nn + no).alias("n_pieces"), stop.alias("stopword_cnt"),
        ratio.alias("stopword_ratio"), quality.alias("quality"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("lang_match"))


def domain_stats(pages: DataFrame) -> DataFrame:
    """(domain, n_pages, total_chars, mean_quality): per-domain corpus
    statistics — the grouping every Common-Crawl-style pipeline runs
    for domain-level filtering (spam domains, boilerplate farms).
    Domain = host part of the url (regexp, JVM-side); quality reuses
    the quality_score heuristic.  One hash aggregate; shuffle carries
    per-domain partials only."""
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)
    q = quality_score(pages.select(F.col("point_id").alias("doc_id"),
                                   "text"))
    # exactness doctrine: the mean is an integer micro-unit sum divided
    # once — never a float AVG (addition order diverges across engines)
    qm = F.round(F.col("quality") * 1_000_000).cast("long")
    j = (pages.select(F.col("point_id").alias("doc_id"), "url",
                      F.length("text").cast("long").alias("n_chars"))
         .join(q.select("doc_id", qm.alias("q_micro")), "doc_id"))
    g = (j.groupBy(host.alias("domain"))
         .agg(F.count(F.lit(1)).alias("n_pages"),
              F.sum("n_chars").alias("total_chars"),
              F.sum("q_micro").alias("q_sum")))
    mean_q = (F.col("q_sum").cast("double")
              / (F.lit(1_000_000.0) * F.col("n_pages")))
    return g.select("domain", "n_pages", "total_chars",
                    mean_q.alias("mean_quality"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — position-weighted polynomial hash over
    word hashes (rolling-hash document signature, window 8).

    Computed with explode + integer aggregate (not a Python loop):
    fp = SUM_i wh(w_i) * 131^((i-1) mod 8)  mod  2^31-1.
    """
    w = T.words(F.col("text"))
    e = (docs.select("doc_id", w.alias("warr"))
         .withColumn("pos", F.explode(F.sequence(F.lit(1), F.size("warr")))))
    wh = T.word_hash(F.element_at(F.col("warr"), F.col("pos").cast("int")))
    pow_arms = F.element_at(
        F.array(*[F.lit(p) for p in FP_POWS]),
        ((F.col("pos") - 1) % 8).cast("int") + 1)
    term = (wh * pow_arms) % C.P31
    return (e.select("doc_id", term.alias("term"))
            .groupBy("doc_id")
            .agg((F.sum("term") % C.P31).alias("fingerprint")))
