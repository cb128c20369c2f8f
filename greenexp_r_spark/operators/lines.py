"""Corpus-level line deduplication (boilerplate removal).

The CCNet / C4 preprocessing step every web-text pipeline runs before
training: newline-separated lines that repeat across many documents
are navigation / footer / cookie-banner boilerplate, not content —
they are removed from every document, and each document's surviving
lines keep their original order.  Documents that lose every line are
dropped (the C4 empty-document filter).

Spark-first shape (the 100 TB posture):

  * explode lines (narrow posexplode) → ONE hash aggregate counting
    distinct documents per line (map-side partial aggregation; the
    shuffle carries (line, partial df) over the distinct-line table,
    which is far smaller than the corpus);
  * the boilerplate set (doc-frequency > threshold) is
    DIMENSION-sized by construction — only lines repeated across >K
    documents qualify — so it re-enters as a BROADCAST anti-join
    against the exploded lines (no corpus-sized shuffle).  At the
    100 TB target, K is set as a corpus fraction, which bounds the
    set at corpus_docs/K entries; if a deployment's boilerplate tail
    still outgrows the broadcast budget, drop the explicit hint and
    let AQE route the anti-join to shuffle on runtime size stats —
    the plan stays an equi-join either way;
  * reassembly is one groupBy(doc_id) shuffle with order restored
    from the exploded position via array_sort over (pos, line)
    structs — exact, unlike bare collect_list, whose order is
    execution-dependent.

The synthetic corpus is single-line (no boilerplate), so the gate
query proves the semantics over a deterministically augmented text
(`with_boiler_lines`): a nav line in every document, a copyright
footer in every 2nd, a newsletter line in every 5th, and a unique
per-document footer that must survive — the dedup.augmented_corpus
precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Lines repeating across more than this many documents are
# boilerplate.  A fixed count keeps the Spark and SQL sides trivially
# identical at every test scale; a production run would set it as a
# fraction of the corpus document count (computed once, driver-side).
BOILER_MIN_DF = 20

NL = "\n"


def with_boiler_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, ltext) — deterministic multi-line augmentation of the
    single-line corpus: shared boilerplate + the original text + a
    per-document footer (mirrored verbatim by the SQL oracle)."""
    d = F.col("doc_id")
    footer = F.when(d % 2 == 0, F.lit("copyright example footer")) \
        .otherwise(F.concat(F.lit("footer fid "), d.cast("string")))
    news = F.when(d % 5 == 0,
                  F.concat(F.lit(NL), F.lit("subscribe newsletter now"))) \
        .otherwise("")
    ltext = F.concat(F.lit("nav home about contact" + NL),
                     F.col("text"), F.lit(NL), footer, news)
    return docs.select("doc_id", ltext.alias("ltext"))


def line_frequencies(df: DataFrame, col: str = "ltext") -> DataFrame:
    """(line, df) — distinct-document frequency per line; one explode
    + hash aggregate."""
    lines = df.select(
        "doc_id", F.explode(F.split(F.col(col), NL)).alias("line"))
    return lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("df"))


def line_dedup(df: DataFrame, col: str = "ltext",
               min_df: int = BOILER_MIN_DF) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_kept, n_removed) — remove every
    line whose corpus doc-frequency exceeds ``min_df``; per-document
    line order is preserved; fully-scrubbed documents are dropped."""
    arr = F.split(F.col(col), NL)
    lines = df.select(
        "doc_id", F.size(arr).cast("long").alias("n_lines"),
        F.posexplode(arr).alias("pos", "line"))
    boiler = (line_frequencies(df, col)
              .where(F.col("df") > min_df)
              .select("line", F.lit(True).alias("_boiler")))
    kept = (lines.join(F.broadcast(boiler), "line", "left_outer")
            .where(F.col("_boiler").isNull()))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "line"))),
        lambda x: x["line"])
    return (kept.groupBy("doc_id")
            .agg(F.array_join(ordered, NL).alias("clean_text"),
                 F.max("n_lines").alias("n_lines"),
                 F.count("*").cast("long").alias("n_kept"))
            .withColumn("n_removed",
                        (F.col("n_lines") - F.col("n_kept"))
                        .cast("long")))
