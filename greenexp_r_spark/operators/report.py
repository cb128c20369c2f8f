"""Dataset-card corpus statistics (the reporting step every released
training corpus ships with: per-language × length-bucket document
counts and token/char totals, plus a one-row global summary).

Shape at 100 TB: both reports are ONE hash aggregate over a narrow
projection — map-side partial aggregation means the shuffle carries
(n_langs × 16) respectively 1 partial row per task, never documents.
All statistics are integer counts/sums (exactness doctrine), so the
DuckDB parity check in tests/test_report.py is bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T

LEN_BUCKET_CHARS = 256     # bucket = min(n_chars // 256, 15)
LEN_BUCKET_MAX = 15


def _base(docs: DataFrame) -> DataFrame:
    w = T.words(F.col("text"))
    return docs.select(
        "doc_id", "lang",
        F.size(w).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"))


def corpus_report(docs: DataFrame) -> DataFrame:
    """(lang, len_bucket, n_docs, total_tokens, total_chars): the
    per-language length-distribution grid of a dataset card."""
    b = F.least(F.expr(f"n_chars DIV {LEN_BUCKET_CHARS}"),
                F.lit(LEN_BUCKET_MAX)).cast("long")
    return (_base(docs)
            .groupBy("lang", b.alias("len_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars")))


def corpus_summary(docs: DataFrame) -> DataFrame:
    """One global row: n_docs, n_langs, total_tokens, total_chars —
    the headline numbers of the card."""
    return (_base(docs)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars")))


def top_terms(docs: DataFrame, k: int = 10) -> DataFrame:
    """(lang, term, cnt, rank): the k most frequent terms per language
    (ties broken by term, so the ranking is total and engine-exact) —
    the vocabulary slice of the dataset card.  Shape: explode → hash
    agg on (lang, term) → per-lang window over the AGGREGATED rows
    (vocab-sized, not corpus-sized)."""
    from pyspark.sql import Window
    cnts = (docs
            .select("lang", F.explode(T.words(F.col("text")))
                    .alias("term"))
            .where(F.length("term") > 0)
            .groupBy("lang", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(),
                                           F.col("term").asc())
    return (cnts.withColumn("rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k))


def top_terms_sql(dialect, k: int = 10,
                  table: str = "documents") -> str:
    """DuckDB rendering of :func:`top_terms`."""
    w = dialect.split("text")
    base = f"SELECT lang, {w} AS warr FROM {table}"
    exploded = dialect.explode_range(base, "p", "1",
                                     dialect.asize("warr"))
    return f"""
WITH cnts AS (
  SELECT lang, {dialect.elem('warr', 'p')} AS term,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({exploded}) _w
  WHERE length({dialect.elem('warr', 'p')}) > 0
  GROUP BY lang, term
)
SELECT lang, term, cnt,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank
FROM cnts QUALIFY rank <= {k}
"""


def report_sql(dialect, table: str = "documents") -> str:
    """DuckDB rendering of corpus_report (tests/test_report.py runs
    it side-by-side with the Spark plan)."""
    w = dialect.split("text")
    return f"""
SELECT lang, len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang,
         LEAST({dialect.idiv('length(text)', str(LEN_BUCKET_CHARS))},
               {LEN_BUCKET_MAX}) AS len_bucket,
         CAST({dialect.asize(w)} AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM {table}
) _b
GROUP BY lang, len_bucket
"""
