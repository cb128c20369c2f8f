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


def exact_quantiles(docs: DataFrame, col: str = "n_chars",
                    qs: tuple = (25, 50, 75, 90, 99)) -> DataFrame:
    """EXACT percentiles of an integer column at any corpus size —
    no approx sketch needed when the value DOMAIN is bounded: one
    hash aggregate builds the value histogram (distinct values ≪
    rows), a cumulative sum over the histogram (domain-sized, single
    partition by construction — document lengths have thousands of
    distinct values, not billions) and an integer ceil-rank pick per
    percentile (quantile_disc semantics: the element at 1-based rank
    ceil(q·n/100)).  All integer arithmetic → DuckDB bit-parity.

    Output: (q_pct, value)."""
    from pyspark.sql import Window
    h = (docs.groupBy(F.col(col).alias("v"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    # n = the histogram's own total (an unbounded window over the
    # domain-sized table) — a docs.count() here would be a SECOND
    # full corpus scan purely for the rank cutoffs
    wall = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                           Window.unboundedFollowing)
    cum = h.select(
        "v", F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("_n"))
    qdf = docs.sparkSession.createDataFrame(
        [(int(q),) for q in qs], "q_pct long")
    rank_needed = F.expr("(_n * q_pct + 99) div 100")
    return (cum.join(F.broadcast(qdf), F.col("cum") >= rank_needed)
            .groupBy("q_pct").agg(F.min("v").alias("value")))


def exact_quantiles_sql(col: str = "n_chars",
                        qs: tuple = (25, 50, 75, 90, 99),
                        table: str = "documents") -> str:
    """DuckDB rendering of :func:`exact_quantiles`."""
    vals = ", ".join(f"({int(q)})" for q in qs)
    return f"""
WITH h AS (
  SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY {col}
),
cum AS (
  SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM h
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
qd AS (SELECT CAST(q AS BIGINT) AS q_pct,
              (n.n * q + 99) // 100 AS rank_needed
       FROM (VALUES {vals}) _q(q), n)
SELECT q_pct, MIN(v) AS value
FROM cum JOIN qd ON cum.cum >= qd.rank_needed
GROUP BY q_pct
"""


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
