"""BM25 relevance scoring against a fixed query-term set — the
classic retrieval score (Robertson/Sparck-Jones; the Lucene
``k1=1.2, b=0.75`` variant with the log(1+x) idf, non-negative for
common terms).  In an LLM-data pipeline this is the query-relevance
quality signal: score every document against a benchmark/topic term
list (e.g. to up-sample in-domain text or build retrieval eval sets).

Exactness contract (the quantized-contract doctrine, BENCH/BASELINE
r4): every input to the float expression is an INTEGER aggregate
(tf, df, dl, n_docs, sum_len) computed exactly on both engines; the
per-(doc, term) double contribution is evaluated from the SAME SQL
text on both sides (the Spark column is ``F.expr(contrib_sql())``, so
both engines parse one expression tree of correctly-rounded +,-,*,/
plus one ``ln``), then quantized to micro-units with FLOOR(x*1e6+0.5)
— four orders of margin above the ≤few-ulp ``ln`` divergence — and
summed as BIGINT per document.

Plan shape (100 TB posture): the term list is a literal (tiny);
  * tf: ONE filtered explode (w IN terms pushes below the aggregate)
    → hash agg on (doc_id, w) — shuffle carries matched positions only;
  * df: groupBy(w) over the tf table — ≤|terms| rows, broadcast;
  * corpus stats (n_docs, sum_len): one 1-row aggregate, broadcast;
  * final: docs LEFT JOIN per-doc sums (miss → score 0).
Zero corpus×corpus joins, zero Python.

Reference analog: none in GreenExp_R (LLM-pipeline brief); formula
per Robertson et al. TREC-3 and the Lucene practical variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import constants as C
from ..functions import text as T


def contrib_sql() -> str:
    """The per-(doc, term) BM25 contribution in micro-units — ONE
    shared SQL text parsed by both engines (columns: tf, df, dl,
    n_docs, sum_len; all BIGINT)."""
    idf = ("ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)"
           " / (CAST(df AS DOUBLE) + 0.5))")
    # dl/avgdl written as dl*n_docs/sum_len with explicit casts so the
    # rounding sequence is identical on both engines
    tfn = ("(CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE)"
           " + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE)"
           " * CAST(n_docs AS DOUBLE)) / CAST(sum_len AS DOUBLE))))")
    return (f"CAST(FLOOR(1000000.0 * ({idf}) * ({tfn}) + 0.5)"
            f" AS BIGINT)")


def bm25_scores(docs: DataFrame,
                terms: tuple[str, ...] = None) -> DataFrame:
    """(doc_id, n_hit_terms, bm25_micro) for every document (docs
    with no query term score 0)."""
    terms = C.BM25_TERMS if terms is None else terms
    w = T.words(F.col("text"))
    base = docs.select("doc_id", F.size(w).cast("long").alias("dl"),
                       F.explode(w).alias("w"))
    tf = (base.where(F.col("w").isin(*terms))
          .groupBy("doc_id", "w")
          .agg(F.count(F.lit(1)).alias("tf"),
               F.max("dl").alias("dl")))
    df_t = tf.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(T.words(F.col("text"))).cast("long"))
         .alias("sum_len"))
    scored = (tf.join(F.broadcast(df_t), "w")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", F.expr(contrib_sql()).alias("c")))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum("c").alias("bm25_micro"))
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hit_terms", F.lit(0))
                     .alias("n_hit_terms"),
                    F.coalesce("bm25_micro", F.lit(0))
                     .alias("bm25_micro")))


def bm25_ctes(d, term_list_sql: str) -> str:
    """Shared-SQL CTE chain ending in bm25(doc_id, n_hit_terms,
    bm25_micro) — replays :func:`bm25_scores` over a preceding
    ``documents`` view; rendered through the Dialect layer like every
    sibling oracle fragment; ``term_list_sql`` is the quoted
    IN-list."""
    w = d.split("text")
    base = (f"SELECT doc_id, {w} AS warr,"
            f" CAST({d.asize(w)} AS BIGINT) AS dl FROM documents")
    exploded = d.explode_range(base, "p", "1", d.asize("warr"))
    return f"""
bm_base AS (
  SELECT doc_id, dl, {d.elem('warr', 'p')} AS w
  FROM ({exploded}) _bmw
),
bm_tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
  FROM bm_base WHERE w IN ({term_list_sql})
  GROUP BY doc_id, w
),
bm_df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df
          FROM bm_tf GROUP BY w),
bm_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM({d.asize(d.split('text'))}) AS BIGINT) AS sum_len
  FROM documents
),
bm_scored AS (
  SELECT doc_id, {contrib_sql()} AS c
  FROM bm_tf JOIN bm_df USING (w) CROSS JOIN bm_stats
),
bm_agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(SUM(c) AS BIGINT) AS bm25_micro
  FROM bm_scored GROUP BY doc_id
),
bm25 AS (
  SELECT d.doc_id,
         COALESCE(a.n_hit_terms, 0) AS n_hit_terms,
         COALESCE(a.bm25_micro, 0) AS bm25_micro
  FROM documents d LEFT JOIN bm_agg a ON d.doc_id = a.doc_id
)"""
