"""Inverted index (posting lists) over the document corpus — the
search-side artifact an LLM-data platform ships next to the corpus
(retrieval eval sets, dedup forensics, "which documents contain X"
ad-hoc queries all run off it; BM25 in operators/bm25.py scores a
FIXED term list per document, this builds the term→documents mapping
for ARBITRARY lookups).

Layout (the Lucene/block-max idea adapted to columnar storage):

  flat postings   (term, doc_id, tf)                one explode + one
                                                    hash aggregate
  packed index    (term, df, block_id, postings:    per-term doc-sorted
                   array<struct<doc_id, tf>>)       FIXED-SIZE blocks

100 TB posture: the packed rows are the scale contract — a stopword's
posting list is millions of documents, so packing it into ONE array
row would OOM the task that builds it (the classic reducer-skew
failure).  Blocks of ``block_docs`` cap every array, turning the one
hot key into many bounded rows; writing the packed table bucketed by
term (plans/bucketing.py or icetable bucket(N, term_hash)) then makes
a point lookup a pruned scan.  df is carried on every block so a
lookup never needs a second aggregate.

Exactness: tf/df/block_id are integer counts and window ranks with a
total order (doc_id tie-break) — the DuckDB oracle in
tests/test_searchindex.py matches bit-for-bit on the exploded form.

Reference analog: none in GreenExp_R (LLM-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T

BLOCK_DOCS = 1024          # postings per packed block


def postings(docs: DataFrame) -> DataFrame:
    """Flat posting rows (term, doc_id, tf).  One projection-explode
    (the shuffle carries (term, doc_id) pairs, never text) and one
    map-side-combinable hash aggregate."""
    return (docs
            .select("doc_id", F.explode(T.words(F.col("text")))
                    .alias("term"))
            .where(F.length("term") > 0)
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


def packed_index(docs: DataFrame,
                 block_docs: int = BLOCK_DOCS) -> DataFrame:
    """(term, df, block_id, postings) with every ``postings`` array
    doc-sorted and at most ``block_docs`` long.

    The per-term window is the one shuffle that matters at scale; its
    key is the term, and the block split is precisely the skew
    mitigation — downstream work (packing arrays, writing) happens on
    (term, block_id) keys whose payload is bounded by construction.
    """
    flat = postings(docs)
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = flat.select(
        "term", "doc_id", "tf",
        F.count(F.lit(1)).over(
            Window.partitionBy("term")).cast("long").alias("df"),
        ((F.row_number().over(w) - 1) / block_docs)
        .cast("long").alias("block_id"))
    return (ranked
            .groupBy("term", "df", "block_id")
            .agg(F.sort_array(F.collect_list(
                F.struct("doc_id", "tf"))).alias("postings")))


def unpack_index(index: DataFrame) -> DataFrame:
    """Exploded view of a packed index — (term, df, block_id, doc_id,
    tf), the flat-integer form the DuckDB parity check compares."""
    return index.select(
        "term", "df", "block_id",
        F.explode("postings").alias("p")
    ).select("term", "df", "block_id",
             F.col("p.doc_id").alias("doc_id"),
             F.col("p.tf").alias("tf"))


def conjunctive_lookup(index: DataFrame,
                       terms: tuple[str, ...]) -> DataFrame:
    """Documents containing ALL of ``terms`` → (doc_id, total_tf).

    The term filter is a literal IN-list applied BEFORE the explode,
    so only the queried terms' blocks are ever opened (with a
    term-bucketed table layout that's a pruned file subset); the AND
    is one distinct-count aggregate keyed by doc_id.
    """
    terms = tuple(dict.fromkeys(terms))     # a duplicate term is one
    hits = (index.where(F.col("term").isin(*terms))
            .select("term", F.explode("postings").alias("p"))
            .select("term", F.col("p.doc_id").alias("doc_id"),
                    F.col("p.tf").alias("tf")))
    # a doc_id occurs at most ONCE per term (blocks partition a
    # term's postings by doc), so plain count == distinct-term count
    # — and drops the two-phase distinct aggregate's extra exchange
    return (hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.sum("tf").cast("long").alias("total_tf"))
            .where(F.col("n_terms") == len(terms))
            .select("doc_id", "total_tf"))


# ------------------------------------------------------------- oracles

def postings_sql(d, block_docs: int = BLOCK_DOCS,
                 table: str = "documents") -> str:
    """DuckDB rendering of :func:`unpack_index` (flat integer form)."""
    w = d.split("text")
    base = f"SELECT doc_id, {w} AS warr FROM {table}"
    exploded = d.explode_range(base, "p", "1", d.asize("warr"))
    return f"""
WITH flat AS (
  SELECT {d.elem('warr', 'p')} AS term, doc_id
  FROM ({exploded}) _w
  WHERE length({d.elem('warr', 'p')}) > 0
),
tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM flat GROUP BY term, doc_id
)
SELECT term,
       CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
       CAST({d.idiv('(ROW_NUMBER() OVER (PARTITION BY term '
                     'ORDER BY doc_id) - 1)', str(block_docs))}
            AS BIGINT) AS block_id,
       doc_id, tf
FROM tf
"""


def lookup_sql(d, terms: tuple[str, ...],
               table: str = "documents") -> str:
    """DuckDB rendering of :func:`conjunctive_lookup`."""
    # same dedupe as the operator: ('a','a') means "contains a", not
    # an unsatisfiable COUNT(DISTINCT term) = 2
    terms = tuple(dict.fromkeys(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    w = d.split("text")
    base = f"SELECT doc_id, {w} AS warr FROM {table}"
    exploded = d.explode_range(base, "p", "1", d.asize("warr"))
    return f"""
WITH flat AS (
  SELECT {d.elem('warr', 'p')} AS term, doc_id
  FROM ({exploded}) _w
),
tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM flat WHERE term IN ({inlist})
  GROUP BY term, doc_id
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf
FROM tf GROUP BY doc_id
HAVING COUNT(DISTINCT term) = {len(terms)}
"""
