"""Sequence packing — chop the token stream into training examples.

The last step of every LLM pretraining pipeline: documents are
tokenized, concatenated in a fixed global order with an EOS separator
after each, and the resulting token stream is chopped into fixed-
length training sequences (GPT-2/3 style "document packing").  The
per-document question is *where each document lands*: its global
token offset, the first and last sequence it touches, and whether it
straddles a boundary (the rows a masking/attention-reset
implementation needs).

The global offset is a corpus-wide prefix sum — the textbook
scale-hostile operation (a naive `ORDER BY doc_id` window is one
task).  Spark-first shape (the 100 TB posture), the classic two-phase
scan decomposition:

  1. bucket documents by `doc_id div PACK_BUCKET_SPAN` — buckets are
     ordered by construction (doc_id order == (bucket, doc_id)
     order), so no global sort is ever performed on the corpus;
  2. ONE hash aggregate produces per-bucket token totals — a
     DIMENSION-sized table (corpus_size / PACK_BUCKET_SPAN rows);
     its exclusive prefix sum runs as a single-partition window over
     that small table only (the size-routing doctrine: driver-scale
     work on dimension-sized data);
  3. the bucket offsets BROADCAST back and a per-bucket window
     (partitionBy bucket, orderBy doc_id) adds the local exclusive
     prefix — parallel across buckets.

The SQL oracle computes the same offsets with one flat global window
(`SUM(..) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)`), so a
hash match proves the two-phase decomposition exactly equal to the
sequential semantics.  All arithmetic is BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window

from ..functions import text as T

SEQ_LEN = 512          # tokens per packed training sequence
PACK_BUCKET_SPAN = 64  # doc_ids per prefix-sum bucket (dimension-
                       # sized bucket table: n_docs/64 rows)


def seq_pack(docs: DataFrame, seq_len: int = SEQ_LEN,
             bucket_span: int = PACK_BUCKET_SPAN) -> DataFrame:
    """(doc_id, n_tokens, tok_offset, pack_first, pack_last, n_packs,
    crosses_boundary) — token layout of the packed corpus stream.
    ``n_tokens`` counts the EOS separator appended to every document
    (whitespace tokens + 1), matching the concatenate-then-chop rule.
    """
    toks = (F.size(T.words(F.col("text"))) + 1).cast("long")
    base = docs.select(
        "doc_id", toks.alias("n_tokens"),
        (F.col("doc_id") - (F.col("doc_id") % bucket_span))
        .alias("bucket"))

    # phase 1+2: per-bucket totals -> exclusive prefix over the small
    # ordered bucket table (single partition over dimension-sized data)
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    bucket_offsets = (base.groupBy("bucket")
                      .agg(F.sum("n_tokens").alias("bt"))
                      .select("bucket",
                              F.coalesce(F.sum("bt").over(wb), F.lit(0))
                              .cast("long").alias("bucket_offset")))

    # phase 3: within-bucket exclusive prefix, parallel across buckets
    wl = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    local = F.coalesce(F.sum("n_tokens").over(wl), F.lit(0)).cast("long")
    placed = (base.join(F.broadcast(bucket_offsets), "bucket")
              .select("doc_id", "n_tokens",
                      (F.col("bucket_offset") + local).alias("tok_offset")))

    end = F.col("tok_offset") + F.col("n_tokens") - 1
    first = F.floor(F.col("tok_offset") / seq_len).cast("long")
    last = F.floor(end / seq_len).cast("long")
    return placed.select(
        "doc_id", "n_tokens", "tok_offset",
        first.alias("pack_first"), last.alias("pack_last"),
        (last - first + 1).alias("n_packs"),
        (last > first).alias("crosses_boundary"))


def oracle_sql(d, seq_len: int = SEQ_LEN) -> str:
    """The flat sequential-semantics oracle: one global window."""
    w = d.split("text")
    return f"""
WITH toks AS (
  SELECT doc_id, CAST({d.asize(w)} + 1 AS BIGINT) AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
  FROM toks
)
SELECT doc_id, n_tokens, tok_offset,
       CAST(FLOOR(CAST(tok_offset AS DOUBLE) / {seq_len}) AS BIGINT)
           AS pack_first,
       CAST(FLOOR(CAST(tok_offset + n_tokens - 1 AS DOUBLE) / {seq_len})
            AS BIGINT) AS pack_last,
       CAST(FLOOR(CAST(tok_offset + n_tokens - 1 AS DOUBLE) / {seq_len})
            AS BIGINT)
       - CAST(FLOOR(CAST(tok_offset AS DOUBLE) / {seq_len}) AS BIGINT)
       + 1 AS n_packs,
       CAST(FLOOR(CAST(tok_offset + n_tokens - 1 AS DOUBLE) / {seq_len})
            AS BIGINT)
       > CAST(FLOOR(CAST(tok_offset AS DOUBLE) / {seq_len}) AS BIGINT)
           AS crosses_boundary
FROM placed
"""
