"""Training-corpus export — the capstone sink composing the pipeline:

    corpus_select  (quality + langID + dedup-keeper + mixture draw
                    + leakage-free split)
      → train-split filter
      → token accounting (the dataset-card numbers for THIS release)
      → icetable commit (atomic manifest, per-file row counts/stats)

What ships is what production shards look like: an atomically
committed table whose manifest IS the release record (file list, row
counts, min/max stats), plus a one-row summary of documents/tokens
exported.  Determinism is the tested contract: two exports of the
same corpus produce identical rows and identical per-file row-count
multisets, so a resumed or re-run release is byte-comparable.

100 TB posture: every stage is the already-audited operator (no new
shuffles introduced here); the final write inherits the partitioning
of the select output, and ``target_rows`` hands shard sizing to
icetable.compact-style bin counting up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import corpus_select
from ..functions import text as T
from ..sources import icetable


def train_corpus(docs: DataFrame) -> DataFrame:
    """The kept train-split rows with their text and token counts —
    corpus_select filtered to (sampled AND split='train'), text and
    n_tokens re-attached from the one corpus scan."""
    kept = (corpus_select(docs)
            .where(F.col("sampled") & (F.col("split") == "train")))
    body = docs.select(
        "doc_id", "text", "lang", "source",
        F.size(T.words(F.col("text"))).cast("long").alias("n_tokens"))
    return kept.join(body, "doc_id")


def export_training_shards(spark: SparkSession, docs: DataFrame,
                           table: str,
                           target_rows: int = 1_000_000) -> dict:
    """Run the capstone and commit it; returns the release summary
    (snapshot, n_files, n_docs, n_tokens)."""
    # checkpoint: the agg below and the commit write would otherwise
    # EACH execute the full quality/dedup/sample/split pipeline — a
    # second complete corpus pass at scale
    out = train_corpus(docs).localCheckpoint(eager=True)
    n_docs, n_tokens = out.agg(
        F.count(F.lit(1)), F.sum("n_tokens")).first()
    n_tokens = int(n_tokens) if n_tokens is not None else 0  # empty split
    n_files = max(1, -(-int(n_docs) // target_rows))
    snap = icetable.commit(
        out.repartition(n_files, "doc_id"), table,
        stat_cols=["doc_id", "lang", "source", "n_tokens"],
        props={"n_docs": int(n_docs), "n_tokens": n_tokens})
    return {"snapshot": snap,
            "n_files": icetable.metrics(table, snap)["n_files"],
            "n_docs": int(n_docs), "n_tokens": n_tokens}
