"""Structured Streaming ingest of the input_hint pages table.

A production crawl delivers captures continuously; the snapshot table
(latest capture per url) is therefore naturally a streaming stateful
aggregation, not a nightly batch.  This module streams documents
parquet as a file source, expands the deterministic capture schedule
(same single-scan explode as sources/pages.py), and maintains the
argmax-by-warc_ts state per url as a watermarked max-struct aggregate:

    readStream → capture explode → withWatermark(warc_ts) →
    groupBy(url).agg(MAX(struct(warc_ts, n_chars, lang)))

State is one struct per url; with append/update sinks the watermark
bounds how long a url's state must be retained after its last capture
(here 30 days — re-crawls beyond the watermark would start a fresh
row, the documented trade-off of streaming snapshotting).

Batch-stream equivalence: tests/test_pages_stream.py runs this with
trigger(availableNow=True) over the static input and asserts equality
with the batch `pages_ops.latest_snapshot` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import pages as P
from .events_stream import stage_as_dir


def pages_snapshot_stream(spark: SparkSession, docs_path: str,
                          watermark: str = "30 days") -> DataFrame:
    """Streaming latest-capture-per-url: (url, warc_ts, n_chars,
    lang, n_captures), state = one max-struct + counter per url.
    n_captures is the per-url capture count — a lineage/row-count
    metric (north_rule) that also makes restart tests loss- AND
    duplication-sensitive (the max-struct alone is idempotent, so a
    replayed file would be invisible to it)."""
    docs_path = stage_as_dir(docs_path)
    static = spark.read.parquet(docs_path)
    stream = spark.readStream.schema(static.schema).parquet(docs_path)
    pages = P._pages_from_docs(stream)
    best = F.max(F.struct(
        "warc_ts",
        F.length(F.decode("html", "UTF-8")).cast("long").alias("n_html"),
        "lang")).alias("s")
    agg = (pages
           .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
           .withWatermark("warc_ts", watermark)
           .groupBy("url").agg(best,
                               F.count(F.lit(1)).alias("n_captures")))
    return agg.select(
        "url", "s.warc_ts",
        (F.col("s.n_html") - P.WRAP_LEN).alias("n_chars"), "s.lang",
        "n_captures")


def run_snapshot_available_now(spark: SparkSession, docs_path: str,
                               table_name: str = "pages_snap",
                               checkpoint: str | None = None) -> DataFrame:
    """Drain all CURRENTLY available input with availableNow and
    return the snapshot as a batch DataFrame (complete-mode in-memory
    sink).  Pass the SAME `checkpoint` across calls to resume: the
    file source's processed-file log and the aggregation state both
    live in the checkpoint, so a restart reads only NEW files and
    re-emits the full recovered state — kill-and-restart loses
    nothing and re-processes nothing (tests/test_pages_stream.py)."""
    w = (pages_snapshot_stream(spark, docs_path)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True))
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination()
    return spark.table(table_name)
