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
    lang), state = one max-struct per url."""
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
           .groupBy("url").agg(best))
    return agg.select(
        "url", "s.warc_ts",
        (F.col("s.n_html") - P.WRAP_LEN).alias("n_chars"), "s.lang")


def run_snapshot_available_now(spark: SparkSession, docs_path: str,
                               table_name: str = "pages_snap") -> DataFrame:
    """Drain the full input with availableNow and return the snapshot
    as a batch DataFrame (complete-mode in-memory sink)."""
    q = (pages_snapshot_stream(spark, docs_path)
         .writeStream.format("memory").queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(table_name)
