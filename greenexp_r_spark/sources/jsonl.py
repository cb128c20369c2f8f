"""JSONL corpus source/sink — the interchange format LLM corpora
actually ship in (one JSON object per line, gzip members per shard).

Thin, deliberately: Spark's native JSON reader/writer already does the
heavy lifting (distributed line-split reads, per-partition shard
writes, codec negotiation).  What this wrapper adds is the part the
native API gets wrong for a *corpus* contract:

  * schema is PINNED on read (no sampling inference — at 100 TB,
    schema inference is a full extra pass AND nondeterministic when a
    rare field is missing from the sampled split);
  * timestamps round-trip through explicit ISO-8601 strings (Spark's
    JSON timestamp inference is locale/option-dependent);
  * binary columns round-trip through base64 (JSON has no bytes).

Shards written = input partitions (one `part-*.json.gz` each), so
shard sizing is the usual repartition decision upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as X

PAGES_JSON_SCHEMA = X.StructType([
    X.StructField("url", X.StringType()),
    X.StructField("warc_ts", X.StringType()),     # ISO-8601 micros
    X.StructField("html_b64", X.StringType()),    # base64 bytes
    X.StructField("text", X.StringType()),
    X.StructField("lang", X.StringType()),
])

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """input_hint pages table → gzip JSONL shards."""
    (pages.select(
        "url",
        F.date_format("warc_ts", TS_FMT).alias("warc_ts"),
        F.base64("html").alias("html_b64"),
        "text", "lang")
     .write.mode("overwrite")
     .option("compression", "gzip").json(path))


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """gzip JSONL shards → the exact input_hint schema (url, warc_ts
    timestamp, html binary, text, lang)."""
    raw = spark.read.schema(PAGES_JSON_SCHEMA).json(path)
    return raw.select(
        "url",
        F.to_timestamp("warc_ts", TS_FMT).alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
        "text", "lang")


# ------------------------------------------------- generic (any table)
# The pages pair above is the north-rule fast path; these derive the
# same contract (pinned schema, ISO timestamps, base64 binary) from
# ANY flat schema, so every table in the engine ships as JSONL.

_TS_KINDS = ("timestamp", "timestamp_ntz")


def write_jsonl(df: DataFrame, path: str) -> None:
    """Any flat DataFrame → gzip JSONL shards; binary → base64,
    timestamps → explicit micro-precision strings (the two JSON
    round-trip traps), everything else verbatim."""
    cols = []
    for f in df.schema:
        t = f.dataType.simpleString()
        if t == "binary":
            cols.append(F.base64(F.col(f.name)).alias(f.name))
        elif t in _TS_KINDS:
            cols.append(F.date_format(F.col(f.name), TS_FMT)
                        .alias(f.name))
        else:
            cols.append(F.col(f.name))
    (df.select(*cols).write.mode("overwrite")
     .option("compression", "gzip").json(path))


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """gzip JSONL shards → exactly ``schema`` (the caller-pinned
    target schema — NEVER inferred: at 100 TB inference is a full
    extra pass and nondeterministic under rare fields)."""
    import pyspark.sql.types as X

    wire_fields, decode = [], []
    for f in schema:
        t = f.dataType.simpleString()
        if t == "binary":
            wire_fields.append(X.StructField(f.name, X.StringType()))
            decode.append(F.unbase64(F.col(f.name)).alias(f.name))
        elif t in _TS_KINDS:
            wire_fields.append(X.StructField(f.name, X.StringType()))
            ts = F.to_timestamp(F.col(f.name), TS_FMT)
            if t == "timestamp_ntz":
                ts = ts.cast("timestamp_ntz")
            decode.append(ts.alias(f.name))
        else:
            wire_fields.append(X.StructField(f.name, f.dataType))
            decode.append(F.col(f.name))
    raw = spark.read.schema(X.StructType(wire_fields)).json(path)
    return raw.select(*decode)
