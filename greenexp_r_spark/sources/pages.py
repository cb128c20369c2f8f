"""The input_hint pages table: Common-Crawl-style web captures.

Schema is EXACTLY the BASELINE.json input_hint shape:

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

synthesised deterministically from the driver's ``documents`` parquet
(no external data): every document is one crawl capture; a quarter of
the urls are re-crawled once and a sixteenth twice (recrawls carry the
same content, later ``warc_ts`` — the Common-Crawl dedup-by-latest
fixture).  ``html`` is the UTF-8 payload ``<html><body>{text}
</body></html>``; extracting it back must yield the byte-identical
``text`` (the input_hint per-row invariant, checked hash-exactly by
q_pages_snapshot).

Two renderings, same formulas (the world.py pattern):
  * ``pages_sql(d)``  — shared-SQL CTE body per Dialect (oracle side);
  * ``pages_df``      — native Spark DataFrame builder (engine side).

All capture-time arithmetic is BIGINT; timestamps are constructed from
epoch microseconds (timestamp_micros / make_timestamp), which the two
engines agree on bit-for-bit under the session's UTC timezone.

Scale notes (100 TB posture): the table is a pure narrow map over
documents (1-3 output rows per input row, no shuffle); at production
scale this source is a partitioned table scan and every downstream
operator treats (url, warc_ts) as the natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import constants as C
from ..dialect import Dialect

# capture-schedule constants (deterministic, integer-exact)
EPOCH_2024_S = C.EPOCH_2024_S         # 2024-01-01T00:00:00Z (single
                                      # source: constants.py — the
                                      # snapshot-delta cutoff derives
                                      # from the same value)
YEAR_S = 31_536_000
TS0_MUL, TS0_ADD = 7_919, 101
RE1_MOD = 4                            # every 4th url is re-crawled
RE1_MUL, RE1_ADD, RE1_SPAN = 104_729, 7, 8_000_000
RE2_MOD = 16                           # every 16th url twice
RE2_MUL, RE2_ADD, RE2_SPAN = 15_485_863, 3, 8_000_000
RE2_BASE = 9_000_000                   # > 1 + RE1_SPAN → capture order
                                       # is strictly 0 < 1 < 2, no ties

HTML_PRE = "<html><body>"              # 12 chars
HTML_POST = "</body></html>"           # 14 chars
WRAP_LEN = len(HTML_PRE) + len(HTML_POST)

URL_ID_RE = "page/([0-9]+)$"           # url → doc id (geocoding key)


def _s0(doc: str) -> str:
    return f"(({doc} * {TS0_MUL} + {TS0_ADD}) % {YEAR_S})"


def _url_sql(doc: str = "doc_id") -> str:
    return (f"'https://site' || CAST({doc} % 1000 AS STRING)"
            f" || '.example/page/' || CAST({doc} AS STRING)")


def pages_sql(d: Dialect) -> str:
    """Shared-SQL body of the pages table (UNION ALL of the three
    capture generations over ``documents``)."""
    wrap = f"'{HTML_PRE}' || text || '{HTML_POST}'"

    def cap(off_s: str, pred: str = "") -> str:
        us = f"({EPOCH_2024_S} + {_s0('doc_id')} + {off_s}) * 1000000"
        return (f"SELECT {_url_sql()} AS url, "
                f"{d.ts_micros(us)} AS warc_ts, "
                f"{d.s2b(wrap)} AS html, text, lang "
                f"FROM documents{pred}")

    c0 = cap("0")
    c1 = cap(f"1 + (doc_id * {RE1_MUL} + {RE1_ADD}) % {RE1_SPAN}",
             f" WHERE doc_id % {RE1_MOD} = 0")
    c2 = cap(f"{RE2_BASE} + (doc_id * {RE2_MUL} + {RE2_ADD}) % {RE2_SPAN}",
             f" WHERE doc_id % {RE2_MOD} = 0")
    return f"{c0}\nUNION ALL\n{c1}\nUNION ALL\n{c2}"


def _pages_from_docs(doc: DataFrame) -> DataFrame:
    """Single-scan capture expansion: the three capture generations
    are an exploded (offset, keep) array, not a UNION ALL of three
    re-reads — at 100 TB the documents table is scanned ONCE (the
    shared-SQL rendering keeps UNION ALL for oracle clarity; results
    are row-identical, tests/test_pages.py multiplicity check)."""
    did = F.col("doc_id")
    url = F.concat(F.lit("https://site"), (did % 1000).cast("string"),
                   F.lit(".example/page/"), did.cast("string"))
    html = F.encode(F.concat(F.lit(HTML_PRE), F.col("text"),
                             F.lit(HTML_POST)), "UTF-8")
    s0 = (did * TS0_MUL + TS0_ADD) % YEAR_S
    caps = F.array(
        F.struct(F.lit(0).cast("long").alias("off"),
                 F.lit(True).alias("keep")),
        F.struct((F.lit(1) + (did * RE1_MUL + RE1_ADD) % RE1_SPAN)
                 .cast("long").alias("off"),
                 (did % RE1_MOD == 0).alias("keep")),
        F.struct((F.lit(RE2_BASE) + (did * RE2_MUL + RE2_ADD) % RE2_SPAN)
                 .cast("long").alias("off"),
                 (did % RE2_MOD == 0).alias("keep")))
    e = (doc.select(did.alias("doc_id"), "text", "lang",
                    F.explode(caps).alias("c"))
         .where(F.col("c.keep")))
    us = (F.lit(EPOCH_2024_S) + s0 + F.col("c.off")) * 1_000_000
    return e.select(url.alias("url"),
                    F.timestamp_micros(us.cast("long")).alias("warc_ts"),
                    html.alias("html"), "text", "lang")


def pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side pages table (exact input_hint schema) from the
    driver's documents parquet."""
    from ..plans.widen import widen
    return _pages_from_docs(
        widen(spark.read.parquet(f"{sf_dir}/documents.parquet")))


def synthetic_pages(spark: SparkSession, n: int,
                    partitions: int | None = None) -> DataFrame:
    """Scale-testing pages table: the same capture schedule applied to
    spark.range ids with a synthetic text body — lets the bench grow
    the pages side arbitrarily (BASELINE.md two-parallelism scaling
    protocol) with the html/text payload weight included."""
    rng = (spark.range(0, n, 1, partitions) if partitions
           else spark.range(n))
    body = F.concat(
        F.lit("synthetic page body "),
        F.col("id").cast("string"), F.lit(" "),
        F.repeat(F.concat(F.lit("tok"),
                          (F.col("id") % 97).cast("string"), F.lit(" ")),
                 20))
    doc = rng.select(F.col("id").alias("doc_id"), body.alias("text"),
                     F.lit("en").alias("lang"))
    return _pages_from_docs(doc)
