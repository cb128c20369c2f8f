"""URL canonicalization vs an independent urllib reference, plus
idempotence and snapshot-merging behavior."""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import functions as F

from greenexp_r_spark.operators import urls


def _py_canonical(u: str) -> str:
    """Independent reference implementation (urllib-based)."""
    u = u.split("#", 1)[0]
    p = urlsplit(u)
    scheme = p.scheme.lower()
    netloc = p.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    if scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = p.path
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    out = f"{scheme}://{netloc}{path}"
    if p.query:
        out += f"?{p.query}"
    return out


FIXTURES = [
    "HTTP://Site.Example:80/a//b#frag",
    "https://Site.Example:443/x/",
    "https://site.example/x/",
    "http://site.example/a/b?",
    "http://site.example/a/b?Q=CaSe",
    "https://site.example///a///b///",
    "http://site.example:8080/keep/port",
    "https://site.example/",
    "https://site.example",
    "http://SITE.example/MiXeD/CaSe?x=1#y",
    "https://site9.example/page/9",
]


def test_matches_urllib_reference(spark):
    df = spark.createDataFrame([(u,) for u in FIXTURES], "url string")
    got = [r[0] for r in
           df.select(urls.canonical_url(F.col("url"))).collect()]
    want = [_py_canonical(u) for u in FIXTURES]
    assert got == want


def test_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in FIXTURES], "url string")
    once = df.select(urls.canonical_url(F.col("url")).alias("url"))
    twice = once.select(urls.canonical_url(F.col("url")).alias("url"))
    assert [r[0] for r in once.collect()] == \
        [r[0] for r in twice.collect()]


def test_variant_urls_merge_in_snapshot(spark):
    """Two syntactic variants of one resource collapse to a single
    snapshot row after canonicalization."""
    from greenexp_r_spark.operators import pages_ops
    rows = [
        ("HTTP://A.example:80/p//1#x", "2024-01-01 00:00:00",
         b"<html><body>old</body></html>", "old", "en"),
        ("http://a.example/p/1", "2024-06-01 00:00:00",
         b"<html><body>new</body></html>", "new", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, "
              "text string, lang string") \
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    snap = pages_ops.latest_snapshot(urls.canonicalize(df)).collect()
    assert len(snap) == 1
    assert snap[0]["url"] == "http://a.example/p/1"
    assert snap[0]["text"] == "new"
