"""WARC container roundtrip: pages table → per-partition .warc.gz +
CDX-style index → ranged-read source → exact input_hint rows back.
"""
from __future__ import annotations

import gzip
import os

import pytest

from greenexp_r_spark.sources import pages as P
from greenexp_r_spark.sources import warc as W


def _pages_pd(spark, sf_dir, n_urls=None):
    df = P.pages_df(spark, sf_dir)
    pd = df.toPandas().sort_values(["url", "warc_ts"]) \
           .reset_index(drop=True)
    return pd


def test_warc_roundtrip_exact(spark, sf_dir, tmp_path):
    pages = P.pages_df(spark, sf_dir).repartition(3)
    out = str(tmp_path / "warc")
    idx = W.pages_to_warc(pages, out)
    # index covers every capture, one file per non-empty partition
    assert idx.count() == pages.count()
    files = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert 1 <= len(files) <= 3

    got = W.read_warc(spark, out).toPandas() \
           .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    want = _pages_pd(spark, sf_dir)
    assert list(got.columns) == ["url", "warc_ts", "html", "text",
                                 "lang"]
    assert len(got) == len(want)
    assert (got["url"] == want["url"]).all()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert all(bytes(a) == bytes(b)
               for a, b in zip(got["html"], want["html"]))
    # byte-identical extracted text (the input_hint invariant)
    assert (got["text"] == want["text"]).all()
    assert (got["lang"] == want["lang"]).all()


def test_warc_ranged_single_record(spark, sf_dir, tmp_path):
    """Each gzip member decodes standalone from its (offset, length)
    slice — the Common-Crawl ranged-GET contract."""
    pages = P.pages_df(spark, sf_dir).limit(20).coalesce(1)
    out = str(tmp_path / "warc1")
    idx = W.pages_to_warc(pages, out).collect()
    want = {(r["url"], r["warc_us"]) for r in idx}
    for r in idx:
        url, us, html, lang = W.read_member(r["path"], r["offset"],
                                            r["length"])
        assert (url, us) in want
        assert html.startswith(b"<html><body>")
        assert lang in ("en", "nl", "de", "fr", "es", "it", "zz") \
            or len(lang) == 2
    # offsets tile the file exactly (no gaps/overlap)
    by_path = {}
    for r in idx:
        by_path.setdefault(r["path"], []).append(r)
    for path, rows in by_path.items():
        rows.sort(key=lambda r: r["offset"])
        pos = 0
        for r in rows:
            assert r["offset"] == pos
            pos += r["length"]
        assert pos == os.path.getsize(path)


def test_warc_record_bytes_deterministic():
    a = W.build_record("https://x.example/page/1", 1_700_000_000_123456,
                       b"<html><body>hi</body></html>", "en")
    b = W.build_record("https://x.example/page/1", 1_700_000_000_123456,
                       b"<html><body>hi</body></html>", "en")
    assert a == b
    assert W.compress_member(a) == W.compress_member(b)
    url, us, html, lang = W.read_warc_record(a)
    assert url == "https://x.example/page/1"
    assert us == 1_700_000_000_123456
    assert html == b"<html><body>hi</body></html>" and lang == "en"


def test_warc_date_micro_roundtrip():
    for us in (0, 1, 999_999, 1_704_067_200_000_000,
               1_711_111_111_654_321):
        assert W._parse_warc_date(W._warc_date(us)) == us


def test_warc_read_parallelism_invariant(spark, sf_dir, tmp_path):
    pages = P.pages_df(spark, sf_dir).limit(200).repartition(2)
    out = str(tmp_path / "warc2")
    W.pages_to_warc(pages, out)
    one = W.read_warc(spark, out, n_partitions=1).toPandas() \
           .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    many = W.read_warc(spark, out, n_partitions=7).toPandas() \
            .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert one.equals(many)


def test_warc_truncation_detected(tmp_path):
    rec = W.build_record("https://x.example/page/2", 123_456_789,
                         b"<html><body>payload</body></html>", "en")
    with pytest.raises(ValueError):
        W.read_warc_record(rec[:len(rec) - 24])
    # corrupt member: gzip itself must refuse
    m = bytearray(W.compress_member(rec))
    m[len(m) // 2] ^= 0xFF
    with pytest.raises(Exception):
        gzip.decompress(bytes(m))
