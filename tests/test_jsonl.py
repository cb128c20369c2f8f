"""JSONL source/sink roundtrip (sources/jsonl.py)."""

from __future__ import annotations

import glob

from greenexp_r_spark.sources import jsonl, pages


def test_pages_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    p = pages.pages_df(spark, sf_dir)
    out = str(tmp_path / "pages_jsonl")
    jsonl.write_pages_jsonl(p, out)
    assert glob.glob(out + "/part-*.json.gz"), "gzip shards expected"
    back = jsonl.read_pages_jsonl(spark, out)
    assert back.schema == p.schema
    a = sorted(map(tuple, p.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_pages_jsonl_read_is_schema_pinned(spark, tmp_path):
    # a shard missing a rare field must read as null, never flip the
    # schema (no inference pass)
    f = tmp_path / "x.json"
    f.write_text('{"url": "https://a.example/p/1", "text": "t"}\n')
    df = jsonl.read_pages_jsonl(spark, str(tmp_path))
    r = df.collect()[0]
    assert r["url"] == "https://a.example/p/1"
    assert r["html"] is None and r["warc_ts"] is None
    assert [x.name for x in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]


def test_generic_jsonl_roundtrips_any_table(spark, sf_dir, tmp_path):
    """write_jsonl/read_jsonl derive the corpus contract from the
    schema: events (timestamp + double + json string) and pages
    (binary + ntz timestamp) both round-trip bit-exactly."""
    from greenexp_r_spark.sources import jsonl as J

    for name in ("events", "documents"):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        p = str(tmp_path / name)
        J.write_jsonl(df, p)
        back = J.read_jsonl(spark, p, df.schema)
        assert back.schema == df.schema
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b
