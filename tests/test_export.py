"""Corpus-export capstone (operators/export.py): composition
correctness against the gate-exact q_corpus_select, and deterministic
re-runs (identical rows, identical shard row-count multisets)."""

from __future__ import annotations

import pyspark.sql.functions as F

from greenexp_r_spark.operators import export as EX
from greenexp_r_spark.operators.dedup import corpus_select
from greenexp_r_spark.sources import icetable


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_train_corpus_matches_select(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = EX.train_corpus(docs)
    want = (corpus_select(docs)
            .where(F.col("sampled") & (F.col("split") == "train")))
    assert got.count() == want.count() > 0
    # every exported doc is a kept train doc, text rides along intact
    joined = got.join(
        docs.select("doc_id", F.col("text").alias("orig")), "doc_id")
    assert joined.where(F.col("text") != F.col("orig")).count() == 0


def test_export_is_deterministic_and_manifested(spark, sf_dir,
                                                tmp_path):
    docs = _docs(spark, sf_dir)
    a = EX.export_training_shards(spark, docs,
                                  str(tmp_path / "rel_a"),
                                  target_rows=50)
    b = EX.export_training_shards(spark, docs,
                                  str(tmp_path / "rel_b"),
                                  target_rows=50)
    assert a["n_docs"] == b["n_docs"] > 0
    assert a["n_tokens"] == b["n_tokens"] > 0
    assert a["n_files"] == b["n_files"] > 1
    # manifest carries the release summary as props
    assert icetable.table_props(str(tmp_path / "rel_a")) == \
        {"n_docs": a["n_docs"], "n_tokens": a["n_tokens"]}
    # identical rows...
    ra = sorted(map(tuple, icetable.read(
        spark, str(tmp_path / "rel_a")).collect()))
    rb = sorted(map(tuple, icetable.read(
        spark, str(tmp_path / "rel_b")).collect()))
    assert ra == rb
    # ...and identical shard row-count multisets (hash repartition on
    # doc_id is deterministic)
    ma = sorted(e["rows"] for e in
                icetable.metrics(str(tmp_path / "rel_a"))["files"])
    mb = sorted(e["rows"] for e in
                icetable.metrics(str(tmp_path / "rel_b"))["files"])
    assert ma == mb
