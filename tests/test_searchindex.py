"""Inverted index (operators/searchindex.py): packed-block postings,
DuckDB bit-parity on the exploded form, conjunctive lookup."""

from __future__ import annotations

from pyspark.sql import functions as F

from greenexp_r_spark.dialect import DUCK
from greenexp_r_spark.operators import searchindex as SI

from .oracle_harness import compare


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_packed_index_matches_duckdb(spark, sf_dir):
    idx = SI.packed_index(_docs(spark, sf_dir), block_docs=8)
    compare(SI.unpack_index(idx),
            SI.postings_sql(DUCK, block_docs=8), sf_dir)


def test_blocks_are_bounded_and_sorted(spark, sf_dir):
    idx = SI.packed_index(_docs(spark, sf_dir), block_docs=8).cache()
    try:
        over = idx.where(F.size("postings") > 8).count()
        assert over == 0
        # every non-final block is FULL (no ragged middle blocks) and
        # arrays are doc-sorted
        bad = idx.select(
            "term", "df", "block_id", F.size("postings").alias("n"),
            (F.col("postings") ==
             F.sort_array("postings")).alias("sorted")).where(
            (~F.col("sorted")) |
            ((F.col("block_id") < F.floor((F.col("df") - 1) / 8))
             & (F.col("n") != 8))).count()
        assert bad == 0
        # df is consistent: sum of block sizes == df for every term
        mism = (idx.groupBy("term", "df")
                .agg(F.sum(F.size("postings")).alias("total"))
                .where(F.col("total") != F.col("df")).count())
        assert mism == 0
    finally:
        idx.unpersist()


def test_conjunctive_lookup_matches_duckdb(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # pick two terms that genuinely co-occur (from the corpus itself)
    first2 = docs.select(
        F.split("text", " ").getItem(0).alias("a"),
        F.split("text", " ").getItem(1).alias("b")).first()
    terms = (first2["a"], first2["b"])
    idx = SI.packed_index(docs, block_docs=8)
    got = SI.conjunctive_lookup(idx, terms)
    compare(got, SI.lookup_sql(DUCK, terms), sf_dir)
    assert got.count() > 0


def test_lookup_requires_all_terms(spark):
    rows = [(1, "alpha beta"), (2, "alpha gamma"), (3, "beta alpha")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = SI.packed_index(docs, block_docs=8)
    hit = {r["doc_id"] for r in
           SI.conjunctive_lookup(idx, ("alpha", "beta")).collect()}
    assert hit == {1, 3}


def test_index_point_lookup_prunes_via_bucketed_icetable(spark, sf_dir,
                                                         tmp_path):
    """The docstring's scale claim, end-to-end: the packed index
    committed bucket(N, term_hash)-partitioned answers a term lookup
    from a pruned file subset with identical results."""
    from greenexp_r_spark.functions import text as T
    from greenexp_r_spark.sources import icetable

    docs = _docs(spark, sf_dir)
    idx = SI.packed_index(docs, block_docs=8).withColumn(
        "th", T.word_hash(F.col("term")))
    t = str(tmp_path / "index_tbl")
    icetable.commit(idx.repartition(4), t, partition=("bucket", 8, "th"),
                    stat_cols=["term", "df", "th"])
    term = docs.select(
        F.split("text", " ").getItem(0).alias("a")).first()["a"]
    th = spark.createDataFrame([(term,)], "term string").select(
        T.word_hash(F.col("term")).alias("h")).first()["h"]
    pruned = icetable.read(spark, t, bucket_eq=("th", int(th)))
    assert len(pruned.inputFiles()) < icetable.metrics(t)["n_files"]
    got = sorted(map(tuple, SI.conjunctive_lookup(
        pruned, (term,)).collect()))
    want = sorted(map(tuple, SI.conjunctive_lookup(
        icetable.read(spark, t), (term,)).collect()))
    assert got == want and len(want) > 0
