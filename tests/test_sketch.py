"""Count-min sketch (operators/sketch.py): cross-engine bit-parity of
the counter grid, the one-sided error contract, heavy-hitter recall
and exactness."""

from __future__ import annotations

import pyspark.sql.functions as F

from greenexp_r_spark.dialect import DUCK
from greenexp_r_spark.operators import sketch as SK

from .oracle_harness import compare


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _true_counts(spark, sf_dir):
    return (_docs(spark, sf_dir)
            .select(F.explode(F.split("text", " ")).alias("term"))
            .where(F.length("term") > 0)
            .groupBy("term").agg(F.count("*").cast("long")
                                 .alias("cnt")))


def test_cms_matches_duckdb_bitwise(spark, sf_dir):
    compare(SK.cms_build(_docs(spark, sf_dir)),
            SK.cms_sql(DUCK), sf_dir)


def test_cms_one_sided_and_bounded(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sketch = SK.cms_build(docs).cache()
    try:
        truth = _true_counts(spark, sf_dir).cache()
        est = SK.cms_estimate(truth.select("term"), sketch)
        j = truth.join(est, "term").cache()
        n = truth.agg(F.sum("cnt")).collect()[0][0]
        # one-sided: NEVER undercounts (deterministic guarantee)
        assert j.where(F.col("est") < F.col("cnt")).count() == 0
        # eps·N bound with eps = e/w (holds w.h.p.; deterministic
        # inputs make this a fixed fact of the fixture)
        eps_n = int(2.7182818 * n / SK.CMS_W) + 1
        assert j.where(F.col("est") > F.col("cnt") + eps_n).count() == 0
    finally:
        sketch.unpersist()


def test_heavy_hitters_exact_recall_and_precision(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    phi_ppm = 2000
    got = {(r["term"], r["cnt"])
           for r in SK.heavy_hitters(docs, phi_ppm).collect()}
    truth = _true_counts(spark, sf_dir)
    n = truth.agg(F.sum("cnt")).collect()[0][0]
    thresh = (phi_ppm * n) // 1_000_000
    want = {(r["term"], r["cnt"]) for r in
            truth.where(F.col("cnt") >= thresh).collect()}
    assert got == want and len(want) > 0


def test_sketch_is_mergeable(spark, sf_dir):
    """Sketch(A ∪ B) == Sketch(A) + Sketch(B) cell-wise — the property
    that makes per-task partials and cross-increment unions sound."""
    docs = _docs(spark, sf_dir)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    merged = (SK.cms_build(a).unionByName(SK.cms_build(b))
              .groupBy("j", "bucket")
              .agg(F.sum("counter").cast("long").alias("counter")))
    whole = SK.cms_build(docs)
    diff = (merged.join(whole, ["j", "bucket"], "full")
            .where(F.coalesce(merged["counter"], F.lit(0)) !=
                   F.coalesce(whole["counter"], F.lit(0))).count())
    assert diff == 0


def test_hll_registers_match_duckdb_bitwise(spark, sf_dir):
    compare(SK.hll_registers(_docs(spark, sf_dir)),
            SK.hll_sql(DUCK), sf_dir)


def test_hll_estimate_within_error_and_mergeable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    regs = SK.hll_registers(docs).collect()
    est = SK.hll_estimate(regs)
    true = (docs.select(F.explode(F.split("text", " ")).alias("t"))
            .where(F.length("t") > 0).select("t").distinct().count())
    # 1.04/sqrt(m) ≈ 3.3% std error at m=1024; allow 4 sigma
    assert abs(est - true) / true < 0.13, (est, true)
    # mergeability: cellwise max of half-sketches == whole sketch
    a = SK.hll_registers(docs.where("doc_id % 2 = 0"))
    b = SK.hll_registers(docs.where("doc_id % 2 = 1"))
    merged = (a.unionByName(b).groupBy("register")
              .agg(F.max("max_rank").alias("max_rank")))
    whole = SK.hll_registers(docs)
    diff = (merged.join(whole, "register", "full")
            .where(F.coalesce(merged["max_rank"], F.lit(0)) !=
                   F.coalesce(whole["max_rank"], F.lit(0))).count())
    assert diff == 0
