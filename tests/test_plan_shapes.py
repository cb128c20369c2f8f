"""Plan-shape regression guards for the round-5 session-4 operators —
each pins the shuffle count its docstring claims, so a refactor that
silently adds an exchange fails here, not at 100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    # count shuffle exchanges only (broadcast exchanges are the point
    # of several of these plans)
    return _plan(df).count("Exchange hashpartitioning") + \
        _plan(df).count("Exchange rangepartitioning")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bloom_probe_is_zero_shuffle(spark, sf_dir):
    from greenexp_r_spark.operators import bloom as B
    keys = _docs(spark, sf_dir).where("doc_id % 3 = 0") \
        .select(F.col("doc_id").cast("string").alias("term"))
    bl = B.bloom_build(keys)
    probe = _docs(spark, sf_dir) \
        .withColumn("term", F.col("doc_id").cast("string"))
    assert _n_exchanges(B.bloom_semi_join(probe, bl)) == 0


def test_sessionize_is_one_user_keyed_shuffle(spark, sf_dir):
    """Two windows + the session rollup share ONE exchange: the
    windows partition by user_id, and HashPartitioning(user_id)
    satisfies the (user_id, sess_seq) clustering of the final
    aggregate (subset rule)."""
    from greenexp_r_spark.operators import sessions as SS
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert _n_exchanges(SS.sessionize_batch(ev)) == 1


def test_corpus_report_is_one_aggregate_shuffle(spark, sf_dir):
    from greenexp_r_spark.operators import report
    assert _n_exchanges(report.corpus_report(_docs(spark, sf_dir))) == 1


def test_cms_build_is_one_aggregate_shuffle(spark, sf_dir):
    from greenexp_r_spark.operators import sketch as SK
    assert _n_exchanges(SK.cms_build(_docs(spark, sf_dir))) == 1


def test_conjunctive_lookup_shuffles_hits_not_blocks(spark, sf_dir):
    """The lookup filters terms BEFORE exploding postings, then
    aggregates: one shuffle keyed by doc_id over matched postings
    only (plus the index build's own window/agg shuffles upstream —
    bounded by asserting the total)."""
    from greenexp_r_spark.operators import searchindex as SI
    docs = _docs(spark, sf_dir)
    idx = SI.packed_index(docs, block_docs=8).localCheckpoint()
    q = SI.conjunctive_lookup(idx, ("the",))
    assert _n_exchanges(q) == 1


def test_asof_join_is_one_keyed_shuffle(spark, sf_dir):
    """Union + one keyed window = ONE exchange on the join key — the
    whole point of the union-window as-of plan (operators/asof.py
    docstring) vs a per-key range join."""
    from greenexp_r_spark.operators import asof as AS
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.where("event_type = 'purchase'") \
        .select("event_id", "ts", "user_id")
    right = ev.where("event_type IN ('click', 'view')") \
        .select("user_id", "ts", "event_type", "event_id")
    j = AS.asof_join(left, right, key="user_id",
                     payload=["event_type", "event_id"],
                     tiebreak="event_id")
    assert _n_exchanges(j) == 1


def test_canonical_url_is_jvm_projection(spark, sf_dir):
    """canonical_url is a pure JVM projection: zero exchanges and no
    Python eval anywhere in the plan.  (It is NOT whole-stage-codegen:
    the tracking-param filter is a higher-order-function lambda, which
    Spark interprets — acceptable here because the arrays are
    per-url-tiny and the op is ingestion-side, not EXPOSURE-hot; a
    codegen regex rewrite would need lookahead/backrefs, both
    cross-engine parity traps.)"""
    from greenexp_r_spark.operators import urlnorm as U
    pg = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://S"), F.col("doc_id").cast("string"),
                 F.lit(".org:443/p/?utm_a=1&id=2#f")).alias("url"))
    out = pg.select(U.canonical_url("url").alias("c"))
    plan = _plan(out)
    assert _n_exchanges(out) == 0
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_url_dedup_is_one_keyed_shuffle(spark, sf_dir):
    from greenexp_r_spark.operators import urlnorm as U
    pg = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://s"), (F.col("doc_id") % 7)
                 .cast("string"), F.lit(".org/p")).alias("url"),
        F.col("doc_id").cast("timestamp").alias("warc_ts"))
    assert _n_exchanges(U.url_dedup_keep_first(pg)) == 1


def test_time_bucket_rollup_is_one_aggregate_shuffle(spark, sf_dir):
    from greenexp_r_spark.operators import downsample as DS
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert _n_exchanges(DS.time_bucket_rollup(ev)) == 1
