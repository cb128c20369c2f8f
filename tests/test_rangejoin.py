"""Range join (operators/rangejoin.py): per-row DuckDB inequality-join
parity (events × their own session intervals), boundary semantics on a
hand fixture, and a no-nested-loop plan guard."""

from __future__ import annotations

import pyspark.sql.functions as F

from greenexp_r_spark.operators import rangejoin as RJ
from greenexp_r_spark.operators import sessions as SS

from .oracle_harness import compare


def test_sessions_containment_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = SS.sessionize_batch(ev).select(
        "user_id", "sess_seq", "session_start", "session_end")
    got = RJ.range_join(ev.select("event_id", "ts", "user_id"), sess,
                        point_col="ts", lo_col="session_start",
                        hi_col="session_end", keys=["user_id"])
    compare(got, f"""
WITH s AS ({SS.sessionize_sql()})
SELECT e.event_id, e.ts, e.user_id,
       s.sess_seq, s.session_start, s.session_end
FROM events e JOIN s
ON e.user_id = s.user_id
AND e.ts BETWEEN s.session_start AND s.session_end
""", sf_dir)
    # sessions tile the per-user timeline: every event in exactly one
    assert got.count() == ev.count()


def _fixture(spark):
    pts = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 10), (4, 15), (5, 99)],
        "pid long, v long")
    iv = spark.createDataFrame(
        [(10, 0, 10), (11, 5, 5), (12, 10, 20), (13, 30, 40)],
        "iid long, lo long, hi long")
    return pts, iv


def test_boundary_semantics(spark):
    pts, iv = _fixture(spark)

    def pairs(closed):
        out = RJ.range_join(pts, iv, "v", "lo", "hi", closed=closed)
        return {(r["pid"], r["iid"]) for r in out.collect()}

    assert pairs("both") == {(1, 10), (2, 10), (2, 11), (3, 10),
                             (3, 12), (4, 12)}
    assert pairs("left") == {(1, 10), (2, 10), (3, 12), (4, 12)}
    assert pairs("right") == {(2, 10), (3, 10), (4, 12)}
    assert pairs("neither") == {(2, 10), (4, 12)}


def test_explicit_bucket_width_same_result(spark):
    pts, iv = _fixture(spark)
    a = {(r["pid"], r["iid"])
         for r in RJ.range_join(pts, iv, "v", "lo", "hi").collect()}
    b = {(r["pid"], r["iid"])
         for r in RJ.range_join(pts, iv, "v", "lo", "hi",
                                bucket_width=3).collect()}
    assert a == b


def test_plan_has_no_nested_loop(spark, sf_dir):
    """The whole point of the bucketed shape: Catalyst must plan a
    hash/sort-merge equi-join, never a BNLJ or cartesian product."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = SS.sessionize_batch(ev).select(
        "user_id", "sess_seq", "session_start", "session_end")
    got = RJ.range_join(ev.select("event_id", "ts", "user_id"), sess,
                        point_col="ts", lo_col="session_start",
                        hi_col="session_end", keys=["user_id"],
                        bucket_width=3_600_000_000)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
