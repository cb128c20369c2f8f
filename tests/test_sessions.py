"""Batch sessionization (operators/sessions.py): DuckDB bit-parity,
gap semantics on a hand fixture, and batch ≡ streaming on closed
sessions."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from greenexp_r_spark.operators import sessions as SS
from greenexp_r_spark.streaming import events_stream

from .conftest import SF_TEST
from .oracle_harness import compare


def test_sessionize_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = SS.sessionize_batch(ev)
    compare(got, SS.sessionize_sql(), sf_dir)
    assert got.count() > 0


def test_gap_semantics_fixture(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid)

    rows = [ev(1, 7, 0), ev(2, 7, 30), ev(3, 7, 95),   # 65' gap → new
            ev(4, 7, 100), ev(5, 9, 0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")
    out = {(r["user_id"], r["sess_seq"]):
           (r["n_events"], r["session_start"], r["session_end"])
           for r in SS.sessionize_batch(df, gap_s=3600).collect()}
    assert out[(7, 1)] == (2, t0, t0 + dt.timedelta(minutes=30))
    assert out[(7, 2)] == (2, t0 + dt.timedelta(minutes=95),
                           t0 + dt.timedelta(minutes=100))
    assert out[(9, 1)][0] == 1
    assert len(out) == 3


def test_batch_equals_streaming_closed_sessions(spark):
    """The availableNow streaming sessionizer emits CLOSED sessions
    (each user's trailing session stays in state); the batch operator
    minus every user's LAST session must equal it exactly."""
    got = events_stream.run_sessionize_available_now(
        spark, f"{SF_TEST}/events.parquet")
    stream = {(r["user_id"], r["session_start"], r["session_end"],
               r["n_events"]) for r in got.collect()}
    ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
    batch = SS.sessionize_batch(ev)
    last = batch.groupBy("user_id").agg(
        F.max("sess_seq").alias("last_seq"))
    closed = (batch.join(last, "user_id")
              .where(F.col("sess_seq") < F.col("last_seq")))
    want = {(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"]) for r in closed.collect()}
    assert stream == want
