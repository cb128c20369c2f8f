"""Ordered funnel (operators/funnel.py): DuckDB bit-parity, ordering
semantics on a hand fixture, summary monotonicity."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from greenexp_r_spark.operators import funnel as FU

from .oracle_harness import compare


def test_funnel_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = FU.funnel(ev)
    compare(got, FU.funnel_sql(), sf_dir)
    assert got.count() > 0


def test_funnel_windowed_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = FU.funnel(ev, within_s=7 * 24 * 3600)
    compare(got, FU.funnel_sql(within_s=7 * 24 * 3600), sf_dir)


def test_funnel_order_semantics_fixture(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ)

    rows = [
        # user 1: full ordered funnel
        ev(1, 1, "view", 0), ev(2, 1, "click", 10),
        ev(3, 1, "purchase", 20),
        # user 2: purchase BEFORE click → stops at step 2
        ev(4, 2, "view", 0), ev(5, 2, "purchase", 5),
        ev(6, 2, "click", 10),
        # user 3: never viewed → not in the funnel at all
        ev(7, 3, "click", 0), ev(8, 3, "purchase", 1),
        # user 4: view only
        ev(9, 4, "view", 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    out = {r["user_id"]: r for r in FU.funnel(df).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["completed"] == 3
    assert out[2]["completed"] == 2          # click counts, purchase
    assert out[2]["ts_3"] is None            # was before the click
    assert out[4]["completed"] == 1
    # first-touch: user 2's click at +10 is its ts_2
    assert out[2]["ts_2"] == t0 + dt.timedelta(minutes=10)


def test_funnel_summary_is_monotone(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = {r["step"]: r["n_users"]
            for r in FU.funnel_summary(ev).collect()}
    assert rows[1] >= rows[2] >= rows[3] > 0
    # step counts agree with the per-user table
    per = FU.funnel(ev)
    for i in (1, 2, 3):
        assert rows[i] == per.where(F.col("completed") >= i).count()
