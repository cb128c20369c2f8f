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


def test_funnel_summary_zero_steps(spark, tmp_path):
    """A step nobody reaches (and the nobody-entered case) must still
    produce all k rows with 0 — on BOTH engines: the registry's funnel
    arm uses a zero-filled step axis, and funnel_summary coalesces the
    empty-aggregate NULL.  This is the gate-hash edge a plain GROUP BY
    oracle silently drops."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 7, "view"), (2, t0 + dt.timedelta(minutes=1), 7,
             "click")]          # nobody purchases
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    # single parquet FILE (not a Spark part-dir): the oracle harness
    # points DuckDB at {dir}/events.parquet exactly like the testdata
    import pandas as pd
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                "event_type"]).to_parquet(
        f"{tmp_path}/events.parquet")
    got = {r["step"]: r["n_users"]
           for r in FU.funnel_summary(df).collect()}
    assert got == {1: 1, 2: 1, 3: 0}
    # full-arm parity on the crafted slice, via the registry SQL
    from greenexp_r_spark.registry_pipeline import _funnel_arm_sql
    arm = (FU.funnel_summary(df)
           .selectExpr("'funnel' AS kind",
                       "CAST(NULL AS TIMESTAMP) AS hour",
                       "concat('step_', step) AS event_type",
                       "n_users AS n_events",
                       "CAST(0 AS BIGINT) AS metric_sum"))
    compare(arm, _funnel_arm_sql(), str(tmp_path))
    # nobody even enters the funnel: still k zero rows
    none_df = df.where("event_type = 'purchase'")
    got0 = {r["step"]: r["n_users"]
            for r in FU.funnel_summary(none_df).collect()}
    assert got0 == {1: 0, 2: 0, 3: 0}


def test_funnel_summary_is_monotone(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = {r["step"]: r["n_users"]
            for r in FU.funnel_summary(ev).collect()}
    assert rows[1] >= rows[2] >= rows[3] > 0
    # step counts agree with the per-user table
    per = FU.funnel(ev)
    for i in (1, 2, 3):
        assert rows[i] == per.where(F.col("completed") >= i).count()
