"""Hypertable rollup (operators/downsample.py): DuckDB bit-parity of
the OHLC time-bucket downsample and the gap-filled LOCF table over the
events stream, plus a hand fixture proving the gap rows and carry."""

from __future__ import annotations

import datetime as dt

from greenexp_r_spark.operators import downsample as DS

from .oracle_harness import compare

_W = 900  # seconds
_WUS = _W * 1_000_000


def _rollup_sql() -> str:
    return f"""
WITH r AS (
  SELECT user_id AS key,
         make_timestamp(epoch_us(ts)
             - ((epoch_us(ts) % {_WUS}) + {_WUS}) % {_WUS}) AS bucket,
         ts, event_id, value
  FROM events),
o AS (SELECT key, bucket, value,
        row_number() OVER (PARTITION BY key, bucket
                           ORDER BY ts, event_id) AS ra,
        row_number() OVER (PARTITION BY key, bucket
                           ORDER BY ts DESC, event_id DESC) AS rd
      FROM r)
SELECT key, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_micro,
       MAX(CASE WHEN ra = 1 THEN value END) AS open_v,
       MAX(CASE WHEN rd = 1 THEN value END) AS close_v,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM o GROUP BY 1, 2"""


def test_rollup_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = DS.time_bucket_rollup(ev, width_s=_W)
    compare(got, _rollup_sql(), sf_dir)
    assert got.count() > 0


def test_gapfill_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = DS.gapfill_locf(DS.time_bucket_rollup(ev, width_s=_W),
                          width_s=_W)
    compare(got, f"""
WITH roll AS ({_rollup_sql()}),
bounds AS (SELECT key, min(epoch_us(bucket)) AS lo,
                  max(epoch_us(bucket)) AS hi
           FROM roll GROUP BY key),
axis AS (SELECT key, make_timestamp(unnest(generate_series(lo, hi,
                  {_WUS}))) AS bucket
         FROM bounds),
d AS (SELECT a.key, a.bucket,
             COALESCE(r.n_rows, 0) AS n_rows,
             COALESCE(r.sum_micro, 0) AS sum_micro,
             r.open_v, r.close_v, r.min_v, r.max_v
      FROM axis a LEFT JOIN roll r
      ON a.key = r.key AND a.bucket = r.bucket)
SELECT d.*, last_value(close_v IGNORE NULLS)
       OVER (PARTITION BY key ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS close_locf
FROM d""", sf_dir)


def test_stream_equals_batch(spark, sf_dir):
    """The availableNow-drained streaming OHLC (epoch-anchored
    tumbling window + the same struct MIN/MAX) is bit-equal to the
    batch rollup — the stream≡batch contract."""
    from greenexp_r_spark.streaming import events_stream as ES

    path = f"{sf_dir}/events.parquet"
    got = ES.run_downsample_available_now(spark, path, width_s=_W)
    ev = spark.read.parquet(path)
    want = DS.time_bucket_rollup(ev, width_s=_W)
    cols = want.columns
    g = {tuple(r) for r in got.select(*cols).collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(w) > 0


def test_fixture_gaps_and_carry(spark):
    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    # key 7: buckets 0 and 3 occupied (gap at 1, 2); key 8: one bucket
    ev = spark.createDataFrame(
        [(1, 7, at(10), 4.0), (2, 7, at(20), 2.0),
         (3, 7, at(3 * _W + 5), 9.0), (4, 8, at(1000), 1.5)],
        "event_id long, user_id long, ts timestamp, value double")
    out = {(r["key"], r["bucket"]): r for r in
           DS.gapfill_locf(DS.time_bucket_rollup(ev, width_s=_W),
                           width_s=_W).collect()}
    assert len(out) == 5                       # 4 buckets key7 + 1 key8
    full = out[(7, at(0))]
    assert (full["n_rows"], full["open_v"], full["close_v"]) == (2, 4.0, 2.0)
    gap = out[(7, at(_W))]
    assert gap["n_rows"] == 0 and gap["sum_micro"] == 0
    assert gap["open_v"] is None and gap["close_locf"] == 2.0
    assert out[(7, at(2 * _W))]["close_locf"] == 2.0
    assert out[(7, at(3 * _W))]["close_locf"] == 9.0
    assert out[(8, at(900))]["close_locf"] == 1.5


def test_property_matches_python_oracle(spark):
    """Hypothesis sweep vs an independent pure-python OHLC fold —
    ties on ts exercised deliberately (tiebreak = event_id decides
    open/close), keys shared, empty frames included."""
    from hypothesis import given, settings, strategies as st

    # base at the epoch and NEGATIVE offsets included: plain % keeps
    # the dividend sign, so pre-1970 rows probe the floor-mod bucket
    t0 = dt.datetime(1970, 1, 1)
    row = st.tuples(st.integers(0, 2),          # key
                    st.integers(-2 * _W, 3 * _W),   # incl. pre-epoch
                    st.integers(-3, 3))         # value (small ints)

    @settings(max_examples=25, deadline=None)
    @given(rows=st.lists(row, min_size=0, max_size=14))
    def check(rows):
        data = [(i, k, t0 + dt.timedelta(seconds=s), float(v))
                for i, (k, s, v) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "event_id long, user_id long, ts timestamp, "
                  "value double")
        got = {(r["key"], r["bucket"]): r for r in
               DS.time_bucket_rollup(df, width_s=_W).collect()}

        want = {}
        for eid, k, ts, v in data:
            # epoch-anchored bucket of ts
            us = int((ts - dt.datetime(1970, 1, 1)).total_seconds())
            b = dt.datetime(1970, 1, 1) + dt.timedelta(
                seconds=(us // _W) * _W)
            e = want.setdefault((k, b), {"n": 0, "sm": 0,
                                         "rows": []})
            e["n"] += 1
            e["sm"] += round(v * 1_000_000)
            e["rows"].append((us, eid, v))
        assert set(got) == set(want)
        for key, e in want.items():
            r = got[key]
            vs = [v for _, _, v in e["rows"]]
            assert r["n_rows"] == e["n"] and r["sum_micro"] == e["sm"]
            assert r["min_v"] == min(vs) and r["max_v"] == max(vs)
            assert r["open_v"] == min(e["rows"])[2]
            assert r["close_v"] == max(e["rows"])[2]

    check()
