"""As-of join (operators/asof.py): per-row DuckDB ASOF JOIN
bit-parity over the events table (backward, forward, tolerance) plus
hand fixtures for tie and no-match semantics."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from greenexp_r_spark.operators import asof as AS

from .oracle_harness import compare

# oracle right side deduped to max event_id per (user, ts) — the same
# deterministic choice the engine's tiebreak ordering makes (identical
# to no dedupe when timestamps are unique, as they are in this data)
_R_DEDUP = """
SELECT user_id, ts, event_type, event_id FROM (
  SELECT user_id, ts, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type IN ('click', 'view')) _r0
WHERE rn = 1"""


def _sides(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = (ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "ts", "user_id"))
    right = (ev.filter(F.col("event_type").isin("click", "view"))
             .select("user_id", "ts", "event_type", "event_id"))
    return left, right


def test_backward_matches_duckdb(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    got = AS.asof_join(left, right, key="user_id",
                       payload=["event_type", "event_id"],
                       tiebreak="event_id")
    compare(got, f"""
WITH l AS (SELECT event_id, ts, user_id FROM events
           WHERE event_type = 'purchase'),
r AS ({_R_DEDUP})
SELECT l.event_id, l.ts, l.user_id, r.ts AS asof_ts,
       r.event_type AS asof_event_type, r.event_id AS asof_event_id
FROM l ASOF LEFT JOIN r
ON l.user_id = r.user_id AND l.ts >= r.ts
""", sf_dir)
    assert got.count() > 0


def test_forward_matches_duckdb(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    got = AS.asof_join(left, right, key="user_id",
                       payload=["event_type", "event_id"],
                       direction="forward", tiebreak="event_id")
    compare(got, f"""
WITH l AS (SELECT event_id, ts, user_id FROM events
           WHERE event_type = 'purchase'),
r AS ({_R_DEDUP})
SELECT l.event_id, l.ts, l.user_id, r.ts AS asof_ts,
       r.event_type AS asof_event_type, r.event_id AS asof_event_id
FROM l ASOF LEFT JOIN r
ON l.user_id = r.user_id AND l.ts <= r.ts
""", sf_dir)


def test_tolerance_matches_duckdb(spark, sf_dir):
    tol_us = 30 * 60 * 1_000_000          # 30 minutes
    left, right = _sides(spark, sf_dir)
    got = AS.asof_join(left, right, key="user_id",
                       payload=["event_type", "event_id"],
                       tolerance_us=tol_us, tiebreak="event_id")
    compare(got, f"""
WITH l AS (SELECT event_id, ts, user_id FROM events
           WHERE event_type = 'purchase'),
r AS ({_R_DEDUP}),
j AS (SELECT l.event_id, l.ts, l.user_id, r.ts AS rts,
             r.event_type AS rtype, r.event_id AS rid
      FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts)
SELECT event_id, ts, user_id,
       CASE WHEN epoch_us(ts) - epoch_us(rts) <= {tol_us}
            THEN rts END AS asof_ts,
       CASE WHEN epoch_us(ts) - epoch_us(rts) <= {tol_us}
            THEN rtype END AS asof_event_type,
       CASE WHEN epoch_us(ts) - epoch_us(rts) <= {tol_us}
            THEN rid END AS asof_event_id
FROM j
""", sf_dir)


def _fixture(spark):
    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, at(10), 7), (2, at(25), 7), (3, at(5), 8), (4, at(0), 9)],
        "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(
        [(7, at(8), "a", 100), (7, at(25), "b", 101),
         (7, at(25), "c", 102),          # duplicate ts: max id wins
         (8, at(6), "d", 103)],          # after user 8's left row
        "user_id long, ts timestamp, tag string, event_id long")
    return left, right, at


def test_fixture_semantics(spark):
    left, right, at = _fixture(spark)
    out = {r["event_id"]: (r["asof_tag"], r["asof_event_id"])
           for r in AS.asof_join(left, right, key="user_id",
                                 payload=["tag", "event_id"],
                                 tiebreak="event_id").collect()}
    assert out[1] == ("a", 100)          # strictly before
    assert out[2] == ("c", 102)          # tie ts inclusive, max id
    assert out[3] == (None, None)        # right row is later
    assert out[4] == (None, None)        # user has no right rows

    fwd = {r["event_id"]: r["asof_tag"]
           for r in AS.asof_join(left, right, key="user_id",
                                 payload=["tag"], direction="forward",
                                 tiebreak="tag").collect()}
    assert fwd[1] == "b" or fwd[1] == "c"   # next at 25 (tie on ts)
    assert fwd[2] in ("b", "c")             # inclusive at equal ts
    assert fwd[3] == "d"
    assert fwd[4] is None


def test_null_tiebreak_loses(spark):
    """At equal (key, ts) a NULL tiebreak must lose to any non-null
    one — the 'greatest tiebreak wins' contract mirrors SQL MAX, which
    ignores NULLs (a max-tiebreak oracle dedupe picks the non-null
    row)."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=10), 7)],
        "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(
        [(7, t0, "nulltie", None), (7, t0, "realtie", 5)],
        "user_id long, ts timestamp, tag string, pri long")
    out = AS.asof_join(left, right, key="user_id", payload=["tag"],
                       tiebreak="pri").collect()
    assert out[0]["asof_tag"] == "realtie"
    # all-NULL tiebreaks still match (some row wins, never a non-row)
    right2 = spark.createDataFrame(
        [(7, t0, "x", None), (7, t0, "y", None)],
        "user_id long, ts timestamp, tag string, pri long")
    out2 = AS.asof_join(left, right2, key="user_id", payload=["tag"],
                        tiebreak="pri").collect()
    assert out2[0]["asof_tag"] in ("x", "y")


def test_fixture_tolerance(spark):
    left, right, at = _fixture(spark)
    out = {r["event_id"]: r["asof_tag"]
           for r in AS.asof_join(left, right, key="user_id",
                                 payload=["tag"], tolerance_us=10**6,
                                 tiebreak="tag").collect()}
    assert out[1] is None                # 2 s gap > 1 s tolerance
    assert out[2] in ("b", "c")          # 0 s gap
