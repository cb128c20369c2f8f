"""Cohort retention over the events table — the third leg of the
behavioral trio (sessionize, funnel, retention): group users by
first-activity week, then count how many are active k weeks later.

Plan shape: ONE user-keyed aggregate finds each user's cohort week
(min ts), one join keyed by user attaches it to their activity weeks,
one distinct + one hash aggregate produce the (cohort, offset) grid —
the grid is calendar-bounded (weeks × weeks), so the final shuffle
carries partials, never users.

Exactness: weeks are integer epoch-day arithmetic (epoch_us // 86400e6
// 7 — NOT date_trunc('week'), whose week-start convention is an
engine-parity trap), counts BIGINT; DuckDB bit-parity in
tests/test_retention.py.

Reference analog: none in GreenExp_R (analytics-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WEEK_US = 7 * 86400 * 1_000_000


def _week(us_col):
    # subtract-mod before dividing: the quotient is then an exact
    # multiple, so the double division is exact — floor(us/W) alone
    # can round UP across a week boundary for us = k·W - 1 (the
    # float-division twin of the round-vs-floor trap)
    return ((us_col - (us_col % _WEEK_US)) / _WEEK_US).cast("long")


def retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users): users whose FIRST event
    fell in cohort_week that were active again week_offset weeks
    later (offset 0 = the cohort size itself)."""
    ev = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    cohort = (ev.groupBy("user_id")
              .agg(_week(F.min("us")).alias("cohort_week")))
    active = (ev.select("user_id", _week(F.col("us")).alias("week"))
              .distinct())
    return (active.join(cohort, "user_id")
            .groupBy("cohort_week",
                     (F.col("week") - F.col("cohort_week"))
                     .alias("week_offset"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


def retention_sql(table: str = "events") -> str:
    """DuckDB rendering of :func:`retention` (bit-exact)."""
    wk = f"CAST(epoch_us(ts) // {_WEEK_US} AS BIGINT)"
    return f"""
WITH cohort AS (
  SELECT user_id,
         CAST(MIN(epoch_us(ts)) // {_WEEK_US} AS BIGINT)
           AS cohort_week
  FROM {table} GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, {wk} AS week FROM {table}
)
SELECT cohort_week,
       CAST(week - cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active JOIN cohort USING (user_id)
GROUP BY cohort_week, week - cohort_week
"""
