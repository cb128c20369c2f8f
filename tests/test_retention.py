"""Cohort retention (operators/retention.py): DuckDB bit-parity and
grid invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from greenexp_r_spark.operators import retention as R

from .oracle_harness import compare


def test_retention_matches_duckdb(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = R.retention(ev)
    compare(got, R.retention_sql(), sf_dir)
    assert got.count() > 0


def test_retention_grid_invariants(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    grid = R.retention(ev).collect()
    by = {(r["cohort_week"], r["week_offset"]): r["n_users"]
          for r in grid}
    # offsets are non-negative (nobody is active before their first
    # event) and offset-0 row equals the cohort size
    assert all(off >= 0 for _c, off in by)
    n_users = ev.select("user_id").distinct().count()
    assert sum(n for (c, off), n in by.items() if off == 0) == n_users
    # no later offset exceeds its cohort's size
    for (c, off), n in by.items():
        assert n <= by[(c, 0)]
