"""Local mirror of the driver's correctness gate: run a registry query
on Spark and its oracle on DuckDB over the same sf dir, compare
row count, column names, and order-insensitive values (exact by
default — the engine's integer-exact doctrine should make even doubles
bit-identical)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
        except duckdb.Error:
            pass
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str,
            float_tol: float = 0.0) -> None:
    got = canon(spark_df.toPandas())
    con = duck_connection(sf_dir)
    want = canon(con.sql(oracle_sql).df())
    assert list(got.columns) == list(want.columns), \
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            ok = []
            for a, b in zip(g.astype(float), w.astype(float)):
                if math.isnan(a) and math.isnan(b):
                    ok.append(True)
                elif float_tol == 0.0:
                    ok.append(a == b)
                else:
                    ok.append(abs(a - b) <= float_tol * max(1.0, abs(b)))
            bad = [i for i, v in enumerate(ok) if not v]
            assert not bad, (
                f"col {c}: {len(bad)} mismatches, first at {bad[0]}: "
                f"{g.iloc[bad[0]]} vs {w.iloc[bad[0]]}")
        else:
            same = g.astype(str).values == w.astype(str).values
            assert same.all(), f"col {c} differs, first at " \
                f"{(~same).argmax()}: {g.iloc[(~same).argmax()]} vs {w.iloc[(~same).argmax()]}"
