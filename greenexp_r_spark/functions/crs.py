"""CRS reprojection (SURVEY P1): vectorized WGS84 lon/lat ↔ World
Mercator (EPSG:3395, the reference's default projection target —
ndvi_calc.R:50-62 and every function preamble).

The reference calls sf::st_transform per function invocation; here
reprojection happens ONCE at ingest through an Arrow-batched pandas
UDF (two trig ops per point, numpy-vectorized — no per-row Python),
and every downstream operator works in projected meters.

EPSG:3395 (ellipsoidal Mercator, WGS84): x = a·λ,
y = a·ln(tan(π/4 + φ/2) · ((1−e·sinφ)/(1+e·sinφ))^(e/2)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

WGS84_A = 6_378_137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E = float(np.sqrt(2 * WGS84_F - WGS84_F ** 2))


def mercator_forward(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lam = np.radians(lon_deg)
    phi = np.radians(lat_deg)
    e = WGS84_E
    x = WGS84_A * lam
    con = e * np.sin(phi)
    y = WGS84_A * np.log(np.tan(np.pi / 4 + phi / 2)
                         * ((1 - con) / (1 + con)) ** (e / 2))
    return x, y


def mercator_inverse(x: np.ndarray, y: np.ndarray,
                     iters: int = 15):
    """Iterative inverse (standard fixed-point on the conformal
    latitude); converges to double precision in < 10 iterations."""
    e = WGS84_E
    lon = np.degrees(x / WGS84_A)
    ts = np.exp(-y / WGS84_A)
    phi = np.pi / 2 - 2 * np.arctan(ts)
    for _ in range(iters):
        con = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            ts * ((1 - con) / (1 + con)) ** (e / 2))
    return lon, np.degrees(phi)


def _to_mercator_udf():
    # built lazily: pandas_udf parses its DDL schema against the
    # active session, so it cannot be a module-level decorator
    @pandas_udf("x double, y double")
    def to_mercator(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = mercator_forward(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"x": x, "y": y})
    return to_mercator


def _to_wgs84_udf():
    @pandas_udf("lon double, lat double")
    def to_wgs84(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lon, lat = mercator_inverse(x.to_numpy(), y.to_numpy())
        return pd.DataFrame({"lon": lon, "lat": lat})
    return to_wgs84


def reproject_points(df: DataFrame, lon: str = "lon",
                     lat: str = "lat") -> DataFrame:
    """Ingest-time P1: append projected (x, y) meters."""
    proj = _to_mercator_udf()(F.col(lon), F.col(lat))
    return df.withColumn("_p", proj) \
             .withColumn("x", F.col("_p.x")) \
             .withColumn("y", F.col("_p.y")).drop("_p")


def unproject_points(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    geo = _to_wgs84_udf()(F.col(x), F.col(y))
    return df.withColumn("_g", geo) \
             .withColumn("lon", F.col("_g.lon")) \
             .withColumn("lat", F.col("_g.lat")).drop("_g")
