"""Second projected CRS (UTM / transverse Mercator) + per-dataset CRS
declaration plumbing (VERDICT r03 'Next round #6')."""

from __future__ import annotations

import numpy as np
import pytest

from greenexp_r_spark.functions import crs


def test_utm_anchors():
    # central meridian of zone 31 at the equator: exactly the false
    # easting, zero northing
    z, e, n = crs.utm_forward(np.array([3.0]), np.array([0.0]))
    assert z[0] == 31 and e[0] == 500_000.0 and n[0] == 0.0
    # scale factor at the CM is k0 = 0.9996 (numeric derivative)
    dl = 1e-5
    _, e1, _ = crs.utm_forward(np.array([3.0 + dl]), np.array([45.0]),
                               zone=np.array([31]))
    sp = np.sin(np.radians(45.0))
    N = crs.WGS84_A / np.sqrt(1 - crs._E2 * sp * sp)
    arc = np.radians(dl) * N * np.cos(np.radians(45.0))
    assert (e1[0] - 500_000.0) / arc == pytest.approx(0.9996, abs=1e-7)
    # southern hemisphere false northing
    _, _, ns = crs.utm_forward(np.array([3.0]), np.array([-1.0]))
    assert ns[0] > 9_800_000


def test_utm_zone_selection():
    lon = np.array([-180.0, -174.1, 0.5, 5.9, 6.0, 11.9, 179.9])
    assert crs.utm_zone(lon).tolist() == [1, 1, 31, 31, 32, 32, 60]


def test_utm_roundtrip_sub_5mm():
    rng = np.random.RandomState(3)
    lon = rng.uniform(0.5, 11.5, 5000)
    lat = rng.uniform(-69.0, 69.0, 5000)
    z, e, n = crs.utm_forward(lon, lat)
    south = lat < 0
    lon2 = np.empty_like(lon)
    lat2 = np.empty_like(lat)
    lon2[~south], lat2[~south] = crs.utm_inverse(z[~south], e[~south],
                                                 n[~south])
    lon2[south], lat2[south] = crs.utm_inverse(z[south], e[south],
                                               n[south], south=True)
    err_m = np.hypot((lon2 - lon) * 111_320 * np.cos(np.radians(lat)),
                     (lat2 - lat) * 110_574)
    assert err_m.max() < 5e-3


def test_utm_agrees_with_mercator_locally():
    """Both projections are conformal metric CRSs: a small east-west
    displacement must map to nearly the same ground distance (after
    removing each projection's local scale factor)."""
    lat = 52.0
    lon = 4.0
    dl = 0.01
    _, e0, _ = crs.utm_forward(np.array([lon]), np.array([lat]))
    _, e1, _ = crs.utm_forward(np.array([lon + dl]), np.array([lat]))
    x0, _ = crs.mercator_forward(np.array([lon]), np.array([lat]))
    x1, _ = crs.mercator_forward(np.array([lon + dl]), np.array([lat]))
    sp = np.sin(np.radians(lat))
    # Mercator scale at lat: 1/(cos φ) scaled by ellipsoid factor
    merc_scale = np.sqrt(1 - crs._E2 * sp * sp) / np.cos(np.radians(lat))
    ground_m = (x1[0] - x0[0]) * 1.0 / merc_scale
    utm_ground = (e1[0] - e0[0]) / 0.9996   # near-CM scale ≈ k0
    assert ground_m == pytest.approx(utm_ground, rel=2e-4)


def test_declare_and_require_crs(spark):
    df = spark.range(5).selectExpr("CAST(id AS DOUBLE) AS x",
                                   "CAST(id * 2 AS DOUBLE) AS y")
    a = crs.declare_crs(df, "EPSG:32631")
    b = crs.declare_crs(df, "EPSG:3395")
    assert crs.crs_of(a) == "EPSG:32631"
    assert crs.crs_of(df) is None
    # declaration survives projections and joins
    assert crs.crs_of(a.select("x", "y").where("x > 1")) == "EPSG:32631"
    # same / undeclared combinations pass
    assert crs.require_same_crs(a, a) == "EPSG:32631"
    assert crs.require_same_crs(a, df) == "EPSG:32631"
    assert crs.require_same_crs(df, df) is None
    # conflicting declarations are rejected
    with pytest.raises(crs.CrsMismatch, match="mixed projected CRS"):
        crs.require_same_crs(a, b)
    with pytest.raises(crs.CrsMismatch):
        crs.require_same_crs(a, expect="EPSG:3395")


def test_operator_guard_rejects_mixed_crs(spark, sf_dir):
    """The accessibility operator refuses a mixed-CRS points×parks
    join when both layers declare conflicting CRSs."""
    from greenexp_r_spark import world
    from greenexp_r_spark.operators import accessibility
    pts = crs.declare_crs(world.points_df(spark, sf_dir), "EPSG:32631")
    parks = crs.declare_crs(world.parks_df(spark), "EPSG:3395",
                            cols=("cx", "cy"))
    with pytest.raises(crs.CrsMismatch):
        accessibility.euclidean_access(pts, parks)
    # matching declarations pass (and undeclared parks pass)
    parks_ok = crs.declare_crs(world.parks_df(spark), "EPSG:32631",
                               cols=("cx", "cy"))
    accessibility.euclidean_access(pts, parks_ok).take(1)
    accessibility.euclidean_access(pts, world.parks_df(spark)).take(1)
