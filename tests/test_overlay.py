"""Exact polygon overlay vs the discretized greenspace fraction, and
WKB plumbing through Spark."""

from __future__ import annotations

import numpy as np

from greenexp_r_spark import world
from greenexp_r_spark.kernels import geom as G
from greenexp_r_spark.operators import availability, overlay

from .conftest import SF_TEST


def test_polygon_pct_close_to_grid_pct(spark):
    pts = world.points_df(spark, SF_TEST).where("point_id % 10 = 0")
    parks = world.parks_df(spark)
    poly = (overlay.greenspace_polygon_pct(pts, parks).toPandas()
            .sort_values("point_id").reset_index(drop=True))
    grid = (availability.greenspace_pct(pts, parks).toPandas()
            .sort_values("point_id").reset_index(drop=True))
    assert poly["point_id"].tolist() == grid["point_id"].tolist()
    p = poly["greenspace_poly_pct"].to_numpy()
    g = grid["greenspace_pct"].to_numpy()
    assert ((p >= 0) & (p <= 100)).all()
    # the WKB parks are k-gons (k=5..8) inscribed in the discs the
    # grid path uses: pentagon covers 75.7% of its disc, octagon 90%.
    # So poly ≤ grid (+discretization error), and where parks are
    # pairwise disjoint poly ≥ 0.70·grid.
    assert (p <= g + 3.0).all()
    parks = world.parks_df(spark).toPandas()
    pts = poly.merge(grid, on="point_id")
    pdf = (world.points_df(spark, SF_TEST).where("point_id % 10 = 0")
           .select("point_id", "x", "y").toPandas())
    pts = pts.merge(pdf, on="point_id")
    checked = 0
    for _, row in pts.iterrows():
        d = np.sqrt((parks.cx - row.x) ** 2 + (parks.cy - row.y) ** 2)
        near = parks[d < 300 + parks.radius]
        disjoint = True
        arr = near[["cx", "cy", "radius"]].to_numpy()
        for i in range(len(arr)):
            for j in range(i + 1, len(arr)):
                dd = np.hypot(arr[i, 0] - arr[j, 0], arr[i, 1] - arr[j, 1])
                if dd < arr[i, 2] + arr[j, 2]:
                    disjoint = False
        if disjoint and len(near):
            checked += 1
            assert row.greenspace_poly_pct >= 0.70 * row.greenspace_pct - 3.0
            assert row.greenspace_poly_pct <= row.greenspace_pct + 3.0
    assert checked > 0


def test_parks_wkb_roundtrip(spark):
    parks = overlay.parks_wkb_df(world.parks_df(spark)).toPandas()
    for _, row in parks.head(10).iterrows():
        ring = G.parse_wkb_polygon(bytes(row["geom_wkb"]))
        k = 5 + int(row["park_id"]) % 4
        assert len(ring) == k
        cx, cy = G.polygon_centroid(ring)
        assert cx == np.testing.assert_allclose(cx, row["cx"], atol=1e-9) or True
        np.testing.assert_allclose([cx, cy], [row["cx"], row["cy"]],
                                   atol=1e-9)
