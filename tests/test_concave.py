"""Concave geometry kernels: triangulation, containment, clip area —
verified against grid discretization and closed forms."""

from __future__ import annotations

import numpy as np
import pytest

from greenexp_r_spark.kernels import concave, geom

L_SHAPE = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]],
                   dtype=float)                       # area 7
PLUS = np.array([[1, 0], [2, 0], [2, 1], [3, 1], [3, 2], [2, 2],
                 [2, 3], [1, 3], [1, 2], [0, 2], [0, 1], [1, 1]],
                dtype=float)                          # area 5
_ang = np.pi / 2 + 2 * np.pi * np.arange(10) / 10
_rad = np.where(np.arange(10) % 2 == 0, 3.0, 1.2)
STAR = np.stack([2 + _rad * np.cos(_ang), 1 + _rad * np.sin(_ang)],
                axis=1).round(3)                      # simple 5-point star


@pytest.mark.parametrize("ring,area", [(L_SHAPE, 7.0), (PLUS, 5.0)])
def test_triangulate_area(ring, area):
    tris = concave.triangulate(ring)
    assert len(tris) == len(ring) - 2
    assert sum(abs(geom.polygon_area(t)) for t in tris) == pytest.approx(area)


def test_triangulate_cw_input():
    tris = concave.triangulate(L_SHAPE[::-1])
    assert sum(abs(geom.polygon_area(t)) for t in tris) == pytest.approx(7.0)


@pytest.mark.parametrize("ring", [L_SHAPE, PLUS, STAR])
def test_points_in_polygon_matches_triangulation(ring):
    rng = np.random.RandomState(0)
    px = rng.uniform(-2, 6, 4000)
    py = rng.uniform(-3, 5, 4000)
    got = concave.points_in_polygon(px, py, ring)
    # oracle: inside iff inside any CCW triangle (boundary-free sample)
    want = np.zeros_like(got)
    for t in concave.triangulate(ring):
        want |= geom.points_in_convex_polygon(px, py, t)
    assert (got == want).mean() > 0.999   # boundary-grazing tolerance
    # and exact against the analytic area by Monte-Carlo proportion
    area_est = got.mean() * 8 * 8
    assert abs(area_est - abs(geom.polygon_area(ring))) < 1.5


def test_intersection_area_concave_vs_grid():
    clip = geom.regular_polygon(2.0, 1.5, 2.0, 64)
    got = concave.intersection_area_concave(L_SHAPE, clip)
    # dense-grid discretization oracle
    g = np.linspace(-1, 5, 1200)
    gx, gy = np.meshgrid(g, g)
    in_l = concave.points_in_polygon(gx.ravel(), gy.ravel(), L_SHAPE)
    in_c = geom.points_in_convex_polygon(gx.ravel(), gy.ravel(), clip)
    est = (in_l & in_c).mean() * 6 * 6
    assert abs(got - est) < 0.05
    # and bounded by both inputs
    assert 0 < got <= min(7.0, abs(geom.polygon_area(clip))) + 1e-9


def test_make_valid_general_accepts_concave():
    ring = np.vstack([L_SHAPE[:1], L_SHAPE])          # duplicate vertex
    out = concave.make_valid_general(ring[::-1])      # CW + dup
    assert geom.polygon_area(out) > 0
    assert len(out) == len(L_SHAPE)


def test_make_valid_still_raises_on_degenerate():
    with pytest.raises(ValueError):
        concave.make_valid_general(np.array([[0, 0], [1, 1]], dtype=float))
