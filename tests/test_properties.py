"""Property-based tests (hypothesis) for the geometry and dedup
kernels — SURVEY §5(d)'s invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from greenexp_r_spark import constants as C
from greenexp_r_spark.kernels import geom as G

coords = st.floats(min_value=-1000, max_value=1000,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=40))
def test_hull_contains_all_points(pts):
    arr = np.array(pts, dtype=float)
    hull = G.convex_hull(arr)
    if len(hull) < 3:
        return                      # degenerate (collinear) input
    inside = G.points_in_convex_polygon(arr[:, 0] , arr[:, 1], hull)
    # allow boundary tolerance by shrinking toward the hull centroid
    cx, cy = hull[:, 0].mean(), hull[:, 1].mean()
    sx = arr[:, 0] + (cx - arr[:, 0]) * 1e-9
    sy = arr[:, 1] + (cy - arr[:, 1]) * 1e-9
    inside2 = G.points_in_convex_polygon(sx, sy, hull)
    assert (inside | inside2).all()


@settings(max_examples=40, deadline=None)
@given(st.tuples(coords, coords),
       st.floats(min_value=1, max_value=300),
       st.integers(min_value=3, max_value=24),
       st.tuples(coords, coords),
       st.floats(min_value=1, max_value=300),
       st.integers(min_value=3, max_value=24))
def test_clip_area_bounded(c1, r1, k1, c2, r2, k2):
    a = G.regular_polygon(c1[0], c1[1], r1, k1)
    b = G.regular_polygon(c2[0], c2[1], r2, k2)
    inter = G.intersection_area(a, b)
    assert inter >= -1e-9
    assert inter <= abs(G.polygon_area(a)) + 1e-6
    assert inter <= abs(G.polygon_area(b)) + 1e-6
    # disjoint circumcircles → zero intersection
    d = np.hypot(c1[0] - c2[0], c1[1] - c2[1])
    if d > r1 + r2:
        assert inter == 0.0


@settings(max_examples=40, deadline=None)
@given(st.floats(min_value=10, max_value=400),
       st.floats(min_value=0.05, max_value=2.0),
       st.floats(min_value=0.5, max_value=16.0),
       st.integers(min_value=1, max_value=2))
def test_decay_weights_positive_decreasing(radius, m, b, fun):
    from greenexp_r_spark.kernels.vgvi import decay_weights
    max_d = max(2, int(radius) // 2)
    w = decay_weights(max_d, radius, fun, m, b)
    assert (w > 0).all()
    # both decay kernels are non-increasing in distance, so the
    # per-ring integrals over equal-width windows are non-increasing
    assert (np.diff(w) <= 1e-12).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2 ** 31 - 1),
       st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_minhash_permutation_range(sh, j):
    a, b = C.MINHASH_PERMS[j % len(C.MINHASH_PERMS)]
    v = (sh * a + b) % C.P31
    assert 0 <= v < C.P31
