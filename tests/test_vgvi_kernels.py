"""Kernel correctness: the vectorized viewshed/VGVI kernels vs a
naive sequential transcription of the reference algorithm semantics
(GreenExp_R src/viewshed.cpp:49-161, src/vgvi.cpp:19-228), plus
property tests."""

from __future__ import annotations

import math

import numpy as np
import pytest

from greenexp_r_spark.kernels import bresenham, vgvi as K, worldgrid as W

R = 12   # small radius keeps the naive oracle fast


def naive_viewshed(dsm_patch: np.ndarray, h0: float, r: int) -> np.ndarray:
    """Sequential max-tangent sweep, one observer, straight from the
    cited loop semantics (incl. the k_i reset + carry quirks)."""
    nc = 2 * r + 1
    c0 = r * nc + r
    vis = np.zeros(nc * nc, dtype=bool)
    vis[c0] = True
    if not h0 > dsm_patch[c0]:
        return vis
    ref = bresenham.los_reference(r)
    starts = bresenham.shared_los(r)
    max_tan_vec = np.full(r, -9999.0)
    for i in range(8 * r):
        k = int(starts[i])
        max_tan = max_tan_vec[k - 1] if k > 1 else -9999.0
        for j in range(k, r):
            cell = ref[i, j]
            if cell == bresenham.NA:
                break
            row, col = divmod(cell, nc)
            dist = math.sqrt((r - col) ** 2 + (r - row) ** 2)
            tan = (dsm_patch[cell] - h0) / dist
            if tan > max_tan:
                max_tan = tan
                vis[cell] = True
            max_tan_vec[j] = max_tan
    return vis


def naive_vgvi(dsm_patch, gs_patch, h0, r, res, radius, fun, m, b) -> float:
    nc = 2 * r + 1
    ncell = nc * nc
    vis = naive_viewshed(dsm_patch, h0, r)
    vcells = np.nonzero(vis)[0]
    ox, oy = (r + 0.5) * res, -(r + 0.5) * res
    rings, greens = [], []
    for c in vcells:
        s = c + 1                                   # 1-based quirk
        srow, scol = divmod(s, nc)
        sx, sy = (scol + 0.5) * res, -(srow + 0.5) * res
        d = math.sqrt((ox - sx) ** 2 + (oy - sy) ** 2)
        ring = int(math.floor(d + 0.5))
        rings.append(max(ring, 1))
        greens.append(int(gs_patch[s]) if s < ncell else 0)
    max_d = max(rings)
    total = [0] * max_d
    green = [0] * max_d
    for ring, g in zip(rings, greens):
        total[ring - 1] += 1
        green[ring - 1] += g
    total = [1 if t == 0 else t for t in total]
    if max_d == 1:
        return float(green[0] // total[0])
    raw = [g / t for g, t in zip(green, total)]
    w = K.decay_weights(max_d, radius, fun, m, b)
    wsum = w.sum()
    return float(sum(rw * (wi / wsum) for rw, wi in zip(raw, w)))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    n = 12
    xs = rng.uniform(1000, 19000, n)
    ys = rng.uniform(1000, 19000, n)
    nc = 2 * R + 1
    res = 5.0
    ccx = (np.floor(xs / res) + 0.5) * res
    ccy = (np.floor(ys / res) + 0.5) * res
    offs = (np.arange(nc) - R) * res
    px = (ccx[:, None, None] + offs[None, None, :])
    py = (ccy[:, None, None] - offs[None, :, None])
    px = np.broadcast_to(px, (n, nc, nc)).reshape(n, -1)
    py = np.broadcast_to(py, (n, nc, nc)).reshape(n, -1)
    dsm = W.dsm(px, py)
    gs = W.greenspace(px, py)
    h0 = W.dtm(ccx, ccy) + 1.7
    return dsm, gs, h0


def test_viewshed_matches_naive(batch):
    dsm, _, h0 = batch
    got = K.viewshed_batch(dsm, h0, R)
    for o in range(dsm.shape[0]):
        want = naive_viewshed(dsm[o], float(h0[o]), R)
        assert (got[o] == want).all(), f"observer {o} viewshed differs"


@pytest.mark.parametrize("fun", [1, 2])
def test_vgvi_matches_naive(batch, fun):
    dsm, gs, h0 = batch
    radius = R * 5.0
    got = K.vgvi_batch(dsm, gs, h0, R, 5.0, radius, fun, 0.5, 8.0)
    for o in range(dsm.shape[0]):
        want = naive_vgvi(dsm[o], gs[o], float(h0[o]), R, 5.0,
                          radius, fun, 0.5, 8.0)
        assert got[o] == pytest.approx(want, abs=1e-12)


def test_vgvi_bounds(batch):
    dsm, gs, h0 = batch
    v = K.vgvi_batch(dsm, gs, h0, R, 5.0, R * 5.0, 1, 0.5, 8.0)
    assert ((v >= 0.0) & (v <= 1.0)).all()


def test_blocked_observer_sees_only_center():
    nc = 2 * R + 1
    dsm = np.full((1, nc * nc), 50.0)
    h0 = np.array([10.0])            # eye below own-cell DSM
    vis = K.viewshed_batch(dsm, h0, R)
    assert vis[0].sum() == 1 and vis[0, R * nc + R]


def test_open_terrain_all_visible():
    nc = 2 * R + 1
    dsm = np.zeros((1, nc * nc))
    h0 = np.array([1.7])
    vis = K.viewshed_batch(dsm, h0, R)
    mask = np.zeros(nc * nc, dtype=bool)
    ref = bresenham.los_reference(R)
    mask[np.unique(ref[ref != bresenham.NA])] = True
    # every ray cell is visible on flat terrain
    assert vis[0, mask].all()


def test_bresenham_rays_stay_in_radius():
    ref = bresenham.los_reference(R)
    nc = 2 * R + 1
    cells = ref[ref != bresenham.NA]
    rows, cols = np.divmod(cells, nc)
    assert (((rows - R) ** 2 + (cols - R) ** 2) <= R * R).all()
