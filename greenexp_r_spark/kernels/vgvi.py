"""Viewshed + VGVI compute kernels (SURVEY.md V4-V7), restated from
GreenExp_R src/viewshed.cpp:49-161, src/vgvi.cpp:19-228 and
src/integrate.cpp:6-33 in numpy, vectorized across a *batch of
observers* (the reference's OpenMP per-observer loop becomes Spark
partition parallelism × in-task numpy batching).

Faithfully replicated reference quirks (documented, deliberate):
  * shared-prefix tangent reuse with the `k_i == 1` reset: when a ray
    diverges from its predecessor at index 1, the running max restarts
    at -9999 instead of inheriting cell 0's tangent (vgvi.cpp:86-88);
    the effect propagates through max_tan_vec to later rays, so we
    emulate the exact sequential ray order.
  * visible cells are stored 1-based (cell+1, vgvi.cpp:70,117) and fed
    to a 0-based xyFromCell (vgvi.cpp:140-141, rasterutils.cpp:70-85),
    shifting every visible cell's coordinates one cell to the right
    when computing ring distances and greenspace lookups.
  * ring index = round-half-away(euclid meters), floored at 1
    (vgvi.cpp:143-152); empty rings get total=1 (vgvi.cpp:181-185).
  * max_d == 1 short-circuit uses C++ integer division
    (vgvi.cpp:188-191).
  * decay weight per ring = trapezoid integral (n=200) of the logit or
    exponential kernel over [d - 1/radius, d] (vgvi.cpp:199-213,
    integrate.cpp:13-33).

The kernel operates on per-observer square patches of (2r+1)² cells
centered on the observer cell — equivalent to the reference run on a
perfectly-centered crop, the geometry vgvi_from_sf.R:217-230 produces
for interior observers.
"""

from __future__ import annotations

import numpy as np

from . import bresenham

NEG = -9999.0


def decay_weights(max_d: int, radius: float, fun: int, m: float,
                  b: float) -> np.ndarray:
    """Per-ring decay weights w[0..max_d-1] (vgvi.cpp:199-213):
    trapezoid integral with n=200 of f over [d - min_dist, d] where
    d = ring/radius and min_dist = 1/radius."""
    n = 200
    d = np.arange(1, max_d + 1, dtype=float) / radius
    min_dist = d[0]
    lower = d - min_dist
    h = (d - lower) / n                      # scalar per ring
    # x grid: (max_d, n+1)
    x = lower[:, None] + np.arange(n + 1)[None, :] * h[:, None]
    if fun == 1:
        y = 1.0 / (1.0 + np.exp(b * (x - m)))
    else:
        y = 1.0 / (1.0 + b * np.power(x, m))
    mid = (y[:, 1:n] * h[:, None]).sum(axis=1)
    return h / 2.0 * (y[:, 0] + y[:, n]) + mid


def viewshed_batch(dsm_patches: np.ndarray, h0: np.ndarray,
                   r: int) -> np.ndarray:
    """Vectorized max-tangent sweep for a batch of observers.

    dsm_patches: (n_obs, (2r+1)²) row-major patch heights, observer at
    the center cell.  h0: (n_obs,) eye heights.  Returns a boolean
    (n_obs, (2r+1)²) visibility mask (center always visible).

    Rays are processed in the reference's exact order with the shared
    max_tan_vec carried between rays (including the k_i==1 reset
    quirk); within a ray and across observers everything is numpy.
    """
    nobs = dsm_patches.shape[0]
    nc = 2 * r + 1
    c0 = r * nc + r
    ref = bresenham.los_reference(r)          # (8r, r)
    starts = bresenham.shared_los(r)          # (8r,)
    vis = np.zeros((nobs, nc * nc), dtype=bool)
    vis[:, c0] = True

    # observers whose eye is below their own DSM cell see only c0
    active = h0 > dsm_patches[:, c0]
    if not active.any():
        return vis

    # per ref-cell distance (cell units) from center — identical to
    # sqrt((x0-col)² + (y0-row)²) of viewshed.cpp:146-149
    rows, cols = divmod(np.arange(nc * nc), nc)
    dist = np.sqrt((r - cols).astype(float) ** 2
                   + (r - rows).astype(float) ** 2)

    act_idx = np.nonzero(active)[0]
    hp = dsm_patches[act_idx]                 # (na, ncell)
    h0a = h0[act_idx]
    na = len(act_idx)
    max_tan_vec = np.full((na, r), NEG)

    for i in range(8 * r):
        cells = ref[i]                        # (r,)
        valid = cells != bresenham.NA
        n_valid = int(valid.sum())            # NA tail is contiguous
        if n_valid == 0:
            continue
        cells_v = cells[:n_valid]
        k = int(starts[i])
        if k >= n_valid:
            continue
        t = (hp[:, cells_v[k:]] - h0a[:, None]) / dist[cells_v[k:]][None, :]
        init = max_tan_vec[:, k - 1] if k > 1 else np.full(na, NEG)
        run = np.maximum.accumulate(
            np.concatenate([init[:, None], t], axis=1), axis=1)
        visible = t > run[:, :-1]
        vis[np.ix_(act_idx, cells_v[k:])] |= visible
        max_tan_vec[:, k:n_valid] = run[:, 1:]
    return vis


def vgvi_batch(dsm_patches: np.ndarray, gs_patches: np.ndarray,
               h0: np.ndarray, r: int, res: float, radius: float,
               fun: int, m: float, b: float) -> np.ndarray:
    """VGVI per observer (vgvi.cpp part B), given patch heights,
    greenspace mask patches and eye heights.  Returns (n_obs,) VGVI.
    """
    nobs = dsm_patches.shape[0]
    nc = 2 * r + 1
    ncell = nc * nc
    vis = viewshed_batch(dsm_patches, h0, r)

    # --- the reference's 1-based-cell quirk: coordinates of visible
    # cells are taken from cell+1 (vgvi.cpp:117,140), the observer's
    # own coordinates from the true cell (vgvi.cpp:141).
    # Extent note: VGVI_cpp's output depends on the raster crop it is
    # handed (cell+1 walks the flattened array of WHATEVER extent the
    # caller cropped).  This kernel reproduces the single-observer
    # crop rendering — cell+1 at a row's right edge wraps to the next
    # patch row, exactly as VGVI_cpp does on a width-(2r+1) raster.
    # vgvi_from_sf.R:217-230 crops to the bbox of the *whole observer
    # set*, so multi-observer reference runs read a different (true
    # right-neighbor) cell there; parity is defined against the
    # per-observer crop, the only extent that is observer-independent.
    cell_ids = np.arange(ncell)
    shifted = cell_ids + 1
    s_rows, s_cols = divmod(shifted, nc)      # may run off the last row
    in_patch = shifted < ncell
    # patch-center xy in patch coordinates (cell units → meters)
    sx = (s_cols + 0.5) * res
    sy = -(s_rows + 0.5) * res                # ymax - (row+0.5)res, ymax=0
    ox = (r + 0.5) * res
    oy = -(r + 0.5) * res
    d_m = np.sqrt((ox - sx) ** 2 + (oy - sy) ** 2)
    ring = np.floor(d_m + 0.5).astype(np.int64)   # round half away (d>0)
    ring = np.maximum(ring, 1)

    # greenspace value at the shifted coordinates → shifted cell, 0 if
    # off-patch (cellFromXY → NA → 0, vgvi.cpp:158-162)
    gs_shift = np.zeros((nobs, ncell))
    gs_shift[:, in_patch] = gs_patches[:, shifted[in_patch]]
    gs_int = gs_shift.astype(np.int64)        # int accumulation quirk

    out = np.zeros(nobs)
    for o in range(nobs):
        vcells = np.nonzero(vis[o])[0]
        rings = ring[vcells]
        green = gs_int[o, vcells]
        max_d = int(rings.max())
        total = np.bincount(rings - 1, minlength=max_d)
        gsum = np.bincount(rings - 1, weights=green,
                           minlength=max_d).astype(np.int64)
        total = np.where(total == 0, 1, total)
        if max_d == 1:
            out[o] = float(gsum[0] // total[0])   # C++ int division
            continue
        raw = gsum.astype(float) / total
        w = decay_weights(max_d, radius, fun, m, b)
        out[o] = float((raw * (w / w.sum())).sum())
    return out
