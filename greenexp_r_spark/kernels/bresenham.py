"""Line-of-sight reference tables (SURVEY.md V1-V3).

Restates the algorithms of GreenExp_R src/bresenham.cpp:16-67
(first-octant Bresenham rays), :121-167 (8-octant mirror to a
(8r, r) table of reference-patch cell ids) and :170-187 (per-ray
shared-prefix start index) in numpy.  These tables depend only on the
cell radius r, are computed once per job and **broadcast** to every
task (the reference computes them once per VGVI_cpp call,
vgvi.cpp:47-48).

Cell convention: the reference patch is a (2r+1)×(2r+1) grid, cell id
= row * (2r+1) + col, observer at (r, r).  NA is encoded as -1.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

NA = -1


def bresenham_first_octant(radius: int) -> np.ndarray:
    """(radius+1, radius) int array of patch cell ids for the rays from
    the center to the perimeter cells of the first octant.

    Semantics of bresenham.cpp:16-67: ray endpoints (x0+r_i, y0+radius);
    integer error accumulator starts at radius//2 (the reference's
    `R = radius / 2` is C++ integer division); lateral move +Y each
    step, diagonal move when R >= Dy; cells recorded while inside the
    Euclidean radius.
    """
    r = radius
    nc = 2 * r + 1
    x0 = y0 = r
    out = np.full((r + 1, r), NA, dtype=np.int64)
    dy = r  # y1 - y0 == radius, Sy == 1
    for i in range(r + 1):
        dx = i
        sx = 0 if dx == 0 else 1
        rem = r // 2            # C++ int division quirk
        x, y = x0, y0
        # initial update
        y += 1
        rem += dx
        if rem >= dy:
            x += sx
            rem -= dy
        c = 0
        while (x0 - x) ** 2 + (y0 - y) ** 2 <= r * r:
            out[i, c] = y * nc + x
            y += 1
            rem += dx
            if rem >= dy:
                x += sx
                rem -= dy
            c += 1
    return out


@lru_cache(maxsize=8)
def los_reference(radius: int) -> np.ndarray:
    """(8r, r) table of patch cell ids for all 8 octants
    (bresenham.cpp:121-167).  Ray order matches the reference exactly
    (interleaved mirror indices), which matters for the shared-prefix
    tangent reuse semantics."""
    r = radius
    nc = 2 * r + 1
    bh = bresenham_first_octant(r)
    out = np.full((8 * r, r), NA, dtype=np.int64)
    for i in range(r + 1):
        for j in range(r):
            cell = bh[i, j]
            if cell == NA:
                continue
            row, col = divmod(cell, nc)
            x = col - r
            y = row - r
            out[(0 * r + i) % (8 * r), j] = (y + r) * nc + (x + r)
            out[(2 * r + i) % (8 * r), j] = (-x + r) * nc + (y + r)
            out[(4 * r + i) % (8 * r), j] = (-y + r) * nc + (-x + r)
            out[(6 * r + i) % (8 * r), j] = (x + r) * nc + (-y + r)
            if i != 0 and i != r:
                out[(2 * r - i), j] = (x + r) * nc + (y + r)
                out[(4 * r - i), j] = (-y + r) * nc + (x + r)
                out[(6 * r - i), j] = (-x + r) * nc + (-y + r)
                out[(8 * r - i) % (8 * r), j] = (y + r) * nc + (-x + r)
    return out


@lru_cache(maxsize=8)
def shared_los(radius: int) -> np.ndarray:
    """Per-ray index of the first cell differing from the previous ray
    (bresenham.cpp:170-187); ray 0 starts at 0."""
    r = radius
    ref = los_reference(r)
    out = np.zeros(8 * r, dtype=np.int64)
    for i in range(1, 8 * r):
        diff = np.nonzero(ref[i] != ref[i - 1])[0]
        out[i] = diff[0] if len(diff) else 0
    return out
