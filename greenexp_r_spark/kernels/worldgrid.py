"""Numpy renderings of the synthetic world's visibility rasters
(FIXTURES.md §5): DTM (gentle terrain), DSM (terrain + hash-placed
buildings outside parks), greenspace mask (1 inside park discs).

These feed the viewshed/VGVI kernels; they are deliberately smooth /
closed-form so any patch can be synthesized inside a task without a
tile shuffle, and so the pure-python oracle in tests can recompute
identical values.  The tile-table variant (sources/tiles.py) material-
izes the same fields as array<float> tiles for the raster-join path.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C

BLOCK = 20            # building block size, meters
BH_MUL1, BH_MUL2 = 73_856_093, 83_492_791
BH_MOD = 2_147_483_647


def park_discs() -> np.ndarray:
    """(n_parks, 3) array of (cx, cy, radius) — mirrors world.parks_sql
    exactly (same integer arithmetic)."""
    pid = np.arange(C.N_PARKS, dtype=np.int64)
    hot = pid % C.PARK_HOT_FRACTION_MOD < 7
    hx = np.array(C.PARK_HOT_X, dtype=np.int64)[pid % 3]
    hy = np.array(C.PARK_HOT_Y, dtype=np.int64)[pid % 3]
    cx = np.where(
        hot,
        hx + (pid * C.PARK_CX_MUL + C.PARK_CX_ADD) % C.PARK_SPREAD - 1200,
        (pid * C.PARK_FAR_MUL + C.PARK_FAR_ADD) % 19000 + 500)
    cy = np.where(
        hot,
        hy + (pid * C.PARK_CY_MUL + C.PARK_CY_ADD) % C.PARK_SPREAD - 1200,
        (pid * C.PARK_FARY_MUL + C.PARK_FARY_ADD) % 19000 + 500)
    r = np.where(pid % C.PARK_SMALL_MOD == 0, 8.0,
                 40.0 + (pid * C.PARK_R_MUL) % C.PARK_R_MOD)
    return np.stack([cx.astype(float), cy.astype(float), r], axis=1)


def in_park(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask: point inside any park disc."""
    discs = park_discs()
    out = np.zeros(x.shape, dtype=bool)
    for cx, cy, r in discs:
        out |= (x - cx) ** 2 + (y - cy) ** 2 <= r * r
    return out


def dtm(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return 10.0 + 5.0 * np.sin(x / 2000.0) * np.sin(y / 2000.0)


def building_height(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hash-placed buildings on a 20 m block grid: ~28% of blocks carry
    a 6–30 m building; parks are kept building-free by dsm()."""
    bx = np.floor(x / BLOCK).astype(np.int64)
    by = np.floor(y / BLOCK).astype(np.int64)
    h = (bx * BH_MUL1 + by * BH_MUL2) % BH_MOD
    has = (h % 7) < 2
    return np.where(has, 6.0 + (h % 25).astype(float), 0.0)


def dsm(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    base = dtm(x, y)
    b = building_height(x, y)
    park = in_park(x, y)
    return np.where(park, base, base + b)


def greenspace(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return in_park(x, y).astype(float)


def in_park_rows(px: np.ndarray, py: np.ndarray,
                 ox: np.ndarray, oy: np.ndarray,
                 reach: float) -> np.ndarray:
    """Park mask for per-observer patch arrays px/py of shape
    (n_obs, n_cells), pruned per park: a park is tested against a row
    only if its disc can reach that observer's patch (center distance ≤
    radius + reach).  Cuts the 60×full-array sweep of in_park() to the
    handful of parks actually near each observer — the same
    candidate-pruning idea as the J7 join, applied inside the kernel.
    """
    discs = park_discs()
    out = np.zeros(px.shape, dtype=bool)
    for cx, cy, r in discs:
        rows = np.nonzero((ox - cx) ** 2 + (oy - cy) ** 2
                          <= (r + reach) ** 2)[0]
        if not len(rows):
            continue
        sub_x = px[rows]
        sub_y = py[rows]
        out[rows] |= (sub_x - cx) ** 2 + (sub_y - cy) ** 2 <= r * r
    return out


def patch_fields(px: np.ndarray, py: np.ndarray,
                 ox: np.ndarray, oy: np.ndarray,
                 reach: float) -> tuple[np.ndarray, np.ndarray]:
    """(dsm, greenspace) for per-observer patches, computing the park
    mask once with per-observer pruning."""
    base = dtm(px, py)
    b = building_height(px, py)
    park = in_park_rows(px, py, ox, oy, reach)
    return np.where(park, base, base + b), park.astype(float)
