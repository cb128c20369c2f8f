"""Geometry-property extraction over a WKB layer (SURVEY P2 / P4 /
P6 / P11 / P12 in one decode pass).

The reference computes these as sf preamble steps on every layer it
touches: st_centroid (vgvi_from_sf.R:103, accessibility.R:135),
st_area (canopy_coverage.R:334-345), st_bbox (ndvi_calc.R:118),
geometry-type checks / MULTI→single casts (vgvi_from_sf.R:97-101) and
the speed×time buffer distance (accessibility.R:62-70,
ndvi_calc.R:76-88).  Here they are ONE mapInPandas pass over the WKB
column — decode once, emit every scalar property.

Scale: the geometry layer is dimension-sized (parks), so one narrow
Arrow-batched pass with per-geometry numpy is the 100 TB plan — the
same shape as overlay's refine kernel; nothing shuffles, and the pass
composes with any corpus-side join downstream.

Exactness (oracle: registry_geo3._oracle_geom_props): all fixture
vertices are integer meters, so every shoelace cross term, centroid
moment, and their sums are exact-integer-valued doubles (≤3.3e13 ≪
2^53); area divides by 2.0 once and the centroid divides the moment
sums by (3·a2) once, written identically in SQL.  Ring orientation is
normalized CCW by kernels/concave.make_valid_polygon (P7) before the
signed sums, holes subtracting.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                               StructField, StructType)

from ..functions.geo import buffer_distance_from_speed
from ..kernels import concave as CK
from ..kernels import geom as G

PROPS_SCHEMA = StructType([
    StructField("park_id", LongType()),
    StructField("n_members", LongType()),
    StructField("n_holes", LongType()),
    StructField("is_multi", BooleanType()),
    StructField("has_holes", BooleanType()),
    StructField("area_m2", DoubleType()),
    StructField("centroid_x", DoubleType()),
    StructField("centroid_y", DoubleType()),
    StructField("bxmin", LongType()),
    StructField("bymin", LongType()),
    StructField("bxmax", LongType()),
    StructField("bymax", LongType()),
    StructField("service_radius_m", DoubleType()),
])

SERVICE_SPEED_KMH = 5.0          # walking speed for the P4 column
SERVICE_TIME_BASE_MIN = 5        # per-park time = base + park_id % 20


def _ring_sums(ring: np.ndarray) -> tuple[float, float, float]:
    """(Σcross, Σ(x_i+x_j)·cross, Σ(y_i+y_j)·cross) for one CCW ring —
    exact for integer vertices (terms ≤ 3.3e13 < 2^53)."""
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    return float(cross.sum()), float(((x + xn) * cross).sum()), \
        float(((y + yn) * cross).sum())


def geometry_properties(parks_wkb: DataFrame) -> DataFrame:
    """(park_id, geom_wkb) → one row of scalar geometry properties
    per park.  Accepts WKB POLYGON and MULTIPOLYGON (with interior
    rings); members are normalized via make_valid_polygon (P7) and
    holes subtract from area/centroid moments."""

    def props(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for pid, wkb in zip(pdf["park_id"], pdf["geom_wkb"]):
                members = [CK.make_valid_polygon(m)
                           for m in G.parse_wkb_rings(bytes(wkb))]
                a2 = sx = sy = 0.0
                n_holes = 0
                shell_pts = []
                for rings in members:
                    for k, ring in enumerate(rings):
                        c, mx, my = _ring_sums(ring)
                        sgn = 1.0 if k == 0 else -1.0
                        a2 += sgn * c
                        sx += sgn * mx
                        sy += sgn * my
                    n_holes += len(rings) - 1
                    shell_pts.append(rings[0])
                shell = np.vstack(shell_pts)
                t_min = float(SERVICE_TIME_BASE_MIN + int(pid) % 20)
                rows.append({
                    "park_id": int(pid),
                    "n_members": len(members),
                    "n_holes": n_holes,
                    "is_multi": len(members) > 1,
                    "has_holes": n_holes > 0,
                    "area_m2": a2 / 2.0,
                    "centroid_x": sx / (3.0 * a2),
                    "centroid_y": sy / (3.0 * a2),
                    "bxmin": int(shell[:, 0].min()),
                    "bymin": int(shell[:, 1].min()),
                    "bxmax": int(shell[:, 0].max()),
                    "bymax": int(shell[:, 1].max()),
                    "service_radius_m": buffer_distance_from_speed(
                        SERVICE_SPEED_KMH, t_min),
                })
            yield pd.DataFrame(rows)

    return parks_wkb.select("park_id", "geom_wkb") \
        .mapInPandas(props, PROPS_SCHEMA)
