"""Zonal statistics over *materialized* raster tiles — the J1
raster⋈vector join of SURVEY.md §2.3 in its at-scale form:

    points --explode covering tile ids--> equi-join tiles on tile_id
    --> applyInPandas per tile: numpy disc mask over the tile's cell
    grid, emit PARTIAL integer moments per (point, tile)
    --> groupBy(point): sum partials --> mean/sd.

Key properties for 100 TB:
  * the raster⋈vector join is a plain equi-join on tile_id (sort-merge
    or broadcast depending on the layer size) — no geometry predicate
    reaches the join;
  * a buffer spanning several tiles contributes partial moments from
    each — no tile ever needs its neighbors (no halo exchange);
  * partial aggregation is exact because the moments are integers
    (same doctrine as operators/availability.py);
  * tiles arrays stay inside the Arrow batch of their task; the
    shuffle after the pUDF carries only (point_id, s1, s2, n).

Output is bit-identical to availability.ndvi_zonal (virtual-raster
path) — asserted by tests/test_zonal_tiles.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

from .. import constants as C
from ..sources.tiles import NA_SENTINEL, TILE_CELLS

PARTIAL_SCHEMA = StructType([
    StructField("point_id", LongType()),
    StructField("s1", LongType()),
    StructField("s2", LongType()),
    StructField("n", LongType()),
])


def ndvi_zonal_tiles(points: DataFrame, tiles: DataFrame,
                     buffer_m: float = C.BUFFER_M,
                     add_sd: bool = True) -> DataFrame:
    res = C.NDVI_RES
    span = TILE_CELLS * res
    p = points.select("point_id", "x", "y")
    lo = lambda c: F.floor((c - buffer_m) / span).cast("long")
    hi = lambda c: F.floor((c + buffer_m) / span).cast("long")
    cand = (p
            .withColumn("tx", F.explode(F.sequence(lo(F.col("x")),
                                                   hi(F.col("x")))))
            .withColumn("ty", F.explode(F.sequence(lo(F.col("y")),
                                                   hi(F.col("y"))))))
    joined = cand.join(
        tiles.select(F.col("tx").alias("ttx"), F.col("ty").alias("tty"),
                     "xmin", "ymin", "res", "ncol", "nrow", "values"),
        (F.col("tx") == F.col("ttx")) & (F.col("ty") == F.col("tty")))

    def zonal(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r2 = float(buffer_m) ** 2
        for pdf in it:
            if not len(pdf):
                continue
            out_pid, out_s1, out_s2, out_n = [], [], [], []
            # group rows by tile to reuse the decoded array
            for (xmin, ymin), grp in pdf.groupby(["xmin", "ymin"],
                                                 sort=False):
                vals = np.asarray(grp["values"].iloc[0], dtype=np.int64)
                ncol = int(grp["ncol"].iloc[0])
                tres = float(grp["res"].iloc[0])
                # cell centers of this tile
                cx = xmin + (np.arange(ncol) + 0.5) * tres
                cy = ymin + (np.arange(int(grp["nrow"].iloc[0])) + 0.5) * tres
                for pid, px, py in zip(grp["point_id"], grp["x"], grp["y"]):
                    dx2 = (cx - px) ** 2
                    dy2 = (cy - py) ** 2
                    mask = (dy2[:, None] + dx2[None, :]).reshape(-1) <= r2
                    v = vals[mask]
                    v = np.where(v == NA_SENTINEL, 0, v)
                    out_pid.append(pid)
                    out_s1.append(int(v.sum()))
                    out_s2.append(int((v * v).sum()))
                    out_n.append(int(v.size))
            yield pd.DataFrame({"point_id": out_pid, "s1": out_s1,
                                "s2": out_s2, "n": out_n})

    partials = joined.mapInPandas(zonal, PARTIAL_SCHEMA)
    agg = partials.groupBy("point_id").agg(
        F.sum("s1").alias("s1"), F.sum("s2").alias("s2"),
        F.sum("n").alias("n_cells"))
    return _ndvi_stats(agg, add_sd)


def _ndvi_stats(agg: DataFrame, add_sd: bool) -> DataFrame:
    n = F.col("n_cells")
    mean = F.col("s1").cast("double") / (F.lit(800.0) * n)
    out = [F.col("point_id"), mean.alias("mean_ndvi")]
    if add_sd:
        s1d = F.col("s1").cast("double")
        s2d = F.col("s2").cast("double")
        nd = n.cast("double")
        var = (s2d - s1d * s1d / nd) / (nd - F.lit(1.0))
        out.append((F.sqrt(var) / F.lit(800.0)).alias("sd_ndvi"))
    out.append(n)
    return agg.select(*out)


def ndvi_bands_zonal_tiles(points: DataFrame, s2_tiles: DataFrame,
                           buffer_m: float = C.BUFFER_M) -> DataFrame:
    """Zonal mean NDVI computed FROM TWO BANDS — the actual Sentinel-2
    workflow of ndvi_calc.R:315-318 (`ndvi = (nir − red)/(red + nir)`)
    that the single-band virtual raster can't represent.

    Per-cell ndvi is quantized to integer micro-units with FLOOR
    (floor((nir−red)·1e6/(nir+red)) — identical in numpy, Spark and
    DuckDB; round() is not: numpy rounds half-to-even), so the partial
    sums stay integer-exact.  Same join/partial-agg shape as
    ndvi_zonal_tiles.  Output: (point_id, mean_ndvi_bands, n_cells).
    """
    res = C.NDVI_RES
    span = TILE_CELLS * res
    p = points.select("point_id", "x", "y")
    lo = lambda c: F.floor((c - buffer_m) / span).cast("long")
    hi = lambda c: F.floor((c + buffer_m) / span).cast("long")
    cand = (p
            .withColumn("tx", F.explode(F.sequence(lo(F.col("x")),
                                                   hi(F.col("x")))))
            .withColumn("ty", F.explode(F.sequence(lo(F.col("y")),
                                                   hi(F.col("y"))))))
    joined = cand.join(
        s2_tiles.select(F.col("tx").alias("ttx"), F.col("ty").alias("tty"),
                        "xmin", "ymin", "res", "ncol", "nrow",
                        "red", "nir"),
        (F.col("tx") == F.col("ttx")) & (F.col("ty") == F.col("tty")))

    schema = StructType([
        StructField("point_id", LongType()),
        StructField("s1", LongType()),
        StructField("n", LongType()),
    ])

    def zonal(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r2 = float(buffer_m) ** 2
        for pdf in it:
            if not len(pdf):
                continue
            out_pid, out_s1, out_n = [], [], []
            for (xmin, ymin), grp in pdf.groupby(["xmin", "ymin"],
                                                 sort=False):
                red = np.asarray(grp["red"].iloc[0], dtype=np.int64)
                nir = np.asarray(grp["nir"].iloc[0], dtype=np.int64)
                v = np.floor((nir - red) * float(C.BAND_Q)
                             / (nir + red)).astype(np.int64)
                ncol = int(grp["ncol"].iloc[0])
                tres = float(grp["res"].iloc[0])
                cx = xmin + (np.arange(ncol) + 0.5) * tres
                cy = ymin + (np.arange(int(grp["nrow"].iloc[0])) + 0.5) * tres
                for pid, px, py in zip(grp["point_id"], grp["x"], grp["y"]):
                    dx2 = (cx - px) ** 2
                    dy2 = (cy - py) ** 2
                    mask = (dy2[:, None] + dx2[None, :]).reshape(-1) <= r2
                    vm = v[mask]
                    out_pid.append(pid)
                    out_s1.append(int(vm.sum()))
                    out_n.append(int(vm.size))
            yield pd.DataFrame({"point_id": out_pid, "s1": out_s1,
                                "n": out_n})

    partials = joined.mapInPandas(zonal, schema)
    agg = partials.groupBy("point_id").agg(
        F.sum("s1").alias("s1"), F.sum("n").alias("n_cells"))
    mean = (F.col("s1").cast("double")
            / (F.lit(float(C.BAND_Q)) * F.col("n_cells")))
    return agg.select("point_id", mean.alias("mean_ndvi_bands"),
                      F.col("n_cells"))
