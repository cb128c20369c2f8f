"""GeoTIFF codec + distributed ingest: round-trip and zonal equality
with the virtual-raster path (S3 fed by real files, not only
synthesized tiles)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_TEST

from greenexp_r_spark import world
from greenexp_r_spark.sources import geotiff as GT
from greenexp_r_spark.sources.tiles import TILE_CELLS, ndvi_tile_values


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(tmp_path, compress):
    rng = np.random.RandomState(3)
    a = rng.randint(-500, 500, (64, 96)).astype(np.int32)
    p = str(tmp_path / "t.tif")
    GT.write_geotiff(p, a, xmin=1280.0, ymax=2560.0, res=10.0,
                     compress=compress)
    vals, xmin, ymax, res = GT.parse_geotiff(open(p, "rb").read())
    assert (vals == a).all()
    assert (xmin, ymax, res) == (1280.0, 2560.0, 10.0)


def _world_geotiffs(tmp_path, txs, tys, res=10):
    """Export synthetic NDVI tiles as one GeoTIFF per tile (north-up)."""
    span = TILE_CELLS * res
    for tx in txs:
        for ty in tys:
            v = ndvi_tile_values(tx, ty, res).reshape(TILE_CELLS,
                                                      TILE_CELLS)
            north_up = v[::-1].astype(np.int32)   # tiles store south-up
            GT.write_geotiff(str(tmp_path / f"t_{tx}_{ty}.tif"),
                             north_up, xmin=tx * span,
                             ymax=(ty + 1) * span, res=float(res),
                             compress=(tx + ty) % 2 == 0)


def test_ingest_zonal_equals_virtual(spark, tmp_path):
    """GeoTIFF files → ingest → tile-join zonal ≡ virtual-raster zonal
    for points whose buffers the files fully cover."""
    from greenexp_r_spark.operators.availability import ndvi_zonal
    from greenexp_r_spark.operators.zonal_tiles import ndvi_zonal_tiles

    _world_geotiffs(tmp_path, range(0, 9), range(0, 9))
    tiles = GT.ingest_geotiff_tiles(spark, str(tmp_path) + "/*.tif")
    pts = world.points_df(spark, SF_TEST).where(
        "x > 400 and x < 19600 and y > 400 and y < 19600").limit(60)
    got = ndvi_zonal_tiles(pts, tiles).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    want = ndvi_zonal(pts).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert got.equals(want)


def test_tiles_from_array_rejects_misaligned():
    a = np.zeros((TILE_CELLS, TILE_CELLS), dtype=np.int32)
    with pytest.raises(ValueError):
        list(GT.tiles_from_array(a, xmin=13.0, ymax=2560.0, res=10.0))
