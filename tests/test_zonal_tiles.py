"""Tile-join zonal path must reproduce the virtual-raster closed form
bit-for-bit (same integer moments, same cell membership)."""

from __future__ import annotations

import numpy as np

from greenexp_r_spark import world
from greenexp_r_spark.operators import availability, zonal_tiles
from greenexp_r_spark.sources import tiles as TS

from .conftest import SF_TEST


def test_tile_zonal_equals_virtual(spark):
    pts = world.points_df(spark, SF_TEST).where("point_id % 5 = 0")
    tiles = TS.ndvi_tiles_df(spark)
    got = (zonal_tiles.ndvi_zonal_tiles(pts, tiles).toPandas()
           .sort_values("point_id").reset_index(drop=True))
    want = (availability.ndvi_zonal(pts).toPandas()
            .sort_values("point_id").reset_index(drop=True))
    assert got["point_id"].tolist() == want["point_id"].tolist()
    np.testing.assert_array_equal(got["n_cells"].to_numpy(),
                                  want["n_cells"].to_numpy())
    np.testing.assert_array_equal(got["mean_ndvi"].to_numpy(),
                                  want["mean_ndvi"].to_numpy())
    np.testing.assert_array_equal(got["sd_ndvi"].to_numpy(),
                                  want["sd_ndvi"].to_numpy())


def test_tile_values_match_sql_expr(spark):
    """Spot-check tile array values against the shared-SQL closed form."""
    import duckdb
    v = TS.ndvi_tile_values(3, 5)
    ci0, cj0 = 3 * TS.TILE_CELLS, 5 * TS.TILE_CELLS
    from greenexp_r_spark.world import ndvi_int_expr
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT {ndvi_int_expr(f'{ci0} + (i % 256)', f'{cj0} + (i // 256)')} AS v
        FROM (SELECT unnest(generate_series(0, 65535)) AS i)
    """).df()["v"].to_numpy()
    got = np.where(v == TS.NA_SENTINEL, 0, v)
    np.testing.assert_array_equal(got, rows)
