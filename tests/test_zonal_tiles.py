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


def test_aoi_block_mean_matches_numpy(spark):
    """V10 AOI crop + block-mean: per-block values equal a direct
    numpy replay of the NA->0 field, and only in-AOI centers emit."""
    import numpy as np
    from greenexp_r_spark import constants as C
    from greenexp_r_spark.operators.zonal_tiles import aoi_block_mean
    from greenexp_r_spark.sources.tiles import ndvi_tile_values, NA_SENTINEL

    fact, res = 32, C.NDVI_RES
    bspan = fact * res
    axmin, axmax, aymin, aymax = 4000.0, 5000.0, 3000.0, 4200.0
    out = (aoi_block_mean(spark, axmin, axmax, aymin, aymax, fact=fact)
           .toPandas().set_index(["bi", "bj"]).sort_index())
    # expected block index ranges (centers inside the AOI)
    want = []
    for bi in range(0, 100):
        if not axmin <= bi * bspan + bspan / 2 < axmax:
            continue
        for bj in range(0, 100):
            if not aymin <= bj * bspan + bspan / 2 < aymax:
                continue
            want.append((bi, bj))
    assert sorted(out.index) == sorted(want)
    for bi, bj in want[:6]:
        tx, ty = (bi * fact) // 256, (bj * fact) // 256
        raw = ndvi_tile_values(tx, ty, res).reshape(256, 256)
        li, lj = bi * fact - tx * 256, bj * fact - ty * 256
        block = raw[lj:lj + fact, li:li + fact].astype(np.int64)
        na = block == NA_SENTINEL
        v = np.where(na, 0, block)
        row = out.loc[(bi, bj)]
        assert row.n_na == int(na.sum())
        assert row.block_mean == v.sum() / float(fact * fact)
