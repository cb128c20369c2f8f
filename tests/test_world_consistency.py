"""Guard against drift between the three renderings of the world:
shared-SQL (world.py), Spark DataFrame, and numpy (kernels/worldgrid).
The VGVI kernels consume the numpy parks; the oracle queries consume
the SQL parks — they must be the same discs forever."""

from __future__ import annotations

import numpy as np

from greenexp_r_spark import world
from greenexp_r_spark.kernels import worldgrid as W

from .conftest import SF_TEST


def test_park_discs_match_sql(spark):
    sql = (world.parks_df(spark)
           .select("park_id", "cx", "cy", "radius")
           .orderBy("park_id").toPandas())
    np_discs = W.park_discs()
    np.testing.assert_array_equal(sql["cx"].to_numpy(), np_discs[:, 0])
    np.testing.assert_array_equal(sql["cy"].to_numpy(), np_discs[:, 1])
    np.testing.assert_array_equal(sql["radius"].to_numpy(), np_discs[:, 2])


def test_points_match_constants(spark):
    from greenexp_r_spark import constants as C
    pts = world.points_df(spark, SF_TEST).orderBy("point_id") \
        .limit(100).toPandas()
    did = pts["point_id"].to_numpy()
    x = ((did * C.X_MUL + C.X_ADD) % C.P31) % C.WORLD_SIZE
    y = ((did * C.Y_MUL + C.Y_ADD) % C.P31) % C.WORLD_SIZE
    np.testing.assert_array_equal(pts["x"].to_numpy(), x.astype(float))
    np.testing.assert_array_equal(pts["y"].to_numpy(), y.astype(float))
