"""Spark visibility operators vs direct numpy-kernel evaluation."""

from __future__ import annotations

import numpy as np
import pytest

from greenexp_r_spark import constants as C, world
from greenexp_r_spark.kernels import vgvi as K
from greenexp_r_spark.operators import visibility

from .conftest import SF_TEST


def _local_points(spark):
    pdf = (world.points_df(spark, SF_TEST)
           .where("point_id % 10 = 0")
           .select("point_id", "x", "y").toPandas()
           .sort_values("point_id").reset_index(drop=True))
    return pdf


def test_vgvi_points_matches_kernel(spark):
    pts = world.points_df(spark, SF_TEST)
    got = (visibility.vgvi_points(pts).toPandas()
           .sort_values("point_id").reset_index(drop=True))
    pdf = _local_points(spark)
    r = int(round(C.VIS_MAX_DIST / C.VIS_RES))
    dsm, gs, h0 = visibility._patches(
        pdf["x"].to_numpy(), pdf["y"].to_numpy(), r, C.VIS_RES)
    want = K.vgvi_batch(dsm, gs, h0, r, C.VIS_RES, C.VIS_MAX_DIST,
                        1, C.VGVI_M, C.VGVI_B)
    assert (got["point_id"].to_numpy() == pdf["point_id"].to_numpy()).all()
    np.testing.assert_array_equal(got["vgvi"].to_numpy(), want)
    assert ((got["vgvi"] >= 0) & (got["vgvi"] <= 1)).all()


def test_viewshed_metrics_sane(spark):
    pts = world.points_df(spark, SF_TEST)
    got = visibility.viewshed_metrics(pts).toPandas()
    assert len(got) == 50
    assert (got["visible_cells"] >= 1).all()
    assert (got["visible_cells"] <= got["disk_cells"]).all()
    p = got["visibility_proportion"]
    assert ((p > 0) & (p <= 1)).all()


def test_vgvi_from_address_deterministic(spark):
    pts = world.points_df(spark, SF_TEST)
    a = visibility.vgvi_from_address(pts).toPandas().sort_values("point_id")
    b = visibility.vgvi_from_address(pts).toPandas().sort_values("point_id")
    np.testing.assert_array_equal(a["mean_vgvi"].to_numpy(),
                                  b["mean_vgvi"].to_numpy())
    assert (a["n_samples"] == 10).all()
