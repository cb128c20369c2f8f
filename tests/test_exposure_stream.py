"""Streaming exposure scoring: the stateless per-capture scorer must
equal the batch operators bit-for-bit, and the readStream run must
equal the batch run row-for-row."""

from __future__ import annotations

import pandas as pd

from .conftest import SF_TEST

from greenexp_r_spark import world
from greenexp_r_spark.operators import (accessibility, availability,
                                        pages_ops)
from greenexp_r_spark.sources import pages as P
from greenexp_r_spark.streaming import exposure_stream as ES


def test_scorer_equals_batch_operators(spark):
    caps = pages_ops.extract_text(P.pages_df(spark, SF_TEST))
    got = ES.score_captures(spark, caps).toPandas()
    geo = pages_ops.geocode(caps).select("point_id", "x", "y").distinct()
    av = availability.ndvi_zonal(geo, add_sd=False).toPandas()
    ac = accessibility.euclidean_access(geo, world.parks_df(spark)) \
        .toPandas()
    m = got.merge(av, on="point_id", suffixes=("", "_b")) \
           .merge(ac, on="point_id", suffixes=("", "_c"))
    assert len(m) == len(got) > 0
    # bit-identical, not approx: same integer raster hash, same BIGINT
    # distance minimum, same final float expressions
    assert (m["mean_ndvi"] == m["mean_ndvi_b"]).all()
    assert (m["n_cells"] == m["n_cells_b"]).all()
    assert (m["closest_greenspace"] == m["closest_greenspace_c"]).all()
    assert (m["greenspace_in_buffer"]
            == m["greenspace_in_buffer_c"]).all()


def test_stream_equals_batch(spark):
    got = ES.run_exposure_available_now(
        spark, f"{SF_TEST}/documents.parquet").toPandas()
    want = ES.score_captures(
        spark,
        pages_ops.extract_text(P.pages_df(spark, SF_TEST))).toPandas()
    cols = ["url", "warc_ts", "point_id", "mean_ndvi", "n_cells",
            "closest_greenspace", "greenspace_in_buffer"]
    a = got[cols].sort_values(["url", "warc_ts"], ignore_index=True)
    b = want[cols].sort_values(["url", "warc_ts"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # one exposure row per CAPTURE (stateless), not per url
    assert len(a) == P.pages_df(spark, SF_TEST).count()


def test_scorer_empty_park_dim(spark):
    """Every park filtered out (ADVICE r04): the scorer must emit
    inf distance / False in-buffer, matching left-join semantics,
    instead of crashing on the (n, 0) reduction."""
    import numpy as np
    caps = pages_ops.extract_text(P.pages_df(spark, SF_TEST)).limit(20)
    geo = pages_ops.geocode(caps).select(
        "url", "warc_ts", "point_id", "x", "y")
    empty = np.array([], dtype=np.int64)
    got = geo.mapInPandas(ES.exposure_scorer(empty, empty),
                          ES.EXPO_SCHEMA).toPandas()
    assert len(got) == 20
    assert np.isinf(got["closest_greenspace"]).all()
    assert (~got["greenspace_in_buffer"]).all()
    assert got["mean_ndvi"].notna().all()
