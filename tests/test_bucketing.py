"""Co-located bucketed joins: two tables bucketed on the join key
join with NO Exchange; the unbucketed control shuffles."""

from __future__ import annotations

import pandas as pd

from .conftest import SF_TEST

from greenexp_r_spark.operators import pages_ops, availability
from greenexp_r_spark.plans import bucketing


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    geo = pages_ops.geocode(
        pages_ops.pages_snapshot(spark, SF_TEST)
    ).select("point_id", "url", "x", "y")
    av = availability.ndvi_zonal(geo)

    bucketing.write_bucketed(geo, "t_geo_b", "point_id", 4,
                             str(tmp_path / "geo"))
    bucketing.write_bucketed(av, "t_av_b", "point_id", 4,
                             str(tmp_path / "av"))
    try:
        # forbid broadcast so the join shape is SMJ/shuffled-hash —
        # the regime where bucketing matters
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j_b = bucketing.read_table(spark, "t_geo_b").join(
                bucketing.read_table(spark, "t_av_b"), "point_id")
            j_u = geo.join(av, "point_id")
            assert bucketing.n_exchanges(j_b) == 0
            assert bucketing.n_exchanges(j_u) > 0
            got = (j_b.toPandas().sort_values("point_id")
                   .reset_index(drop=True))
            want = (j_u.toPandas().sort_values("point_id")
                    .reset_index(drop=True))
            pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                          want[sorted(want.columns)])
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_geo_b")
        spark.sql("DROP TABLE IF EXISTS t_av_b")
