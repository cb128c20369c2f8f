"""q_geom_props promotion (P2/P4/P6/P11/P12): kernel parity checks."""
import numpy as np
import pytest

from greenexp_r_spark import registry_geo3 as G3
from greenexp_r_spark.kernels import concave as CK
from greenexp_r_spark.kernels import geom as G
from greenexp_r_spark.operators import geomprops as GP


@pytest.fixture(scope="module")
def props(spark):
    return (GP.geometry_properties(G3.props_layer_wkb_df(spark))
            .toPandas().set_index("park_id").sort_index())


def test_known_square_with_hole(spark):
    # 10×10 shell with a 2×2 hole → area 96; centroid shifts away
    # from the hole center (3,3) relative to the shell center (5,5)
    shell = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    hole = np.array([(2, 2), (4, 2), (4, 4), (2, 4)], float)
    df = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon_rings([shell, hole])))],
        "park_id long, geom_wkb binary")
    row = GP.geometry_properties(df).toPandas().iloc[0]
    assert row.area_m2 == 96.0
    assert row.n_members == 1 and row.n_holes == 1
    assert not row.is_multi and row.has_holes
    # exact centroid: (500*100 - 3*4) scaled → (5*100 - 3*4)/96
    assert row.centroid_x == pytest.approx((5 * 100 - 3 * 4) / 96.0,
                                           abs=0, rel=0)
    assert (row.bxmin, row.bymin, row.bxmax, row.bymax) == (0, 0, 10, 10)


def test_centroid_matches_single_ring_kernel(props):
    """For the concave (single-ring) parks the one-pass moments must
    equal the standalone P2 kernel."""
    for g in range(G3.N_CONCAVE):
        ring = CK.make_valid_general(G3.concave_park_ring(g))
        cx, cy = G.polygon_centroid(ring)
        row = props.loc[G3.CONCAVE_PROPS_OFFSET + g]
        assert row.centroid_x == cx and row.centroid_y == cy
        assert row.area_m2 == abs(G.polygon_area(ring))
        assert row.n_members == 1 and row.n_holes == 0


def test_holed_parks_flags_and_area(props):
    for g in range(G3.N_HOLED):
        members = [CK.make_valid_polygon(m)
                   for m in G3.holed_park_rings(g)]
        area = sum(abs(G.polygon_area(r[0]))
                   - sum(abs(G.polygon_area(h)) for h in r[1:])
                   for r in members)
        row = props.loc[g]
        assert row.area_m2 == area
        assert row.is_multi == (len(members) > 1)
        assert row.n_holes == sum(len(r) - 1 for r in members)


def test_service_radius_formula(props):
    from greenexp_r_spark.functions.geo import buffer_distance_from_speed
    for pid, row in props.iterrows():
        assert row.service_radius_m == buffer_distance_from_speed(
            GP.SERVICE_SPEED_KMH, GP.SERVICE_TIME_BASE_MIN + pid % 20)
