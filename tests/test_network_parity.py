"""Round-2 network parity operators: weighted Dijkstra, pseudo-
entrances, extended (full-OD fallback) search.

Reference semantics: accessibility.R:223-247 (entrances), :343-356
(weight = edge_length Dijkstra), :352-358 (full OD matrix fallback).
"""

import pytest

from pyspark.sql import functions as F

from greenexp_r_spark import constants as C, world
from greenexp_r_spark.operators import network

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pts(spark):
    return world.points_df(spark, SF)


def test_weighted_edges_heterogeneous(spark):
    e = world.road_edges_weighted_df(spark)
    stats = e.agg(F.min("length_m").alias("lo"),
                  F.max("length_m").alias("hi"),
                  F.countDistinct("length_m").alias("nd")).first()
    assert stats.lo >= C.WEDGE_BASE
    assert stats.hi <= C.WEDGE_BASE + C.WEDGE_SPAN - 1
    assert stats.nd > 10  # genuinely heterogeneous


def test_weighted_vs_bfs_bounds(spark, pts):
    """Weighted shortest path with lengths in [80, 140] must sit within
    [0.8, 1.4]x the uniform-100m BFS distance for every reachable node
    (same lattice, same entrance seeds)."""
    bfs = network.network_access(
        pts, world.road_edges_df(spark), world.park_entrances_df(spark))
    wgt = network.network_access_weighted(
        pts, world.road_edges_weighted_df(spark),
        world.park_entrances_df(spark))
    j = (bfs.select("point_id", F.col("network_dist").alias("d_bfs"))
         .join(wgt.select("point_id", F.col("network_dist").alias("d_w")),
               "point_id")
         .where(F.col("d_bfs").isNotNull() & (F.col("d_bfs") > 0)))
    bad = j.where((F.col("d_w") < 0.8 * F.col("d_bfs") - 1e-9)
                  | (F.col("d_w") > 1.4 * F.col("d_bfs") + 1e-9)).count()
    assert bad == 0
    assert j.count() > 0


def test_entrance_nodes_inside_dissolved_buffer(spark):
    """Every pseudo-entrance node lies within radius+20 m of some
    qualifying park; and parks large enough to contain a node
    contribute at least one."""
    en = world.park_entrance_nodes_df(spark).toPandas()
    parks = world.parks_df(spark).where(
        F.col("area_m2") > C.MIN_GREENSPACE_M2).toPandas()
    assert len(en) > 0
    n = C.ROAD_N
    for node in en.entrance_node:
        nx, ny = (node % n) * 100, (node // n) * 100
        ok = ((parks.cx - nx) ** 2 + (parks.cy - ny) ** 2
              <= (parks.radius + C.ENTRANCE_BUFFER_M) ** 2).any()
        assert ok, f"node {node} outside every park buffer"


def test_extended_agrees_with_bounded(spark, pts):
    """Where the bounded search found a distance, the extended search
    must report the identical one; where it did not, extended must be
    ≥ the bound (or null only for disconnected islands)."""
    b = network.network_access(
        pts, world.road_edges_df(spark), world.park_entrances_df(spark))
    e = network.network_access_extended(
        pts, world.road_edges_df(spark), world.park_entrances_df(spark),
        ext_max_dist=2000.0)
    j = (b.select("point_id", F.col("network_dist").alias("db"))
         .join(e.select("point_id", F.col("network_dist").alias("de")),
               "point_id"))
    mismatch = j.where(F.col("db").isNotNull()
                       & (F.col("db") != F.col("de"))).count()
    assert mismatch == 0
    beyond = j.where(F.col("db").isNull() & F.col("de").isNotNull())
    assert beyond.where(F.col("de") <= C.NET_MAX_DIST).count() == 0


def test_hopset_equals_bfs(spark):
    """Hop-doubling relaxation (2^3-hop min-dist edge set, rounds/8)
    must produce the exact BFS distances on the same graph/sources."""
    eb = network.bidirectional(world.road_edges_df(spark))
    src = world.park_entrances_df(spark).select(
        F.col("entrance_node").alias("node_id"))
    bfs = network.multi_source_dist_bfs(eb, src, max_dist=2000.0) \
        .orderBy("node_id").toPandas()
    hs = network.multi_source_dist_hopset(eb, src, max_dist=2000.0) \
        .orderBy("node_id").toPandas()
    assert len(bfs) == len(hs)
    assert (bfs["node_id"].to_numpy() == hs["node_id"].to_numpy()).all()
    assert (bfs["net_dist"].to_numpy() == hs["net_dist"].to_numpy()).all()


def _py_dijkstra(edges, sources, max_dist):
    """Pure-Python multi-source Dijkstra oracle (heap-based)."""
    import heapq
    from collections import defaultdict
    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
        adj[d].append((s, w))
    dist = {s: 0.0 for s in sources}
    heap = [(0.0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd <= max_dist and nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


@pytest.mark.parametrize("seed", [7, 41, 1234])
def test_hopset_matches_python_dijkstra_random_graph(spark, seed):
    """Weighted hop-doubling relaxation vs a heap Dijkstra oracle on
    seeded random graphs (integer weights → exact float sums)."""
    import random
    rng = random.Random(seed)
    n = 60
    edges = []
    for _ in range(150):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.append((a, b, float(rng.randrange(5, 40))))
    sources = [rng.randrange(n) for _ in range(3)]
    max_dist = 120.0
    want = _py_dijkstra(edges, set(sources), max_dist)

    e = spark.createDataFrame(edges, "src long, dst long, length_m double")
    s = spark.createDataFrame([(x,) for x in set(sources)], "node_id long")
    got = network.multi_source_dist_hopset(
        network.bidirectional(e), s, max_dist=max_dist, hop=5.0,
        k_log2=2).toPandas()
    got_d = dict(zip(got.node_id, got.net_dist))
    assert got_d == want


def test_driver_dijkstra_equals_distributed(spark):
    """Size-routing correctness: the driver-side heap Dijkstra must be
    value-identical to BOTH distributed relaxations (BFS layering for
    uniform weights; hop-doubling Bellman-Ford for heterogeneous) on
    the world graph at the extended bound."""
    srcs = world.park_entrances_df(spark).select(
        F.col("entrance_node").alias("node_id"))
    # uniform lattice, extended bound (deepest search)
    eb = network.bidirectional(world.road_edges_df(spark))
    drv = network.multi_source_dist_driver(
        eb, srcs, max_dist=C.EXT_MAX_DIST).toPandas() \
        .sort_values("node_id").reset_index(drop=True)
    bfs = network.multi_source_dist_bfs(
        eb, srcs, max_dist=C.EXT_MAX_DIST).toPandas() \
        .sort_values("node_id").reset_index(drop=True)
    assert len(drv) == len(bfs)
    assert (drv["node_id"].values == bfs["node_id"].values).all()
    assert (drv["net_dist"].values == bfs["net_dist"].values).all()
    # heterogeneous weights at the bounded radius
    ew = network.bidirectional(world.road_edges_weighted_df(spark))
    drv_w = network.multi_source_dist_driver(
        ew, srcs, max_dist=C.NET_MAX_DIST).toPandas() \
        .sort_values("node_id").reset_index(drop=True)
    hop = network.multi_source_dist_hopset(
        ew, srcs, max_dist=C.NET_MAX_DIST,
        hop=C.WEDGE_BASE, k_log2=2).toPandas() \
        .sort_values("node_id").reset_index(drop=True)
    assert len(drv_w) == len(hop)
    assert (drv_w["node_id"].values == hop["node_id"].values).all()
    assert (drv_w["net_dist"].values == hop["net_dist"].values).all()


def test_auto_routes_small_graph_without_iterating(spark):
    """On a dimension-sized graph multi_source_dist_auto must return
    the driver solve (flat two-stage plan, no iterative checkpoints)."""
    srcs = world.park_entrances_df(spark).select(
        F.col("entrance_node").alias("node_id"))
    eb = network.bidirectional(world.road_edges_df(spark))
    out = network.multi_source_dist_auto(
        eb, srcs, max_dist=C.NET_MAX_DIST, uniform=True,
        n_edges_hint=4 * C.ROAD_N * (C.ROAD_N - 1))
    # a driver-solve result is a parallelized local collection: its
    # plan contains no joins at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert out.count() > 0


def test_component_driver_equals_distributed(spark):
    """Union-find routing parity: labels identical to the iterative
    min-label/pointer-jumping propagation on the road lattice and on
    a random multi-component graph."""
    eb = network.bidirectional(world.road_edges_df(spark))
    drv = network._component_labels_driver(eb).toPandas() \
        .sort_values("node_id").reset_index(drop=True)
    # force the distributed path despite the small graph
    dist = network.component_labels(
        eb, n_edges_hint=network.COMPONENT_DRIVER_EDGE_LIMIT + 1
    ).toPandas().sort_values("node_id").reset_index(drop=True)
    assert len(drv) == len(dist)
    assert (drv["node_id"].values == dist["node_id"].values).all()
    assert (drv["label"].values == dist["label"].values).all()

    import random
    rng = random.Random(7)
    edges = [(rng.randrange(500), rng.randrange(500))
             for _ in range(300)]
    df = spark.createDataFrame(edges, "src long, dst long")
    both = df.union(df.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))
    a = network._component_labels_driver(both).toPandas() \
        .sort_values("node_id").reset_index(drop=True)
    b = network.component_labels(
        both, n_edges_hint=network.COMPONENT_DRIVER_EDGE_LIMIT + 1
    ).toPandas().sort_values("node_id").reset_index(drop=True)
    assert (a["node_id"].values == b["node_id"].values).all()
    assert (a["label"].values == b["label"].values).all()


def test_isochrone_driver_equals_distributed(spark, sf_dir):
    """Size-routed isochrones (round 4): the driver labeled-BFS must
    reproduce the distributed layering exactly, and the auto router
    must take the distributed path past the limit."""
    from pyspark.sql import functions as F
    from greenexp_r_spark import world

    pts = world.points_df(spark, sf_dir).where(
        F.col("point_id") % 50 == 0)
    edges = world.road_edges_df(spark)
    a = network.isochrone_nodes_driver(pts, edges).toPandas() \
        .sort_values(["point_id", "node_id"]).reset_index(drop=True)
    b = network.isochrone_nodes(pts, edges).toPandas() \
        .sort_values(["point_id", "node_id"]).reset_index(drop=True)
    assert a.equals(b)
    c = network.isochrone_nodes_auto(
        pts, edges,
        n_edges_hint=network.DRIVER_GRAPH_EDGE_LIMIT + 1).toPandas() \
        .sort_values(["point_id", "node_id"]).reset_index(drop=True)
    assert c.equals(a)


@pytest.mark.parametrize("seed", [3, 99])
def test_buckets_tiny_min_edge_exact_and_bounded(seed):
    """ADVICE r04: a 0.01-length edge must not blow the bucket count
    up to max_dist/0.01 iterations.  The clamped-delta solver with
    in-bucket re-expansion must stay exact vs a heap Dijkstra AND
    finish fast."""
    import random
    import time

    import numpy as np

    rng = random.Random(seed)
    n = 400
    edges = [(a, b, w)
             for _ in range(1600)
             for a, b in [(rng.randrange(n), rng.randrange(n))]
             if a != b
             for w in [float(rng.choice(
                 [0.01, 0.02, 5.0, 17.0, 60.0, 123.0]))]]
    sources = list({rng.randrange(n) for _ in range(4)})
    max_dist = 500.0
    want = {k: v for k, v in
            _py_dijkstra(edges, set(sources), max_dist).items()
            if v <= max_dist}
    # the oracle walks edges both ways — hand the solver both arcs
    src = np.array([e[0] for e in edges]
                   + [e[1] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges]
                   + [e[0] for e in edges], dtype=np.int64)
    w = np.array([e[2] for e in edges] * 2)
    t0 = time.perf_counter()
    ids, dists = network.dijkstra_buckets(
        src, dst, w, np.array(sources, dtype=np.int64), max_dist)
    elapsed = time.perf_counter() - t0
    got = dict(zip(ids.tolist(), dists.tolist()))
    assert got == want                      # bit-identical, not approx
    # 50k one-pass buckets would take seconds; the clamp caps ~2048
    assert elapsed < 5.0


def test_probe_guard_failing_open_never_changes_routing(spark,
                                                        monkeypatch):
    """VERDICT r04 ask #8: _warn_if_expensive_probe reads private
    py4j surface; if that drifts (simulated here by making
    storageLevel raise), the guard must swallow the failure and the
    size-routed result must be identical."""
    eb = network.bidirectional(world.road_edges_df(spark))
    srcs = eb.select(F.col("src").alias("node_id")).distinct().limit(3)
    want = network.multi_source_dist_auto(eb, srcs).toPandas() \
        .sort_values("node_id").reset_index(drop=True)

    from pyspark.sql import DataFrame as _DF

    def boom(self):
        raise RuntimeError("simulated py4j drift")

    monkeypatch.setattr(_DF, "storageLevel", property(boom))
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")        # no warning may escape either
        got = network.multi_source_dist_auto(eb, srcs).toPandas() \
            .sort_values("node_id").reset_index(drop=True)
    assert (got["node_id"].values == want["node_id"].values).all()
    assert (got["net_dist"].values == want["net_dist"].values).all()


def test_prefilter_variant_distinguishes_from_full_od(spark):
    """accessibility.R:326-350 loop semantics (VERDICT r04 ask #7):
    the euclidean-prefilter columns must genuinely differ from the
    full-OD ones on the world fixture — the flag is the euclidean
    test (boundary-inclusive), the distance is the min over the
    euclidean candidate set only."""
    from greenexp_r_spark.registry import build_registry
    got = build_registry()["q_accessibility_network"].spark(
        spark, SF).toPandas()
    # (a) the two flags disagree somewhere
    assert (got["prefilter_in_buffer"]
            != got["reachable_in_buffer"]).any()
    # (b) the loop can report distances beyond the buffer (the
    # network cost to a euclidean candidate is unbounded by it)
    assert ((got["prefilter_in_buffer"])
            & (got["prefilter_dist"] > C.BUFFER_M)).any()
    # (c) the documented PREFILTER_MAX_DIST bound never truncates on
    # the connected lattice: every flagged row has a distance
    assert not (got["prefilter_in_buffer"]
                & got["prefilter_dist"].isna()).any()
    # (d) restricted-set min can only exceed-or-equal the full-OD min
    both = got.dropna(subset=["network_dist", "prefilter_dist"])
    assert (both["prefilter_dist"] >= both["network_dist"]).all()
    assert len(both) > 0
