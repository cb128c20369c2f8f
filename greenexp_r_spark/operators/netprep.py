"""Network graph preparation (VERDICT r02 'What's missing #2').

The reference builds its routable graph with
`as_sfnetwork(lines) %>% to_spatial_subdivision()` (ndvi_calc.R:146-147;
NAMESPACE also imports to_spatial_smooth): raw OSM polylines are

  1. **subdivided** at every interior vertex that also occurs in any
     other line (or as another line's endpoint) — sfnetworks
     to_spatial_subdivision semantics — so crossings become graph
     nodes, and
  2. **smoothed**: degree-2 "pseudo nodes" (where two polylines merely
     continue each other) are removed, concatenating the two incident
     edges and summing their lengths — sfnetworks to_spatial_smooth.

Spark shapes (100 TB posture):
  * subdivision is per-segment local: one groupBy(node) occurrence
    count filtered to occ≥2 BEFORE the broadcast (only shared vertices
    ship — a small fraction of all vertices; unshared ones coalesce to
    occ 1) + window functions partitioned by seg_id.  No iteration.
  * smoothing reuses the shared connected-component operator
    (network.component_labels) on the degree-2-induced subgraph —
    chains contract in O(log chain-length) label-propagation rounds,
    not one driver round per pseudo node.

The synthetic fixture (`segments_sql` / `segments_df`) is a 21×21
lattice world of overlapping NON-noded polylines: full-height vertical
streets every 4 columns, horizontal streets every 4 rows split into
two polylines meeting end-to-end at the non-crossing column i=10
(degree-2 pseudo nodes), plus a dangling spur sharing its endpoint
with a vertical's interior.  Subdivision must split at crossings and
at the spur junction; smoothing must contract the i=10 pseudo nodes
and the four lattice corners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .network import bidirectional, component_labels

NET_N = 21                  # fixture lattice nodes per side
NET_SPACING = 100.0         # meters between adjacent lattice vertices


# ----------------------------------------------------------- fixture

def segments_sql(d) -> str:
    """Vertex table (seg_id, pos, node_id, vx, vy) of the raw,
    non-noded polyline fixture; identical integer arithmetic in both
    dialects.  node_id = j * NET_N + i."""
    n = NET_N
    vert = f"""
        SELECT vi AS seg_id, j AS pos,
               j * {n} + vi * 4 AS node_id,
               CAST(vi * 4 * {int(NET_SPACING)} AS DOUBLE) AS vx,
               CAST(j * {int(NET_SPACING)} AS DOUBLE) AS vy
        FROM {d.range_select(0, 5, "vi")}
        CROSS JOIN {d.range_select(0, n - 1, "j")}
    """
    hor_a = f"""
        SELECT 6 + hj AS seg_id, i AS pos,
               hj * 4 * {n} + i AS node_id,
               CAST(i * {int(NET_SPACING)} AS DOUBLE) AS vx,
               CAST(hj * 4 * {int(NET_SPACING)} AS DOUBLE) AS vy
        FROM {d.range_select(0, 5, "hj")}
        CROSS JOIN {d.range_select(0, 10, "i")}
    """
    hor_b = f"""
        SELECT 12 + hj AS seg_id, i AS pos,
               hj * 4 * {n} + i + 10 AS node_id,
               CAST((i + 10) * {int(NET_SPACING)} AS DOUBLE) AS vx,
               CAST(hj * 4 * {int(NET_SPACING)} AS DOUBLE) AS vy
        FROM {d.range_select(0, 5, "hj")}
        CROSS JOIN {d.range_select(0, 10, "i")}
    """
    spur = f"""
        SELECT 18 AS seg_id, p AS pos,
               2 * {n} + p AS node_id,
               CAST(p * {int(NET_SPACING)} AS DOUBLE) AS vx,
               CAST(2 * {int(NET_SPACING)} AS DOUBLE) AS vy
        FROM {d.range_select(0, 2, "p")}
    """
    return (f"SELECT * FROM ({vert}) _v UNION ALL "
            f"SELECT * FROM ({hor_a}) _a UNION ALL "
            f"SELECT * FROM ({hor_b}) _b UNION ALL "
            f"SELECT * FROM ({spur}) _s")


def segments_df(spark: SparkSession) -> DataFrame:
    from ..dialect import SPARK
    return spark.sql(segments_sql(SPARK))


# --------------------------------------------------------- operators

def subdivide(verts: DataFrame) -> DataFrame:
    """to_spatial_subdivision: split each polyline at every vertex
    shared with any other polyline occurrence (interior OR endpoint —
    sfnetworks splits on both), keeping unshared interior vertices as
    pure geometry.  Input: (seg_id, pos, node_id, vx, vy).
    Output: edges (src, dst, length_m), length = along-line distance
    between consecutive cut vertices."""
    # only vertices occurring ≥2 times are broadcast (ADVICE r03 #4:
    # broadcasting the full per-vertex count table would ship
    # O(all-vertices) to every executor; shared vertices — the only
    # ones that matter for cuts — are the small fraction).  Unshared
    # vertices come back as null → occ 1 via coalesce.
    shared = (verts.groupBy("node_id")
              .agg(F.count(F.lit(1)).alias("occ"))
              .where(F.col("occ") >= 2))
    mx = verts.groupBy("seg_id").agg(F.max("pos").alias("maxpos"))
    w = Window.partitionBy("seg_id").orderBy("pos")
    v = (verts
         .join(F.broadcast(shared), "node_id", "left")
         .withColumn("occ", F.coalesce("occ", F.lit(1)))
         .join(F.broadcast(mx), "seg_id")
         .withColumn("step", F.sqrt(
             F.pow(F.col("vx") - F.lag("vx").over(w), 2)
             + F.pow(F.col("vy") - F.lag("vy").over(w), 2)))
         .withColumn("cumlen", F.coalesce(
             F.sum("step").over(w.rowsBetween(Window.unboundedPreceding, 0)),
             F.lit(0.0)))
         .withColumn("is_cut", (F.col("pos") == 0)
                     | (F.col("pos") == F.col("maxpos"))
                     | (F.col("occ") >= 2)))
    cuts = v.where("is_cut")
    wc = Window.partitionBy("seg_id").orderBy("pos")
    edges = (cuts
             .withColumn("dst", F.lead("node_id").over(wc))
             .withColumn("dlen", F.lead("cumlen").over(wc) - F.col("cumlen"))
             .where(F.col("dst").isNotNull())
             .select(F.col("node_id").alias("src"), "dst",
                     F.col("dlen").alias("length_m")))
    return edges


def smooth(edges: DataFrame) -> DataFrame:
    """to_spatial_smooth: contract every maximal chain of degree-2
    pseudo nodes into one edge whose length is the chain's total.
    Chains are found with the shared component-label operator over the
    degree-2-induced subgraph (no per-node driver iteration).
    Pure deg-2 cycles (no anchor) are dropped, matching their
    disappearance from any anchor-reachable output."""
    eb = bidirectional(edges)
    deg = eb.groupBy(F.col("src").alias("node_id")) \
            .agg(F.count(F.lit(1)).alias("deg"))
    deg2 = deg.where(F.col("deg") == 2).select("node_id")
    # materialize the annotated edge table ONCE: passthrough/interior/
    # anchor slices and the final union all re-read it, and without
    # the checkpoint each consumer re-executed the degree joins AND
    # the upstream subdivision windows (measured 8.2 s → 2.6 s on the
    # fixture; same O(edges) footprint as the input at scale)
    e = (edges
         .join(deg2.withColumnRenamed("node_id", "src")
               .withColumn("s2", F.lit(True)), "src", "left")
         .join(deg2.withColumnRenamed("node_id", "dst")
               .withColumn("d2", F.lit(True)), "dst", "left")
         .select("src", "dst", "length_m",
                 F.coalesce("s2", F.lit(False)).alias("s2"),
                 F.coalesce("d2", F.lit(False)).alias("d2"))
         .localCheckpoint(eager=True))
    passthrough = e.where(~F.col("s2") & ~F.col("d2")) \
                   .select("src", "dst", "length_m")
    interior = e.where(F.col("s2") & F.col("d2"))
    # chain labels: components over interior edges; deg-2 nodes with no
    # interior edge are single-node chains labeled by themselves
    if interior.take(1):
        # `e` is checkpointed above, so the probe/solve reads a leaf
        int_bidir = bidirectional(interior.select("src", "dst",
                                                  "length_m"))
        labeled = component_labels(int_bidir)
    else:
        labeled = None
    if labeled is not None:
        labels = deg2.join(labeled, "node_id", "left") \
                     .select("node_id",
                             F.coalesce("label", "node_id").alias("label"))
    else:
        labels = deg2.select("node_id", F.col("node_id").alias("label"))
    # anchor edges: exactly one endpoint in a chain
    anch1 = e.where(F.col("d2") & ~F.col("s2")).select(
        F.col("src").alias("anchor"), F.col("dst").alias("cnode"),
        "length_m")
    anch2 = e.where(F.col("s2") & ~F.col("d2")).select(
        F.col("dst").alias("anchor"), F.col("src").alias("cnode"),
        "length_m")
    anchors = (anch1.unionByName(anch2)
               .join(labels.withColumnRenamed("node_id", "cnode"), "cnode")
               .select("anchor", "label", "length_m"))
    int_len = (interior
               .join(labels.withColumnRenamed("node_id", "src"), "src")
               .groupBy("label").agg(F.sum("length_m").alias("ilen")))
    chains = (anchors.groupBy("label")
              .agg(F.sum("length_m").alias("alen"),
                   F.count(F.lit(1)).alias("n_anchor"),
                   F.min("anchor").alias("a1"),
                   F.max("anchor").alias("a2"))
              .join(int_len, "label", "left")
              .withColumn("length_m",
                          F.col("alen") + F.coalesce("ilen", F.lit(0.0))))
    # n_anchor == 2 for a path chain; == 2 with a1 == a2 for a lollipop
    # loop (kept as a self-loop); chains with no anchor are pure cycles
    # (already excluded — they never join `anchors`)
    contracted = chains.select(F.col("a1").alias("src"),
                               F.col("a2").alias("dst"), "length_m")
    return passthrough.unionByName(contracted)


def prepare(verts: DataFrame) -> DataFrame:
    """subdivision + smoothing — the full ndvi_calc.R:146-147 prep."""
    return smooth(subdivide(verts))


def degree_summary(edges: DataFrame) -> DataFrame:
    """(node_id, degree, sum_len) of an undirected edge table — the
    structural fingerprint the gate compares (degrees and incident
    chain lengths pin subdivision + smoothing exactly)."""
    eb = bidirectional(edges)
    return eb.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("length_m").alias("sum_len"))
