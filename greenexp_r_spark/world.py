"""The deterministic synthetic geo-world, in two renderings.

1. **Shared-SQL CTE fragments** (``points_sql``, ``parks_sql``, ...) —
   rendered per Dialect; these are the *specification* and the DuckDB
   oracle source.  All integer arithmetic → bit-identical across engines.
2. **Spark DataFrame builders** (``points_df``, ``parks_df``, ...) —
   the engine-side tables used by operators; same formulas expressed
   with pyspark.sql.functions so Catalyst sees them natively.

Reference analogs: Ams_Houses / Ams_Parks / network_file
(GreenExp_R R/data.R:1-77); virtual rasters replace the STAC/terra
acquisition path (ndvi_calc.R:277-318, land_cover.R:273-347).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import constants as C
from .dialect import Dialect

# =========================================================================
# Shared-SQL fragments
# =========================================================================


def x_expr(doc: str = "doc_id") -> str:
    return (f"CAST((({doc} * {C.X_MUL} + {C.X_ADD}) % {C.P31})"
            f" % {C.WORLD_SIZE} AS DOUBLE)")


def y_expr(doc: str = "doc_id") -> str:
    return (f"CAST((({doc} * {C.Y_MUL} + {C.Y_ADD}) % {C.P31})"
            f" % {C.WORLD_SIZE} AS DOUBLE)")


def points_sql(d: Dialect) -> str:
    """Geocoded address points from the driver's ``documents`` table.

    This is the input_hint pages table: urls geocode deterministically
    to (x, y); ``text`` rides along byte-identical (invariant P20).
    """
    return f"""
    SELECT doc_id AS point_id,
           'https://site' || CAST(doc_id % 1000 AS STRING)
               || '.example/page/' || CAST(doc_id AS STRING) AS url,
           {x_expr()} AS x,
           {y_expr()} AS y,
           text, lang
    FROM documents
    """


def parks_sql(d: Dialect) -> str:
    """Synthetic greenspace layer: 60 disc parks, 70% clustered in 3
    urban hotspots (join-skew fixture), some below the 400 m² WHO
    minimum (accessibility.R:211-214)."""
    hot_x = (f"CASE park_id % 3 WHEN 0 THEN {C.PARK_HOT_X[0]} "
             f"WHEN 1 THEN {C.PARK_HOT_X[1]} ELSE {C.PARK_HOT_X[2]} END")
    hot_y = (f"CASE park_id % 3 WHEN 0 THEN {C.PARK_HOT_Y[0]} "
             f"WHEN 1 THEN {C.PARK_HOT_Y[1]} ELSE {C.PARK_HOT_Y[2]} END")
    tag_key = "CASE " + " ".join(
        f"WHEN park_id % 10 = {i} THEN '{k}'" for i, (k, _) in enumerate(C.OSM_TAGS)
    ) + " END"
    tag_val = "CASE " + " ".join(
        f"WHEN park_id % 10 = {i} THEN '{v}'" for i, (_, v) in enumerate(C.OSM_TAGS)
    ) + " END"
    return f"""
    SELECT park_id,
           'park_' || CAST(park_id AS STRING) AS name,
           {tag_key} AS tag_key,
           {tag_val} AS tag_value,
           CAST(CASE WHEN park_id % {C.PARK_HOT_FRACTION_MOD} < 7
                THEN ({hot_x}) + ((park_id * {C.PARK_CX_MUL} + {C.PARK_CX_ADD})
                                  % {C.PARK_SPREAD}) - 1200
                ELSE ((park_id * {C.PARK_FAR_MUL} + {C.PARK_FAR_ADD})
                      % 19000) + 500 END AS DOUBLE) AS cx,
           CAST(CASE WHEN park_id % {C.PARK_HOT_FRACTION_MOD} < 7
                THEN ({hot_y}) + ((park_id * {C.PARK_CY_MUL} + {C.PARK_CY_ADD})
                                  % {C.PARK_SPREAD}) - 1200
                ELSE ((park_id * {C.PARK_FARY_MUL} + {C.PARK_FARY_ADD})
                      % 19000) + 500 END AS DOUBLE) AS cy,
           CAST(CASE WHEN park_id % {C.PARK_SMALL_MOD} = 0 THEN 8
                ELSE 40 + ((park_id * {C.PARK_R_MUL}) % {C.PARK_R_MOD})
                END AS DOUBLE) AS radius,
           pi() * CAST(CASE WHEN park_id % {C.PARK_SMALL_MOD} = 0 THEN 8
                ELSE 40 + ((park_id * {C.PARK_R_MUL}) % {C.PARK_R_MOD})
                END AS DOUBLE)
                * CAST(CASE WHEN park_id % {C.PARK_SMALL_MOD} = 0 THEN 8
                ELSE 40 + ((park_id * {C.PARK_R_MUL}) % {C.PARK_R_MOD})
                END AS DOUBLE) AS area_m2
    FROM {d.range_select(0, C.N_PARKS - 1, "park_id")}
    """


def trees_sql(d: Dialect) -> str:
    """Canopy tree points with canopy radius (canopy_coverage.R:283-291)."""
    return f"""
    SELECT tree_id,
           CAST(((tree_id * {C.TREE_X_MUL} + {C.TREE_X_ADD}) % {C.P31})
                % {C.WORLD_SIZE} AS DOUBLE) AS x,
           CAST(((tree_id * {C.TREE_Y_MUL} + {C.TREE_Y_ADD}) % {C.P31})
                % {C.WORLD_SIZE} AS DOUBLE) AS y,
           CAST({C.TREE_R_BASE_X10} + ((tree_id * 7 + 3) % {C.TREE_R_MOD})
                AS DOUBLE) / 10.0 AS canopy_radius_m
    FROM {d.range_select(0, C.N_TREES - 1, "tree_id")}
    """


def _pmod(e: str, m: int) -> str:
    """Positive modulus — identical text in both engines; safe for the
    negative cell indices that appear when buffers cross x=0 / y=0."""
    return f"((({e}) % {m} + {m}) % {m})"


def cell_hash_expr(ci: str, cj: str, a: int, b: int) -> str:
    return _pmod(f"({ci}) * {a} + ({cj}) * {b}", C.P31)


def ndvi_int_expr(ci: str, cj: str) -> str:
    """Integer NDVI*800+? — actually the raw integer v such that
    ndvi = v / 800.  Integer so cross-engine aggregation is EXACT
    (sums of doubles depend on addition order; sums of BIGINTs don't).
    ~1% of cells are NA → 0, matching ndvi_calc.R:336's NA→0 fold."""
    h = cell_hash_expr(ci, cj, C.NDVI_H_A, C.NDVI_H_B)
    return (f"CASE WHEN {h} % {C.NDVI_NA_MOD} = 0 THEN 0 "
            f"ELSE ({h} % {C.NDVI_MOD}) - 200 END")


def ndvi_expr(ci: str, cj: str, na_as_null: bool = False) -> str:
    """NDVI value of raster cell (ci, cj) in [-0.25, 1.0)."""
    h = cell_hash_expr(ci, cj, C.NDVI_H_A, C.NDVI_H_B)
    na = "CAST(NULL AS DOUBLE)" if na_as_null else "CAST(0.0 AS DOUBLE)"
    return (f"CASE WHEN {h} % {C.NDVI_NA_MOD} = 0 THEN {na} "
            f"ELSE CAST(({h} % {C.NDVI_MOD}) - 200 AS DOUBLE) / 800.0 END")


def band_expr(ci: str, cj: str, a: int, b: int, mod: int) -> str:
    """Positive integer band reflectance of raster cell (ci, cj) —
    the closed form of sources/tiles.band_tile_values (red/NIR bands
    for the ndvi_calc.R:315-318 band-math workflow)."""
    return f"(1 + {cell_hash_expr(ci, cj, a, b)} % {mod})"


def landcover_expr(ci: str, cj: str) -> str:
    """ESA-WorldCover-style class code of cell (ci, cj) — dialect-free
    CASE chain (P18's code→label map is applied on top)."""
    h = cell_hash_expr(ci, cj, C.LC_H_A, C.LC_H_B)
    arms = " ".join(f"WHEN {i} THEN {c}" for i, c in enumerate(C.LC_CODES))
    return f"CASE ({h} % {len(C.LC_CODES)}) {arms} END"


def road_edges_sql(d: Dialect) -> str:
    """Undirected lattice road network, 201×201 nodes / 100 m spacing,
    ~6% of edges hash-deleted (detours + disconnected islands).
    node_id = j * 201 + i.  Stored one direction; expand at use."""
    n, last = C.ROAD_N, C.ROAD_N - 1
    del_pred = (f"((eid * {C.ROAD_DEL_MUL} + {C.ROAD_DEL_ADD}) % {C.P31})"
                f" % {C.ROAD_DEL_MOD} <> 0")
    return f"""
    SELECT eid AS edge_id, src, dst,
           CAST({C.ROAD_SPACING} AS DOUBLE) AS length_m
    FROM (
        SELECT (j * {last} + i) AS eid,
               (j * {n} + i) AS src, (j * {n} + i + 1) AS dst
        FROM {d.range_select(0, last - 1, "i")}
        CROSS JOIN {d.range_select(0, last, "j")}
        UNION ALL
        SELECT ({n * last} + i * {last} + j) AS eid,
               (j * {n} + i) AS src, ((j + 1) * {n} + i) AS dst
        FROM {d.range_select(0, last, "i")}
        CROSS JOIN {d.range_select(0, last - 1, "j")}
    ) e
    WHERE {del_pred}
    """


def road_edges_weighted_sql(d: Dialect) -> str:
    """The same lattice with heterogeneous edge lengths 80..140 m —
    the reference's true Dijkstra surface (`weight = edge_length()`,
    accessibility.R:343-356, ndvi_calc.R:175-176), which the uniform
    lattice can't distinguish from BFS."""
    base = road_edges_sql(d)
    w = (f"CAST({C.WEDGE_BASE} + ((CAST(edge_id AS BIGINT) * {C.WEDGE_MUL}"
         f" + {C.WEDGE_ADD}) % {C.P31}) % {C.WEDGE_SPAN} AS DOUBLE)")
    return f"""
    SELECT edge_id, src, dst, {w} AS length_m
    FROM ({base}) _re
    """


def park_entrance_nodes_sql(d: Dialect) -> str:
    """Pseudo-entrance nodes (accessibility.R:223-247): network nodes
    inside the dissolved 20 m buffer of the (≥400 m²) greenspace —
    i.e. lattice nodes within (radius + 20) of a park center; the
    dissolve (st_union) is the DISTINCT over parks.  Small parks whose
    buffer contains no node contribute none, as in the reference."""
    r = f"(radius + {C.ENTRANCE_BUFFER_M})"
    last = C.ROAD_N - 1
    lo = lambda c: (f"LEAST(GREATEST({d.floori(f'({c} - {r} + 99) / 100')},"
                    f" 0), {last})")
    hi = lambda c: (f"LEAST(GREATEST({d.floori(f'({c} + {r}) / 100')},"
                    f" 0), {last})")
    src = (f"SELECT cx, cy, radius FROM parks"
           f" WHERE area_m2 > {C.MIN_GREENSPACE_M2}")
    e1 = d.explode_range(src, "ni", lo("cx"), hi("cx"))
    e2 = d.explode_range(e1, "nj", lo("cy"), hi("cy"))
    return f"""
    SELECT DISTINCT nj * {C.ROAD_N} + ni AS entrance_node
    FROM ({e2}) _en
    WHERE (ni * 100 - cx) * (ni * 100 - cx)
        + (nj * 100 - cy) * (nj * 100 - cy) <= {r} * {r}
    """


def park_entrances_sql(d: Dialect) -> str:
    """Park pseudo-entrance nodes: each ≥400 m² park snaps its centroid
    to the nearest lattice node (accessibility.R:223-247 analog)."""
    last = C.ROAD_N - 1
    snap_i = f"LEAST(GREATEST({d.floori(f'(cx + 50) / 100')}, 0), {last})"
    snap_j = f"LEAST(GREATEST({d.floori(f'(cy + 50) / 100')}, 0), {last})"
    return f"""
    SELECT park_id, ({snap_j}) * {C.ROAD_N} + ({snap_i}) AS entrance_node
    FROM parks
    WHERE area_m2 > {C.MIN_GREENSPACE_M2}
    """


def world_ctes(d: Dialect, *names: str) -> str:
    """Compose a WITH clause holding the requested world tables."""
    frags = {
        "points": points_sql, "parks": parks_sql, "trees": trees_sql,
        "road_edges": road_edges_sql, "park_entrances": park_entrances_sql,
        "road_edges_weighted": road_edges_weighted_sql,
        "park_entrance_nodes": park_entrance_nodes_sql,
    }
    parts = [f"{n} AS ({frags[n](d)})" for n in names]
    return "WITH " + ",\n".join(parts)


# =========================================================================
# Spark DataFrame builders (engine side)
# =========================================================================


def _hash_col(key, mul: int, add: int, mod: int):
    return ((key * F.lit(mul) + F.lit(add)) % F.lit(C.P31)) % F.lit(mod)


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages/address-point table from the driver's documents parquet."""
    from .plans.widen import widen
    doc = widen(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    did = F.col("doc_id")
    return doc.select(
        did.alias("point_id"),
        F.concat(F.lit("https://site"), (did % 1000).cast("string"),
                 F.lit(".example/page/"), did.cast("string")).alias("url"),
        _hash_col(did, C.X_MUL, C.X_ADD, C.WORLD_SIZE).cast("double").alias("x"),
        _hash_col(did, C.Y_MUL, C.Y_ADD, C.WORLD_SIZE).cast("double").alias("y"),
        F.col("text"), F.col("lang"),
    )


def synthetic_points(spark: SparkSession, n: int,
                     partitions: int | None = None) -> DataFrame:
    """Scale-testing points table: same geocoding formulas applied to
    spark.range ids — lets the bench grow the points side arbitrarily
    without external data (BASELINE.md scaling protocol)."""
    rng = spark.range(0, n, 1, partitions) if partitions \
        else spark.range(n)
    did = F.col("id")
    return rng.select(
        did.alias("point_id"),
        _hash_col(did, C.X_MUL, C.X_ADD, C.WORLD_SIZE).cast("double").alias("x"),
        _hash_col(did, C.Y_MUL, C.Y_ADD, C.WORLD_SIZE).cast("double").alias("y"),
    )


def parks_df(spark: SparkSession) -> DataFrame:
    return spark.sql(parks_sql(_spark_dialect()))


def trees_df(spark: SparkSession) -> DataFrame:
    return spark.sql(trees_sql(_spark_dialect()))


def road_edges_df(spark: SparkSession) -> DataFrame:
    return spark.sql(road_edges_sql(_spark_dialect()))


def park_entrances_df(spark: SparkSession) -> DataFrame:
    d = _spark_dialect()
    return spark.sql(
        world_ctes(d, "parks") + "\n" + park_entrances_sql(d))


def road_edges_weighted_df(spark: SparkSession) -> DataFrame:
    return spark.sql(road_edges_weighted_sql(_spark_dialect()))


def park_entrance_nodes_df(spark: SparkSession) -> DataFrame:
    d = _spark_dialect()
    return spark.sql(
        world_ctes(d, "parks") + "\n" + park_entrance_nodes_sql(d))


def with_cell_id(df: DataFrame, x: str = "x", y: str = "y",
                 cell: int = C.CELL_SIZE) -> DataFrame:
    """Attach the spatial bucketing key (H3-equivalent integer grid,
    SURVEY.md §4.3).  cell_id = floor(x/cell)*65536 + floor(y/cell)."""
    return df.withColumn(
        "cell_id",
        (F.floor(F.col(x) / cell) * C.CELL_SHIFT + F.floor(F.col(y) / cell)))


def _spark_dialect():
    from .dialect import SPARK
    return SPARK
