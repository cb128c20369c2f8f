"""Z-order clustering (functions/zorder.py): bit-parity of the Morton
codes across python/Spark/DuckDB, and the payoff — an icetable AOI
query over a Z-clustered tile table plans strictly fewer files than
over a row-ordered one."""

from __future__ import annotations

import pyspark.sql.functions as F

from greenexp_r_spark.functions import zorder as Z
from greenexp_r_spark.sources import icetable

from .oracle_harness import compare


def test_morton_matches_python_reference():
    cases = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3),
             (0xFFFF, 0xFFFF), (12345, 54321)]
    for x, y in cases:
        z = Z.morton2_py(x, y)
        assert 0 <= z < (1 << 32)
    assert Z.morton2_py(1, 0) == 1
    assert Z.morton2_py(0, 1) == 2
    assert Z.morton2_py(3, 3) == 15
    assert Z.morton2_py(0xFFFF, 0xFFFF) == (1 << 32) - 1


def test_morton_matches_spark_and_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = docs.select(
        "doc_id",
        Z.morton2(F.col("doc_id") % 65536,
                  (F.col("doc_id") * 7) % 65536).alias("z"))
    compare(got, f"""
SELECT doc_id,
       {Z.morton2_sql('doc_id % 65536', '(doc_id * 7) % 65536')} AS z
FROM documents""", sf_dir)
    # spot-check the python reference against Spark
    rows = got.orderBy("doc_id").limit(50).collect()
    for r in rows:
        d = r["doc_id"]
        assert r["z"] == Z.morton2_py(d % 65536, (d * 7) % 65536)


def test_zorder_clustering_prunes_aoi_files(spark, tmp_path):
    """Same tile rows committed twice: row-order vs Z-order.  An AOI
    window read via z-range stats must plan fewer files on the
    clustered table and return the identical tile set."""
    from greenexp_r_spark.sources.tiles import ndvi_tiles_df
    # morton2 wants non-negative grid indices — bias the world-grid
    # coords (the world grid spans tx,ty >= -1)
    tiles = (ndvi_tiles_df(spark)
             .select("tile_id",
                     (F.col("tx") + 1).alias("tx"),
                     (F.col("ty") + 1).alias("ty")))
    n_files = 8
    plain = str(tmp_path / "plain")
    lin = str(tmp_path / "zord")
    icetable.commit(tiles.repartition(n_files), plain,
                    stat_cols=["tx", "ty"])
    icetable.commit(Z.zorder_cluster(tiles, "tx", "ty", n_files),
                    lin, stat_cols=["z", "tx", "ty"])
    # AOI = one quadrant corner of the grid
    xs = [r["tx"] for r in tiles.select("tx").collect()]
    ys = [r["ty"] for r in tiles.select("ty").collect()]
    x0, y0 = min(xs), min(ys)
    x1 = x0 + max(1, (max(xs) - x0) // 4)
    y1 = y0 + max(1, (max(ys) - y0) // 4)
    zlo = Z.morton2_py(x0, y0)
    zhi = Z.morton2_py(x1, y1)
    pruned = icetable.read(spark, lin, between=("z", zlo, zhi))
    full_files = icetable.metrics(lin)["n_files"]
    assert len(pruned.inputFiles()) < full_files
    aoi = (F.col("tx").between(x0, x1) & F.col("ty").between(y0, y1))
    got = sorted(r["tile_id"] for r in
                 pruned.where(aoi).select("tile_id").collect())
    want = sorted(r["tile_id"] for r in
                  tiles.where(aoi).select("tile_id").collect())
    assert got == want and len(want) > 0


def test_morton_properties_hypothesis():
    """Monotone in each coordinate and equal to the naive bit
    interleave — the property the AOI superset-window pruning
    relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def naive(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    c = st.integers(min_value=0, max_value=0xFFFF)

    @settings(max_examples=300, deadline=None)
    @given(x=c, y=c, dx=st.integers(0, 100), dy=st.integers(0, 100))
    def check(x, y, dx, dy):
        assert Z.morton2_py(x, y) == naive(x, y)
        x2 = min(x + dx, 0xFFFF)
        y2 = min(y + dy, 0xFFFF)
        assert Z.morton2_py(x2, y) >= Z.morton2_py(x, y)
        assert Z.morton2_py(x, y2) >= Z.morton2_py(x, y)
        assert Z.morton2_py(x2, y2) >= Z.morton2_py(x, y)

    check()


def test_z_ranges_cover_exactly_and_beat_corner_window():
    import random
    rnd = random.Random(7)
    for _ in range(40):
        x0 = rnd.randint(0, 200); y0 = rnd.randint(0, 200)
        x1 = x0 + rnd.randint(0, 40); y1 = y0 + rnd.randint(0, 40)
        rs = Z.z_ranges(x0, y0, x1, y1)
        zs = {Z.morton2_py(x, y) for x in range(x0, x1 + 1)
              for y in range(y0, y1 + 1)}
        assert all(any(lo <= z <= hi for lo, hi in rs) for z in zs)
        assert all(a[1] < b[0] for a, b in zip(rs, rs[1:]))
        corner = Z.morton2_py(x1, y1) - Z.morton2_py(x0, y0) + 1
        assert sum(hi - lo + 1 for lo, hi in rs) <= corner


def test_z_ranges_union_read_equals_direct_aoi(spark, tmp_path):
    from greenexp_r_spark.sources import icetable
    from functools import reduce
    rows = [(x * 100 + y, x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "tile_id long, tx int, ty int")
    t = str(tmp_path / "ztbl")
    icetable.commit(Z.zorder_cluster(df, "tx", "ty", 16), t,
                    stat_cols=["z"])
    x0, y0, x1, y1 = 5, 17, 12, 30
    parts = [icetable.read(spark, t, between=("z", lo, hi))
             for lo, hi in Z.z_ranges(x0, y0, x1, y1)]
    aoi = (F.col("tx").between(x0, x1) & F.col("ty").between(y0, y1))
    got = sorted(r["tile_id"] for r in
                 reduce(lambda a, b: a.unionByName(b), parts)
                 .where(aoi).distinct().collect())
    want = sorted(r["tile_id"] for r in df.where(aoi).collect())
    assert got == want and len(want) == 8 * 14
