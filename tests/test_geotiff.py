"""GeoTIFF codec + distributed ingest: round-trip and zonal equality
with the virtual-raster path (S3 fed by real files, not only
synthesized tiles)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_TEST

from greenexp_r_spark import world
from greenexp_r_spark.sources import geotiff as GT
from greenexp_r_spark.sources.tiles import TILE_CELLS, ndvi_tile_values


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(tmp_path, compress):
    rng = np.random.RandomState(3)
    a = rng.randint(-500, 500, (64, 96)).astype(np.int32)
    p = str(tmp_path / "t.tif")
    GT.write_geotiff(p, a, xmin=1280.0, ymax=2560.0, res=10.0,
                     compress=compress)
    vals, xmin, ymax, res = GT.parse_geotiff(open(p, "rb").read())
    assert (vals == a).all()
    assert (xmin, ymax, res) == (1280.0, 2560.0, 10.0)


def _world_geotiffs(tmp_path, txs, tys, res=10):
    """Export synthetic NDVI tiles as one GeoTIFF per tile (north-up)."""
    span = TILE_CELLS * res
    for tx in txs:
        for ty in tys:
            v = ndvi_tile_values(tx, ty, res).reshape(TILE_CELLS,
                                                      TILE_CELLS)
            north_up = v[::-1].astype(np.int32)   # tiles store south-up
            GT.write_geotiff(str(tmp_path / f"t_{tx}_{ty}.tif"),
                             north_up, xmin=tx * span,
                             ymax=(ty + 1) * span, res=float(res),
                             compress=(tx + ty) % 2 == 0)


def test_ingest_zonal_equals_virtual(spark, tmp_path):
    """GeoTIFF files → ingest → tile-join zonal ≡ virtual-raster zonal
    for points whose buffers the files fully cover."""
    from greenexp_r_spark.operators.availability import ndvi_zonal
    from greenexp_r_spark.operators.zonal_tiles import ndvi_zonal_tiles

    _world_geotiffs(tmp_path, range(0, 9), range(0, 9))
    tiles = GT.ingest_geotiff_tiles(spark, str(tmp_path) + "/*.tif")
    pts = world.points_df(spark, SF_TEST).where(
        "x > 400 and x < 19600 and y > 400 and y < 19600").limit(60)
    got = ndvi_zonal_tiles(pts, tiles).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    want = ndvi_zonal(pts).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert got.equals(want)


def test_tiles_from_array_rejects_misaligned():
    a = np.zeros((TILE_CELLS, TILE_CELLS), dtype=np.int32)
    with pytest.raises(ValueError):
        list(GT.tiles_from_array(a, xmin=13.0, ymax=2560.0, res=10.0))


# --------------------------- tiled (COG-layout) + LZW (round 4)

@pytest.mark.parametrize("compress", [False, "deflate", "lzw"])
@pytest.mark.parametrize("shape", [(64, 96), (80, 100), (16, 16)])
def test_tiled_roundtrip(tmp_path, compress, shape):
    """Tiled layout with zero-padded edge tiles, all three codecs;
    (80, 100) exercises partial edge tiles (tile 32 ∤ extent)."""
    rng = np.random.RandomState(5)
    a = rng.randint(-500, 500, shape).astype(np.int32)
    p = str(tmp_path / "t.tif")
    GT.write_geotiff(p, a, xmin=0.0, ymax=float(shape[0] * 10), res=10.0,
                     compress=compress, tiled=32)
    vals, xmin, ymax, res = GT.parse_geotiff(open(p, "rb").read())
    assert (vals == a).all() and vals.dtype == np.int32
    assert (xmin, ymax, res) == (0.0, float(shape[0] * 10), 10.0)


def test_tiled_float64_roundtrip(tmp_path):
    rng = np.random.RandomState(6)
    a = rng.randn(48, 64)
    p = str(tmp_path / "f.tif")
    GT.write_geotiff(p, a, xmin=0.0, ymax=480.0, res=10.0,
                     compress="lzw", tiled=16)
    vals, *_ = GT.parse_geotiff(open(p, "rb").read())
    assert (vals == a).all() and vals.dtype == np.float64


def test_tiled_file_structure_is_cog_shaped(tmp_path):
    """The tiled writer must emit real TileWidth/TileLength/TileOffsets
    tags (not strips) so external COG readers see a tiled TIFF."""
    import struct
    a = np.arange(64 * 64, dtype=np.int32).reshape(64, 64)
    p = str(tmp_path / "t.tif")
    GT.write_geotiff(p, a, xmin=0.0, ymax=640.0, res=10.0, tiled=32)
    buf = open(p, "rb").read()
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {struct.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i)[0]:
            struct.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i)
            for i in range(n)}
    assert GT._TAG_TILE_WIDTH in tags and GT._TAG_TILE_OFFSETS in tags
    assert GT._TAG_STRIP_OFFSETS not in tags
    assert tags[GT._TAG_TILE_OFFSETS][2] == 4      # 2×2 tiles
    assert tags[GT._TAG_TILE_WIDTH][3] == 32


def test_lzw_vectors_and_width_boundaries():
    """LZW roundtrip across code-width bumps (9→10→11→12 bits) and the
    4094-entry Clear reset; plus degenerate inputs."""
    for data in (b"", b"\x00", b"TOBEORNOTTOBEORTOBEORNOT" * 3,
                 bytes(range(256)) * 40,            # forces width bumps
                 np.random.RandomState(0).randint(
                     0, 256, 200_000).astype(np.uint8).tobytes(),
                 b"\x00" * 100_000):                # deep dictionary
        assert GT._lzw_decode(GT._lzw_encode(data)) == data


def test_lzw_first_code_after_clear():
    """The TIFF6 stream must start with ClearCode at 9 bits."""
    enc = GT._lzw_encode(b"A")
    first = int.from_bytes(enc[:2], "big") >> 7
    assert first == GT._LZW_CLEAR


def test_ingest_tiled_lzw_zonal_equals_virtual(spark, tmp_path):
    """The r03 'Done' criterion: ingest over TILED (+LZW/deflate)
    fixture files, ingested-zonal ≡ virtual still exact."""
    from greenexp_r_spark.operators.availability import ndvi_zonal
    from greenexp_r_spark.operators.zonal_tiles import ndvi_zonal_tiles
    from greenexp_r_spark.sources.tiles import TILE_CELLS, ndvi_tile_values

    res, span = 10, TILE_CELLS * 10
    codecs = ["lzw", "deflate", False]
    for k, (tx, ty) in enumerate([(tx, ty) for tx in range(0, 9)
                                  for ty in range(0, 9)]):
        v = ndvi_tile_values(tx, ty, res).reshape(TILE_CELLS, TILE_CELLS)
        GT.write_geotiff(str(tmp_path / f"t_{tx}_{ty}.tif"),
                         v[::-1].astype(np.int32), xmin=tx * span,
                         ymax=(ty + 1) * span, res=float(res),
                         compress=codecs[k % 3], tiled=32)
    tiles = GT.ingest_geotiff_tiles(spark, str(tmp_path) + "/*.tif")
    pts = world.points_df(spark, SF_TEST).where(
        "x > 400 and x < 19600 and y > 400 and y < 19600").limit(40)
    got = ndvi_zonal_tiles(pts, tiles).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    want = ndvi_zonal(pts).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert got.equals(want)


@pytest.mark.parametrize("tiled", [None, 32])
@pytest.mark.parametrize("compress", ["lzw", "deflate"])
def test_predictor2_roundtrip(tmp_path, tiled, compress):
    """Predictor=2 (horizontal differencing) — the GDAL default for
    integer COGs — across striped/tiled layouts and both codecs; the
    smoother residual stream must also genuinely shrink the file."""
    import os
    rng = np.random.RandomState(9)
    # smooth field (differencing pays off) + noise
    gx, gy = np.meshgrid(np.arange(96), np.arange(64))
    a = (gx * 7 + gy * 3 + rng.randint(0, 3, (64, 96))).astype(np.int32)
    p1 = str(tmp_path / "p1.tif")
    p2 = str(tmp_path / "p2.tif")
    GT.write_geotiff(p1, a, 0.0, 640.0, 10.0, compress=compress,
                     tiled=tiled, predictor=1)
    GT.write_geotiff(p2, a, 0.0, 640.0, 10.0, compress=compress,
                     tiled=tiled, predictor=2)
    v1, *_ = GT.parse_geotiff(open(p1, "rb").read())
    v2, *_ = GT.parse_geotiff(open(p2, "rb").read())
    assert (v1 == a).all() and (v2 == a).all()
    assert os.path.getsize(p2) < os.path.getsize(p1)


def test_predictor2_rejects_float(tmp_path):
    with pytest.raises(ValueError, match="integer"):
        GT.write_geotiff(str(tmp_path / "f.tif"), np.zeros((16, 16)),
                         0.0, 160.0, 10.0, compress="lzw", predictor=2)


# --------------------------- multi-band (planar config 2, round 4)

@pytest.mark.parametrize("tiled,compress,predictor",
                         [(None, False, 1), (32, "lzw", 2),
                          (None, "deflate", 2), (16, False, 1)])
def test_multiband_roundtrip(tmp_path, tiled, compress, predictor):
    rng = np.random.RandomState(11)
    red = rng.randint(0, 4000, (64, 96)).astype(np.int32)
    nir = rng.randint(0, 4000, (64, 96)).astype(np.int32)
    p = str(tmp_path / "m.tif")
    GT.write_geotiff_multi(p, [red, nir], 0.0, 640.0, 10.0,
                           compress=compress, tiled=tiled,
                           predictor=predictor)
    bands, xmin, ymax, res = GT.parse_geotiff_bands(open(p, "rb").read())
    assert len(bands) == 2
    assert (bands[0] == red).all() and (bands[1] == nir).all()
    assert (xmin, ymax, res) == (0.0, 640.0, 10.0)
    # single-band reader refuses the 2-band file with a clear error
    with pytest.raises(ValueError, match="band"):
        GT.parse_geotiff(open(p, "rb").read())


def test_multiband_rejects_mixed_shapes(tmp_path):
    with pytest.raises(ValueError, match="share"):
        GT.write_geotiff_multi(str(tmp_path / "x.tif"),
                               [np.zeros((16, 16), dtype=np.int32),
                                np.zeros((16, 32), dtype=np.int32)],
                               0.0, 160.0, 10.0)


def test_ingest_two_band_zonal_equals_virtual(spark, tmp_path):
    """Two-band GeoTIFF files → ingest → band-zonal NDVI ≡ the virtual
    s2 tile table (the reference's Sentinel-2 red+NIR workflow over
    real files)."""
    from greenexp_r_spark.operators.zonal_tiles import ndvi_bands_zonal_tiles
    from greenexp_r_spark.sources.tiles import (TILE_CELLS,
                                                band_tile_values,
                                                s2_tiles_df)

    res, span = 10, TILE_CELLS * 10
    codecs = [("lzw", 2, 32), ("deflate", 1, None), (False, 1, 16)]
    for k, (tx, ty) in enumerate([(tx, ty) for tx in range(0, 9)
                                  for ty in range(0, 9)]):
        red, nir = band_tile_values(tx, ty)
        shape = (TILE_CELLS, TILE_CELLS)
        compress, pred, tiled = codecs[k % 3]
        GT.write_geotiff_multi(
            str(tmp_path / f"s2_{tx}_{ty}.tif"),
            [red.reshape(shape)[::-1].astype(np.int32),
             nir.reshape(shape)[::-1].astype(np.int32)],
            xmin=tx * span, ymax=(ty + 1) * span, res=float(res),
            compress=compress, predictor=pred, tiled=tiled)
    tiles = GT.ingest_geotiff_s2_tiles(spark, str(tmp_path) + "/*.tif")
    pts = world.points_df(spark, SF_TEST).where(
        "x > 400 and x < 19600 and y > 400 and y < 19600").limit(40)
    got = ndvi_bands_zonal_tiles(pts, tiles).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    want = ndvi_bands_zonal_tiles(pts, s2_tiles_df(spark)).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert got.equals(want)


# --------------------------------- BigTIFF (8-byte offsets, round 4)

@pytest.mark.parametrize("tiled,compress,predictor,bands",
                         [(None, False, 1, 1), (32, "lzw", 2, 1),
                          (None, "deflate", 1, 2), (16, False, 1, 2)])
def test_bigtiff_roundtrip(tmp_path, tiled, compress, predictor, bands):
    rng = np.random.RandomState(13)
    arrs = [rng.randint(-500, 500, (64, 96)).astype(np.int32)
            for _ in range(bands)]
    p = str(tmp_path / "b.tif")
    GT.write_geotiff_multi(p, arrs, 0.0, 640.0, 10.0,
                           compress=compress, tiled=tiled,
                           predictor=predictor, bigtiff=True)
    buf = open(p, "rb").read()
    assert buf[:4] == b"II\x2b\x00"            # magic 43
    got, xmin, ymax, res = GT.parse_geotiff_bands(buf)
    assert len(got) == bands
    for a, b in zip(arrs, got):
        assert (a == b).all()
    assert (xmin, ymax, res) == (0.0, 640.0, 10.0)


def test_classic_writer_refuses_past_4gb(tmp_path, monkeypatch):
    """The classic container must fail loudly (not wrap offsets) when
    data would exceed 4 GB — without actually writing 4 GB: compress
    is identity-patched and the chunk list is simulated via a tiny
    raster with a huge fake chunk."""
    # cheapest honest check: the guard triggers on the computed size
    import numpy as np
    big = np.zeros((32, 32), dtype=np.int32)   # 4 tiles → multi-chunk
    # monkeypatch _compress to return a fake huge-but-cheap bytes-like
    class FakeBytes(bytes):
        def __len__(self):
            return 3 * 1024**3
    monkeypatch.setattr(GT, "_compress",
                        lambda raw, comp: FakeBytes(b""))
    with pytest.raises(ValueError, match="bigtiff=True"):
        GT.write_geotiff(str(tmp_path / "x.tif"), big, 0.0, 160.0,
                         10.0, tiled=16)


@pytest.mark.slow
def test_bigtiff_real_4gb_roundtrip(tmp_path):
    """A genuine >4 GB BigTIFF: 34816×34816 int32 (~4.85 GB payload)
    tiled uncompressed — offsets past 2^32 must survive the write →
    parse roundtrip (spot-checked tiles + geo metadata)."""
    n = 34816                                   # 2176 tiles of 512²
    p = str(tmp_path / "huge.tif")
    gx = np.arange(n, dtype=np.int32)
    # low-memory construction: row-index outer sum pattern
    a = gx[:, None] + gx[None, :] * np.int32(3)
    GT.write_geotiff(p, a, 0.0, float(n) * 10, 10.0, tiled=512,
                     bigtiff=True)
    import os
    assert os.path.getsize(p) > 4 * 1024**3
    vals, xmin, ymax, res = GT.parse_geotiff(open(p, "rb").read())
    assert vals.shape == (n, n)
    rng = np.random.RandomState(0)
    ii = rng.randint(0, n, 200)
    jj = rng.randint(0, n, 200)
    assert (vals[ii, jj] == ii.astype(np.int32)
            + jj.astype(np.int32) * 3).all()
    assert (xmin, ymax, res) == (0.0, float(n) * 10, 10.0)


# ------------------- >=3 bands (ADVICE r04: spilled SHORT arrays)

@pytest.mark.parametrize("bigtiff,bands",
                         [(False, 3), (False, 4), (True, 5), (True, 6)])
def test_many_band_roundtrip(tmp_path, bigtiff, bands):
    """>=3-band classic (>=5-band BigTIFF) spills the per-band
    BitsPerSample/SampleFormat SHORT arrays to the extras block; the
    r4 writer computed chunk offsets BEFORE the spill, so every data
    offset pointed into the spilled arrays and the file decoded to
    garbage with no error.  Regression: exact roundtrip per band."""
    rng = np.random.RandomState(17)
    arrs = [rng.randint(-900, 900, (48, 80)).astype(np.int32)
            for _ in range(bands)]
    p = str(tmp_path / "many.tif")
    GT.write_geotiff_multi(p, arrs, 0.0, 480.0, 10.0, compress="lzw",
                           tiled=16, bigtiff=bigtiff)
    got, xmin, ymax, res = GT.parse_geotiff_bands(open(p, "rb").read())
    assert len(got) == bands
    for a, b in zip(arrs, got):
        assert (a == b).all()
    assert (xmin, ymax, res) == (0.0, 480.0, 10.0)


# ------------------- real-world sample formats (VERDICT r04 ask #3)

@pytest.mark.parametrize("dtype,lo,hi", [
    (np.uint8, 0, 256),          # ESA WorldCover classes
    (np.uint16, 0, 65536),       # Sentinel-2 L2A reflectance
    (np.int16, -32768, 32768),   # signed DEMs
])
@pytest.mark.parametrize("tiled,compress,predictor",
                         [(None, False, 1), (32, "lzw", 2),
                          (None, "deflate", 2)])
def test_narrow_dtype_roundtrip(tmp_path, dtype, lo, hi, tiled,
                                compress, predictor):
    rng = np.random.RandomState(19)
    a = rng.randint(lo, hi, (64, 96)).astype(dtype)
    p = str(tmp_path / "narrow.tif")
    GT.write_geotiff(p, a, 0.0, 640.0, 10.0, compress=compress,
                     tiled=tiled, predictor=predictor)
    got, xmin, ymax, res = GT.parse_geotiff(open(p, "rb").read())
    assert got.dtype == dtype
    assert (got == a).all()
    assert (xmin, ymax, res) == (0.0, 640.0, 10.0)


def test_float32_roundtrip(tmp_path):
    rng = np.random.RandomState(23)
    a = rng.uniform(-1, 1, (32, 48)).astype(np.float32)
    p = str(tmp_path / "f32.tif")
    GT.write_geotiff(p, a, 0.0, 320.0, 10.0, compress="deflate")
    got, _, _, _ = GT.parse_geotiff(open(p, "rb").read())
    assert got.dtype == np.float32 and (got == a).all()


def test_uint16_predictor2_wraparound(tmp_path):
    """Predictor-2 differences wrap modulo 2^16 for uint16 (TIFF6
    §14); values spanning the full range must survive."""
    a = np.array([[0, 65535, 1, 65534], [40000, 10, 60000, 5]],
                 dtype=np.uint16).repeat(8, 0).repeat(4, 1)
    p = str(tmp_path / "wrap.tif")
    GT.write_geotiff(p, a, 0.0, 160.0, 10.0, compress="lzw",
                     predictor=2)
    got, _, _, _ = GT.parse_geotiff(open(p, "rb").read())
    assert got.dtype == np.uint16 and (got == a).all()


def test_truncated_lzw_raises():
    enc = GT._lzw_encode(bytes(range(256)) * 8)
    with pytest.raises(ValueError, match="truncated LZW"):
        GT._lzw_decode(enc[:len(enc) // 2])


# ------------------- ingest alignment (VERDICT r04 ask #5)

def test_align_to_grid_res_multiple_offset_is_exact():
    """Origin offset by a whole number of cells: the overlap region
    must be copied bit-for-bit, outside cells take fill."""
    rng = np.random.RandomState(29)
    span = TILE_CELLS * 10.0
    a = rng.randint(0, 255, (2 * TILE_CELLS, 2 * TILE_CELLS)) \
        .astype(np.int32)
    # shift origin by +3 cells east, +2 cells south (off-grid)
    xmin, ymax = 3 * 10.0, 2 * span - 2 * 10.0
    out, nx0, ny1, res = GT.align_to_grid(a, xmin, ymax, 10.0,
                                          fill=-1)
    assert nx0 % span == 0 and ny1 % span == 0 and res == 10.0
    # recompute the overlap: output cell (r,c) center vs source
    nrow, ncol = out.shape
    assert nrow % TILE_CELLS == 0 and ncol % TILE_CELLS == 0
    for r in (0, nrow // 2, nrow - 1):
        for c in (0, ncol // 2, ncol - 1):
            gx = nx0 + (c + 0.5) * res
            gy = ny1 - (r + 0.5) * res
            ci = int(np.floor((gx - xmin) / 10.0))
            rj = int(np.floor((ymax - gy) / 10.0))
            want = a[rj, ci] if 0 <= ci < a.shape[1] \
                and 0 <= rj < a.shape[0] else -1
            assert out[r, c] == want


def test_align_block_mean_downsamples():
    a = np.arange(4 * TILE_CELLS * 4 * TILE_CELLS, dtype=np.int32) \
        .reshape(4 * TILE_CELLS, 4 * TILE_CELLS)
    out, nx0, ny1, res = GT.align_to_grid(a, 0.0, 4 * TILE_CELLS * 5.0,
                                          5.0, method="block_mean",
                                          factor=2)
    assert res == 10.0 and out.shape == (2 * TILE_CELLS, 2 * TILE_CELLS)
    # first 2x2 block mean, rounded half-away
    want = int(np.floor(a[:2, :2].mean() + 0.5))
    assert out[0, 0] == want


def test_ingest_offset_raster_zonal_equals_aligned_control(spark,
                                                           tmp_path):
    """An ingested raster whose origin is OFF the tile grid (offset by
    a multiple of res) yields the same zonal stats as the aligned
    control for points whose buffers stay inside the overlap."""
    from greenexp_r_spark.operators.availability import ndvi_zonal
    from greenexp_r_spark.operators.zonal_tiles import ndvi_zonal_tiles

    res, span = 10, TILE_CELLS * 10.0
    # build one big aligned array covering tiles [0,9)x[0,9), then
    # write it with the origin shifted 4 cells west/3 cells north —
    # same pixels, off-grid georeferencing
    big = np.zeros((9 * TILE_CELLS, 9 * TILE_CELLS), dtype=np.int32)
    for tx in range(9):
        for ty in range(9):
            v = ndvi_tile_values(tx, ty, res).reshape(TILE_CELLS,
                                                      TILE_CELLS)
            big[ty * TILE_CELLS:(ty + 1) * TILE_CELLS,
                tx * TILE_CELLS:(tx + 1) * TILE_CELLS] = v
    # crop a window whose origin is OFF the tile grid (4 cells east,
    # 3 cells short of the north edge) — the pixels keep their true
    # world positions, only the file's origin breaks the contract
    win = big[0:9 * TILE_CELLS - 3, 4:9 * TILE_CELLS]   # south-up
    north_up = win[::-1]
    GT.write_geotiff(str(tmp_path / "off.tif"), north_up,
                     xmin=4 * res, ymax=(9 * TILE_CELLS - 3) * res,
                     res=float(res))
    # without align: strict contract refuses
    with pytest.raises(Exception):
        GT.ingest_geotiff_tiles(
            spark, str(tmp_path / "off.tif")).count()
    tiles = GT.ingest_geotiff_tiles(spark, str(tmp_path / "off.tif"),
                                    align="nearest")
    pts = world.points_df(spark, SF_TEST).where(
        "x > 450 and x < 19100 and y > 450 and y < 19100").limit(60)
    got = ndvi_zonal_tiles(pts, tiles).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    want = ndvi_zonal(pts).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert got.equals(want)


# ------------------------------------------------------ COG overviews

def test_cog_overview_chain_roundtrip(tmp_path):
    """write_cog chains reduced-resolution IFDs (NewSubfileType=1);
    every level decodes and equals the numpy pyramid replay."""
    rng = np.random.default_rng(11)
    a = rng.integers(-200, 800, size=(700, 900)).astype(np.int32)
    p = str(tmp_path / "cog.tif")
    GT.write_cog(p, a, 1000.0, 9000.0, 10.0, compress="deflate",
                 tiled=256)
    buf = open(p, "rb").read()
    chain = GT.parse_geotiff_chain(buf)
    assert [im["subfile_type"] for im in chain] == [0, 1, 1]
    assert np.array_equal(chain[0]["bands"][0], a)
    lvl = a
    for im in chain[1:]:
        lvl = GT.downsample2(lvl)
        assert np.array_equal(im["bands"][0], lvl)
        assert im["xmin"] == 1000.0 and im["ymax"] == 9000.0
    assert [im["res"] for im in chain] == [10.0, 20.0, 40.0]
    # the single-IFD reader still sees exactly the full-res image
    bands, xmin, ymax, res = GT.parse_geotiff_bands(buf)
    assert np.array_equal(bands[0], a) and res == 10.0


def test_cog_level_selection(tmp_path):
    a = np.arange(512 * 512, dtype=np.int32).reshape(512, 512) % 1000
    p = str(tmp_path / "cog.tif")
    GT.write_cog(p, a, 0.0, 5120.0, 10.0, compress="lzw", tiled=256)
    buf = open(p, "rb").read()
    # coarsest level with res <= target
    _, _, _, r = GT.read_cog_level(buf, 25.0)
    assert r == 20.0
    _, _, _, r = GT.read_cog_level(buf, 1000.0)
    assert r == 20.0          # pyramid stops once <= 256 px
    _, _, _, r = GT.read_cog_level(buf, 10.0)
    assert r == 10.0
    _, _, _, r = GT.read_cog_level(buf, 1.0)   # finer than base: base
    assert r == 10.0


def test_cog_multiband_bigtiff(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 255, size=(300, 300)).astype(np.uint8)
    p = str(tmp_path / "cogb.tif")
    GT.write_cog(p, [a, a[::-1]], 0.0, 3000.0, 10.0, bigtiff=True,
                 compress="deflate", tiled=None)
    chain = GT.parse_geotiff_chain(open(p, "rb").read())
    assert len(chain) == 2 and len(chain[0]["bands"]) == 2
    assert np.array_equal(chain[0]["bands"][1], a[::-1])
    assert np.array_equal(chain[1]["bands"][0], GT.downsample2(a))
    assert np.array_equal(chain[1]["bands"][1],
                          GT.downsample2(a[::-1]))


def test_downsample2_ragged_edges():
    a = np.array([[1, 2, 3],
                  [4, 5, 6],
                  [7, 8, 9]], dtype=np.int32)
    d = GT.downsample2(a)
    # ragged means: corner blocks average available cells only
    assert d.shape == (2, 2)
    assert d[0, 0] == 3                 # (1+2+4+5)/4
    assert d[0, 1] == np.floor((3 + 6) / 2 + 0.5)
    assert d[1, 0] == np.floor((7 + 8) / 2 + 0.5)
    assert d[1, 1] == 9
    f = GT.downsample2(a.astype(np.float64))
    assert f[0, 1] == 4.5 and f[1, 1] == 9.0


# -------------------------------------------------- ranged COG reads

def test_cog_ranged_window_equals_full_decode(tmp_path):
    """read_window fetches only intersecting chunks and matches the
    full decode's slice; byte traffic is a small fraction of the
    file (the COG object-storage promise)."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1000, size=(1500, 1024)).astype(np.int32)
    p = str(tmp_path / "cog.tif")
    GT.write_cog(p, a, 0.0, 15000.0, 10.0, compress="deflate",
                 tiled=256)
    import os
    fsize = os.path.getsize(p)
    with GT.FileRangeFetcher(p) as fetch:
        r = GT.CogReader(fetch)
        win, wx, wy, res = r.read_window(2005.0, 9000.0,
                                         4490.0, 11990.0)
        assert fetch.bytes_read < 0.25 * fsize
    assert res == 10.0
    # snapped pixel window: cols floor(200.5)..ceil(449), rows ...
    c0, c1 = 200, 449
    r0 = int(np.floor((15000.0 - 11990.0) / 10))   # 301
    r1 = int(np.ceil((15000.0 - 9000.0) / 10))     # 600
    assert wx == c0 * 10.0 and wy == 15000.0 - r0 * 10.0
    assert np.array_equal(win, a[r0:r1, c0:c1])


def test_cog_ranged_overview_and_bands(tmp_path):
    rng = np.random.default_rng(7)
    b0 = rng.integers(0, 255, size=(600, 600)).astype(np.uint8)
    b1 = rng.integers(0, 255, size=(600, 600)).astype(np.uint8)
    p = str(tmp_path / "cogm.tif")
    GT.write_cog(p, [b0, b1], 0.0, 6000.0, 10.0, compress="lzw",
                 tiled=128, predictor=2)
    with GT.FileRangeFetcher(p) as fetch:
        r = GT.CogReader(fetch)
        assert [lv["subfile_type"] for lv in r.levels] == [0, 1, 1]
        # overview level picked by target_res, band 1
        win, wx, wy, res = r.read_window(0.0, 0.0, 6000.0, 6000.0,
                                         target_res=25.0, band=1)
        assert res == 20.0
    assert np.array_equal(win, GT.downsample2(b1))
    # base-level band 1 window
    with GT.FileRangeFetcher(p) as fetch:
        win2, _, _, res2 = GT.CogReader(fetch).read_window(
            1280.0, 1280.0, 2560.0, 2560.0, band=1)
    assert res2 == 10.0
    assert np.array_equal(win2, b1[344:472, 128:256])


def test_cog_reader_requires_tiles(tmp_path):
    a = np.zeros((100, 100), dtype=np.int32)
    p = str(tmp_path / "strips.tif")
    GT.write_cog(p, a, 0.0, 1000.0, 10.0, tiled=None)
    with GT.FileRangeFetcher(p) as fetch:
        with pytest.raises(ValueError, match="tiled"):
            GT.CogReader(fetch)


def test_ingest_cog_window_tiles(spark, tmp_path):
    """Distributed AOI ingest range-reads only AOI chunks and yields
    the same TILE_SCHEMA rows as chopping the array directly."""
    rng = np.random.default_rng(9)
    a = rng.integers(-50, 400, size=(1024, 1024)).astype(np.int32)
    p = str(tmp_path / "cogw.tif")
    res, span = 10.0, 256 * 10.0
    GT.write_cog(p, a, 0.0, 10240.0, res, compress="deflate",
                 tiled=256)
    got = GT.ingest_cog_window_tiles(
        spark, [p], span, span, 3 * span, 3 * span).toPandas() \
        .sort_values("tile_id").reset_index(drop=True)
    want = sorted(GT.tiles_from_array(a, 0.0, 10240.0, res),
                  key=lambda r: r["tile_id"])
    want = [w for w in want
            if span <= w["xmin"] < 3 * span
            and span <= w["ymin"] < 3 * span]
    assert list(got["tile_id"]) == [w["tile_id"] for w in want]
    for i, w in enumerate(want):
        assert np.array_equal(np.asarray(got["values"][i]),
                              w["values"])
