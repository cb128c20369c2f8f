"""GeoTIFF → tile-table ingest (VERDICT r02 'What's missing #4').

The reference reads rasters with terra/GDAL (`terra::rast` on a
/vsicurl COG, ndvi_calc.R:308-315) and writes them back with
`terra::writeRaster` (S8).  This module feeds the engine's tile table
(sources/tiles.TILE_SCHEMA) from real GeoTIFF files without GDAL:

  * a minimal pure-numpy GeoTIFF codec — classic TIFF, single band,
    striped layout, uncompressed or zlib (Compression=8), int32 or
    float64 samples, georeferenced by ModelPixelScale +
    ModelTiepoint (the two tags every north-up GeoTIFF carries);
  * `write_geotiff` — enough of a writer to round-trip fixtures and
    export raster sinks;
  * `ingest_geotiff_tiles(spark, path_glob)` — the distributed path:
    `spark.read.format("binaryFile")` ships each file's bytes to a
    task; a mapInPandas parses and chops it into TILE_CELLS-aligned
    tile rows.  One file = one task = O(file) memory; a directory of
    COG-sized files ingests embarrassingly parallel, and the output
    lands in the same tile table every zonal operator joins against.

Alignment contract: the raster's origin must sit on the world tile
grid (xmin % (TILE_CELLS·res) == 0, same for ymax→ymin) — true for
fixture exports; a real deployment reprojects/aligns at ingest, as the
reference does with terra::project.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np

from .tiles import TILE_CELLS, TILE_SCHEMA

_TAG_WIDTH, _TAG_LENGTH = 256, 257
_TAG_BITS, _TAG_COMPRESSION, _TAG_PHOTOMETRIC = 258, 259, 262
_TAG_STRIP_OFFSETS, _TAG_ROWS_PER_STRIP, _TAG_STRIP_COUNTS = 273, 278, 279
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE, _TAG_TIEPOINT = 33550, 33922

_FMT_INT, _FMT_FLOAT = 2, 3


def write_geotiff(path: str, values: np.ndarray, xmin: float,
                  ymax: float, res: float,
                  compress: bool = False) -> None:
    """Write a single-band north-up GeoTIFF (row 0 = north).  values:
    (nrow, ncol) int32 or float64."""
    a = np.asarray(values)
    if a.dtype == np.int32:
        fmt, bits = _FMT_INT, 32
    elif a.dtype == np.float64:
        fmt, bits = _FMT_FLOAT, 64
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    nrow, ncol = a.shape
    raw = a.tobytes()
    data = zlib.compress(raw) if compress else raw

    entries = []          # (tag, type, count, value_or_offset_marker)

    def e(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    # layout: header(8) + IFD + extra arrays + strip data
    n_entries = 11
    ifd_size = 2 + n_entries * 12 + 4
    extra_off = 8 + ifd_size
    extras = []

    def extra(payload: bytes) -> int:
        nonlocal extra_off
        off = extra_off
        extras.append(payload)
        extra_off += len(payload)
        return off

    scale_off = extra(struct.pack("<3d", res, res, 0.0))
    tie_off = extra(struct.pack("<6d", 0.0, 0.0, 0.0, xmin, ymax, 0.0))
    data_off = extra_off

    e(_TAG_WIDTH, 3, 1, ncol)
    e(_TAG_LENGTH, 3, 1, nrow)
    e(_TAG_BITS, 3, 1, bits)
    e(_TAG_COMPRESSION, 3, 1, 8 if compress else 1)
    e(_TAG_PHOTOMETRIC, 3, 1, 1)
    e(_TAG_STRIP_OFFSETS, 4, 1, data_off)
    e(_TAG_ROWS_PER_STRIP, 3, 1, nrow)
    e(_TAG_STRIP_COUNTS, 4, 1, len(data))
    e(_TAG_SAMPLE_FORMAT, 3, 1, fmt)
    e(_TAG_PIXEL_SCALE, 12, 3, scale_off)
    e(_TAG_TIEPOINT, 12, 6, tie_off)
    entries.sort()

    out = [struct.pack("<2sHI", b"II", 42, 8),
           struct.pack("<H", n_entries)]
    for tag, typ, count, value in entries:
        out.append(struct.pack("<HHII", tag, typ, count, value))
    out.append(struct.pack("<I", 0))          # no next IFD
    out.extend(extras)
    out.append(data)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def parse_geotiff(buf: bytes):
    """→ (values (nrow, ncol) ndarray, xmin, ymax, res)."""
    if buf[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, count, value = struct.unpack_from(
            "<HHII", buf, ifd_off + 2 + 12 * i)
        tags[tag] = (typ, count, value)

    def scalar(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing tag {tag}")
            return default
        return tags[tag][2]

    def doubles(tag):
        typ, count, off = tags[tag]
        return struct.unpack_from(f"<{count}d", buf, off)

    def longs(tag):
        typ, count, value = tags[tag]
        if count == 1:
            return [value]
        size = 2 if typ == 3 else 4
        fmt = "H" if typ == 3 else "I"
        return list(struct.unpack_from(f"<{count}{fmt}", buf, value))

    ncol = scalar(_TAG_WIDTH)
    nrow = scalar(_TAG_LENGTH)
    bits = scalar(_TAG_BITS)
    comp = scalar(_TAG_COMPRESSION, 1)
    fmt = scalar(_TAG_SAMPLE_FORMAT, 1)
    if comp not in (1, 8):
        raise ValueError(f"unsupported compression {comp}")
    if (fmt, bits) == (_FMT_INT, 32):
        dtype = np.int32
    elif (fmt, bits) == (_FMT_FLOAT, 64):
        dtype = np.float64
    elif (fmt, bits) == (1, 32):          # unsigned stored by others
        dtype = np.uint32
    else:
        raise ValueError(f"unsupported sample format {fmt}/{bits}")
    offs = longs(_TAG_STRIP_OFFSETS)
    cnts = longs(_TAG_STRIP_COUNTS)
    raw = b"".join(
        zlib.decompress(buf[o:o + c]) if comp == 8 else buf[o:o + c]
        for o, c in zip(offs, cnts))
    values = np.frombuffer(raw, dtype=dtype).reshape(nrow, ncol)
    sx, sy, _ = doubles(_TAG_PIXEL_SCALE)
    if abs(sx - sy) > 1e-12:
        raise ValueError("non-square pixels")
    tie = doubles(_TAG_TIEPOINT)
    xmin = tie[3] - tie[0] * sx
    ymax = tie[4] + tie[1] * sy
    return values, float(xmin), float(ymax), float(sx)


def tiles_from_array(values: np.ndarray, xmin: float, ymax: float,
                     res: float, band: str = "ingested"):
    """Chop a north-up array into TILE_SCHEMA rows (row 0 of a tile =
    its SOUTH edge, matching sources/tiles cell addressing).  Requires
    grid-aligned origin and dimensions divisible by TILE_CELLS."""
    span = TILE_CELLS * res
    nrow, ncol = values.shape
    ymin = ymax - nrow * res
    if (xmin % span or ymin % span or nrow % TILE_CELLS
            or ncol % TILE_CELLS):
        raise ValueError("raster not aligned to the tile grid")
    south_up = values[::-1]                # row 0 = south
    tx0 = int(xmin // span)
    ty0 = int(ymin // span)
    ntx = ncol // TILE_CELLS
    nty = nrow // TILE_CELLS
    for tj in range(nty):
        for ti in range(ntx):
            block = south_up[tj * TILE_CELLS:(tj + 1) * TILE_CELLS,
                             ti * TILE_CELLS:(ti + 1) * TILE_CELLS]
            tx, ty = tx0 + ti, ty0 + tj
            yield {
                "tile_id": (ty + 1) * 1_000_000 + (tx + 1),
                "tx": tx, "ty": ty,
                "xmin": float(tx * span), "ymin": float(ty * span),
                "res": float(res),
                "nrow": TILE_CELLS, "ncol": TILE_CELLS,
                "band": band,
                "values": np.ascontiguousarray(block).reshape(-1)
                .astype(np.int32),
            }


def ingest_geotiff_tiles(spark, path_glob: str, band: str = "ingested"):
    """Distributed ingest: every GeoTIFF under `path_glob` becomes
    TILE_SCHEMA rows.  binaryFile ships whole files to tasks (the COG
    ingest unit); parsing and chopping stay inside the task."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def chop(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            for content in pdf["content"]:
                values, xmin, ymax, res = parse_geotiff(bytes(content))
                rows = list(tiles_from_array(values, xmin, ymax, res,
                                             band))
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(chop, TILE_SCHEMA)
