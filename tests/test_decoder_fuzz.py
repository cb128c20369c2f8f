"""Decoder fuzzing: every from-scratch byte-stream decoder (WAV,
PNG/JPEG, GeoTIFF) must handle truncations and random single-byte
corruptions by either decoding successfully or raising a normal
exception — never hanging, and never dying on an internal error
class that callers can't anticipate (the LZW-truncation lesson:
running off the end of a stream must be a loud ValueError, not a
silent partial decode).

Hypothesis drives the truncation points and mutation offsets; each
decoder's happy path in the same test pins that the UNCORRUPTED
bytes still decode, so a decoder that 'passes' by rejecting
everything fails here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from greenexp_r_spark.operators import multimodal as M
from greenexp_r_spark.sources import geotiff as G

_OK_ERRORS = (ValueError, KeyError, IndexError, struct.error,
              EOFError, OverflowError, TypeError)


# fixtures built ONCE at module import: the hypothesis draws vary
# only the cut/mutation, never the input bytes
def _make_tiff() -> bytes:
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/f.tif"
        G.write_geotiff(p, np.arange(64, dtype=np.int32).reshape(8, 8),
                        xmin=0.0, ymax=80.0, res=10.0)
        with open(p, "rb") as f:
            return f.read()


_WAV = M.encode_wav(np.arange(-500, 500, 3, dtype=np.int16), 12000)
_PNG = M.encode_png(np.arange(400, dtype=np.uint8).reshape(20, 20))
_JPEG = M.encode_jpeg(16, 12, 3)
_TIFF = _make_tiff()
_BY_NAME = {"wav": _WAV, "png": _PNG, "jpeg": _JPEG}


@settings(max_examples=80, deadline=None)
@given(cut=st.integers(min_value=0, max_value=10_000),
       which=st.sampled_from(["wav", "png", "jpeg"]))
def test_truncation_never_silent(cut, which):
    full = _BY_NAME[which]
    buf = full[: min(cut, len(full))]
    if len(buf) == len(full):
        return                      # not truncated — covered below
    try:
        if which == "wav":
            M.decode_wav(buf)
            # decoding truncated WAV must not succeed: the RIFF size
            # check makes every proper prefix invalid
            raise AssertionError("truncated WAV decoded silently")
        else:
            M.decode_image_real(buf, want_pixels=(which == "png"))
            # a truncated PNG pixel decode must not succeed either
            # (chunk completeness + IEND are required); only the
            # header-only JPEG path may legally parse a prefix
            assert which == "jpeg", "truncated PNG decoded silently"
    except _OK_ERRORS:
        pass


@settings(max_examples=80, deadline=None)
@given(data=st.data(),
       which=st.sampled_from(["wav", "png", "jpeg"]))
def test_single_byte_corruption_is_contained(data, which):
    full = bytearray(_BY_NAME[which])
    off = data.draw(st.integers(0, len(full) - 1))
    delta = data.draw(st.integers(1, 255))
    full[off] = (full[off] + delta) % 256
    try:
        if which == "wav":
            M.decode_wav(bytes(full))
        else:
            M.decode_image_real(bytes(full),
                                want_pixels=(which == "png"))
    except _OK_ERRORS:
        pass
    except zlib.error:
        pass                        # PNG IDAT corruption surfaces here


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(min_value=8, max_value=4096))
def test_tiff_truncation_raises_or_refuses(cut):
    short = _TIFF[: min(cut, len(_TIFF) - 1)]
    # contract: raise a normal error OR return a partial parse that
    # refuses to fabricate the full image — never silently whole
    try:
        vals, _x, _y, _r = G.parse_geotiff(short)
    except _OK_ERRORS:
        return
    assert vals.size < 64, "truncated TIFF decoded silently whole"


def test_uncorrupted_all_decode():
    assert M.decode_wav(_WAV)["n_samples"] == 334
    assert M.decode_image_real(_PNG, want_pixels=True)["width"] == 20
    assert M.decode_image_real(_JPEG)["height"] == 12
    vals, _x, _y, _r = G.parse_geotiff(_TIFF)
    assert vals.shape == (8, 8)
