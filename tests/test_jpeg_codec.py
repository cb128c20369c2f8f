"""Baseline JPEG codec (kernels/jpeg.py): full encode→decode
roundtrips with bounded error, spec-structure checks, corruption
detection — pure numpy, written from ITU-T T.81."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from greenexp_r_spark.kernels import jpeg as J
from greenexp_r_spark.operators import multimodal as M


@pytest.mark.parametrize("shape", [(8, 8), (37, 53), (64, 48), (5, 7)])
def test_gray_flat_quant_roundtrip_near_lossless(shape):
    rng = np.random.RandomState(sum(shape))
    a = rng.randint(0, 256, shape).astype(np.uint8)
    got = J.decode_baseline(J.encode_baseline(a, quant=J.QUANT_FLAT))
    assert got.shape == shape and got.dtype == np.uint8
    # flat quant leaves only DCT float rounding: |err| <= 1
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 1


def test_rgb_flat_quant_roundtrip():
    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, (25, 31, 3)).astype(np.uint8)
    got = J.decode_baseline(J.encode_baseline(a, quant=J.QUANT_FLAT))
    assert got.shape == a.shape
    # color transform adds one more rounding stage: |err| <= 2
    assert np.abs(got.astype(int) - a.astype(int)).max() <= 2


def test_default_quant_smooth_image_bounded_error():
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    a = ((np.sin(x / 9.0) + np.cos(y / 7.0)) * 60 + 128) \
        .clip(0, 255).astype(np.uint8)
    got = J.decode_baseline(J.encode_baseline(a))
    err = np.abs(got.astype(int) - a.astype(int))
    assert err.max() <= 12 and err.mean() < 3.0


def test_stream_structure_is_spec_shaped():
    a = np.zeros((16, 16), dtype=np.uint8)
    buf = J.encode_baseline(a)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # exactly one DQT, one SOF0, two DHT, one SOS in marker order
    order = []
    pos = 2
    while pos + 1 < len(buf):
        m = buf[pos + 1]
        order.append(m)
        if m == 0xDA:
            break
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + ln
    assert order == [0xE0, 0xDB, 0xC0, 0xC4, 0xC4, 0xDA]


def test_header_parse_agrees_with_full_decode():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, (19, 23, 3)).astype(np.uint8)
    buf = J.encode_baseline(a, quant=J.QUANT_FLAT)
    meta = M.decode_image_real(buf)
    assert (meta["width"], meta["height"]) == (23, 19)
    assert meta["n_components"] == 3 and meta["px_sum"] is None
    full = M.decode_image_real(buf, want_pixels=True)
    want = int(J.decode_baseline(buf).astype(np.int64).sum())
    assert full["px_sum"] == want


def test_truncated_entropy_raises():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = J.encode_baseline(np.tile(a, (4, 4)))
    with pytest.raises(ValueError, match="truncated|marker"):
        J.decode_baseline(buf[:-20])


def test_progressive_rejected():
    a = np.zeros((8, 8), dtype=np.uint8)
    buf = bytearray(J.encode_baseline(a))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2                      # flip SOF0 → SOF2
    with pytest.raises(ValueError, match="baseline"):
        J.decode_baseline(bytes(buf))


def test_synthesized_jpeg_payloads_fully_decode():
    """The multimodal pipeline's JPEG payloads are real entropy-coded
    streams: the full decoder recovers pixels near the text bytes."""
    text = "greenexp baseline jfif " * 9
    n = len(text) + 26
    if n % 2 == 0:
        text += "x"
        n += 1
    buf = M.synthesize_image(text)
    assert buf[:2] == b"\xff\xd8"
    w, h = M.image_dims(n)
    px = J.decode_baseline(buf)
    assert px.shape == (h, w, 3)
    arr = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    want = arr[np.arange(h * w * 3) % len(arr)].reshape(h, w, 3)
    err = np.abs(px.astype(int) - want.astype(int))
    assert err.max() <= 2
