"""Lossy VP8 WebP through the system libwebp (ctypes, webp_native.py),
and CROSS-VALIDATION of the pure-Python VP8L codec against libwebp —
reference-encoder streams exercise the decoder branches our minimal
encoder never emits (LZ77 refs, color cache, meta prefix-code groups,
predictor/cross-color transforms), and our encoder's output must
survive the reference decoder byte-for-byte.

Everything here is numpy-level (no SparkSession); the Spark plumbing of
the same codecs is covered by tests/test_multimodal*.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from mysql_syncer_spark.functions import webp_native as wn
from mysql_syncer_spark.functions.webp_codec import (
    decode_webp,
    encode_webp_lossless,
)

pytestmark = pytest.mark.skipif(
    not wn.available(), reason="system libwebp not loadable"
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


def _image_zoo() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(42)
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    grad = np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256], -1)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    return {
        "gradient": grad.astype(np.uint8),
        "noise": rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
        "palette": pal[rng.integers(0, 7, (64, 48))],
        "flat": np.full((16, 16, 3), 200, np.uint8),
        "tiled": np.tile(tile, (8, 8, 1)),  # LZ77-friendly
        "photo": (grad + rng.integers(-9, 10, (h, w, 3)))
        .clip(0, 255)
        .astype(np.uint8),
    }


def test_lossy_vp8_roundtrip_through_decode_webp():
    img = _image_zoo()["photo"]
    enc = wn.encode_rgb(img, quality=90.0)
    assert enc[:4] == b"RIFF" and enc[12:16] == b"VP8 "
    dec = decode_webp(enc)  # routes through the ctypes path
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(dec, img) > 30.0  # q90 on a noise-dosed image


def test_lossy_vp8_low_quality_still_decodes():
    img = _image_zoo()["gradient"]
    enc = wn.encode_rgb(img, quality=10.0)
    dec = decode_webp(enc)
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 20.0  # q10 is rough but not garbage


def test_lossy_vp8_with_alpha_keeps_alpha_plane():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 4), dtype=np.uint8)
    img[..., 3] = np.linspace(0, 255, 24, dtype=np.uint8)[None, :]
    enc = wn.encode_rgba(img, quality=90.0)
    dec = decode_webp(enc)  # VP8X+ALPH+VP8 — alpha flag honored
    assert dec.shape == (24, 24, 4)
    # WebP stores the alpha plane losslessly by default
    assert np.array_equal(dec[..., 3], img[..., 3])


def test_webp_info_matches_dimensions():
    img = _image_zoo()["flat"]
    assert wn.webp_info(wn.encode_rgb(img, 75.0)) == (16, 16)
    assert wn.webp_info(wn.encode_lossless_rgb(img)) == (16, 16)


@pytest.mark.parametrize("name", sorted(_image_zoo()))
def test_pure_vp8l_decoder_matches_libwebp_encoder(name):
    """Reference-implementation streams → our pure decoder, byte-exact."""
    img = _image_zoo()[name]
    enc = wn.encode_lossless_rgb(img)
    assert enc[12:16] == b"VP8L"
    dec = decode_webp(enc)
    assert np.array_equal(dec[..., :3], img)
    if dec.shape[2] == 4:
        assert np.all(dec[..., 3] == 255)


@pytest.mark.parametrize("name", sorted(_image_zoo()))
def test_libwebp_decoder_accepts_pure_encoder(name):
    """Our encoder's streams → the reference decoder, byte-exact."""
    img = _image_zoo()[name]
    back = wn.decode_rgba(encode_webp_lossless(img, subtract_green=True))
    assert np.array_equal(back[..., :3], img)
    assert np.all(back[..., 3] == 255)


def test_pure_vp8l_decoder_random_size_sweep():
    """20 random images (sizes, palettes, noise mixes) encoded by
    libwebp must decode byte-exact through the pure-Python path —
    probes cache-size/meta-group/transform choices libwebp makes at
    different entropy levels."""
    rng = np.random.default_rng(1234)
    for i in range(20):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        kind = i % 3
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:
            pal = rng.integers(0, 256, (int(rng.integers(2, 17)), 3), dtype=np.uint8)
            img = pal[rng.integers(0, len(pal), (h, w))]
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            img = (
                np.stack([xx * 5, yy * 7, xx + yy], -1) % 256
            ).astype(np.uint8)
        dec = decode_webp(wn.encode_lossless_rgb(img))
        assert np.array_equal(dec[..., :3], img), f"case {i} ({h}x{w}, kind {kind})"


def test_rgba_lossless_cross_validation():
    """Alpha-bearing VP8L from libwebp through the pure decoder."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (21, 33, 4), dtype=np.uint8)
    # libwebp's simple lossless API discards RGB under alpha==0 pixels
    # (invisible-pixel cleanup), so keep every pixel ≥1 alpha
    img[..., 3] = np.maximum(img[..., 3], 1)
    dec = decode_webp(wn.encode_lossless_rgba(img))
    assert dec.shape == (21, 33, 4)
    assert np.array_equal(dec, img)


def test_multimodal_pixel_path_handles_lossy_webp():
    from mysql_syncer_spark.functions.multimodal import _decode_image_pixels

    img = _image_zoo()["gradient"]
    dec = _decode_image_pixels(wn.encode_rgb(img, 90.0))
    assert dec.shape == img.shape and _psnr(dec, img) > 35.0
