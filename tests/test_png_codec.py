"""Pure numpy+zlib PNG codec: roundtrip + all five scanline filters."""

import struct
import zlib

import numpy as np
import pytest

from mysql_syncer_spark.functions.png_codec import (
    PNG_SIG,
    _chunk,
    decode_png,
    encode_png,
    png_meta,
)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip(c):
    rng = np.random.default_rng(7 + c)
    img = rng.integers(0, 256, (13, 9, c), dtype=np.uint8)
    b = encode_png(img)
    assert bytes(b[:8]) == PNG_SIG
    w, h, ch, depth = png_meta(b)
    assert (w, h, ch, depth) == (9, 13, c, 8)
    out = decode_png(b)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _encode_with_filter(img: np.ndarray, f: int) -> bytes:
    """Hand-build a PNG whose every scanline uses filter ``f`` — proves the
    decoder implements the spec, not just our encoder's filter-0 output."""
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        left = np.zeros(w * c, dtype=np.int16)
        left[c:] = row[:-c]
        ul = np.zeros(w * c, dtype=np.int16)
        ul[c:] = prev[:-c]
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = row - pred
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_decoder_handles_every_filter(f):
    rng = np.random.default_rng(100 + f)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    b = _encode_with_filter(img, f)
    assert np.array_equal(decode_png(b), img)


def test_meta_probe_rejects_non_png():
    with pytest.raises(ValueError):
        png_meta(b"IMG1xxxxxx")


def test_multimodal_image_path_is_real_png():
    from mysql_syncer_spark.functions.multimodal import (
        _decode_image_header,
        _decode_image_pixels,
        make_image_bytes,
    )

    b = make_image_bytes(5, w=20, h=10, c=3)
    assert bytes(b[:8]) == PNG_SIG
    assert _decode_image_header(b) == (20, 10, 3)
    px = _decode_image_pixels(b)
    rng = np.random.default_rng(5)
    assert np.array_equal(px, rng.integers(0, 256, (10, 20, 3), dtype=np.uint8))


def test_roundtrip_fuzz_random_shapes():
    """Property fuzz: random (w, h, channels) roundtrips exactly, with no
    numpy overflow warnings (uint8 filter arithmetic is explicit-int)."""
    import warnings

    import numpy as np

    from mysql_syncer_spark.functions.png_codec import decode_png, encode_png

    rng = np.random.default_rng(7)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        for _ in range(25):
            w = int(rng.integers(1, 40))
            h = int(rng.integers(1, 40))
            c = int(rng.choice([1, 3, 4]))
            img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(img)), img), (w, h, c)
