"""GIF codec: lossless LZW roundtrip (gray palette == index), animation
frames, interlace, transparency compositing, header probe, and the Spark
image operators over real GIF bytes."""

import struct

import numpy as np
import pytest

from mysql_syncer_spark.functions.gif_codec import (
    _lzw_encode,
    _sub_blocks,
    decode_gif,
    encode_gif,
    gif_meta,
)


def test_single_frame_roundtrip_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    b = encode_gif(img)
    assert b[:6] == b"GIF87a" and b[-1] == 0x3B
    assert gif_meta(b) == (32, 24, 1, 256)
    dec = decode_gif(b)
    assert dec.shape == (1, 24, 32, 3)
    # gray palette: every channel equals the source pixel exactly
    for ch in range(3):
        assert np.array_equal(dec[0, :, :, ch], img)


def test_animation_roundtrip_and_meta():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (5, 12, 16), dtype=np.uint8)
    b = encode_gif(frames, delay_cs=4)
    assert b[:6] == b"GIF89a"
    assert gif_meta(b) == (16, 12, 5, 256)
    dec = decode_gif(b)
    assert dec.shape == (5, 12, 16, 3)
    for i in range(5):
        assert np.array_equal(dec[i, :, :, 0], frames[i]), i


def test_lzw_table_reset_on_large_image():
    """>4096 dictionary entries forces the encoder's mid-stream clear
    code; the decoder must mirror the reset."""
    rng = np.random.default_rng(13)
    big = rng.integers(0, 256, (120, 200), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(big))[0, :, :, 0], big)


def test_interlaced_decode():
    """Hand-built interlaced GIF (2-color table): the 4-pass row order
    (0,8),(4,8),(2,4),(1,2) must de-interlace back to display order."""
    ih = iw = 8
    disp = (np.arange(ih, dtype=np.uint8)[:, None].repeat(iw, 1)) % 2
    order = [
        y
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for y in range(start, ih, step)
    ]
    lzw = _lzw_encode(disp[order].reshape(-1), 2)
    b = bytearray(b"GIF87a")
    b += struct.pack("<HHBBB", iw, ih, 0x80, 0, 0)
    b += bytes([0, 0, 0, 255, 255, 255])
    b += b"\x2c" + struct.pack("<HHHHB", 0, 0, iw, ih, 0x40)
    b.append(2)
    b += _sub_blocks(lzw)
    b.append(0x3B)
    got = decode_gif(bytes(b))[0, :, :, 0] // 255
    assert np.array_equal(got, disp)


def test_transparency_composites_over_prior_frame():
    f1 = np.full((6, 6), 10, np.uint8)
    b = bytearray(encode_gif(f1)[:-1])  # drop trailer, append frame 2
    patch = np.array(
        [[77, 10, 77], [10, 77, 10], [77, 10, 77]], np.uint8
    )
    b += b"\x21\xf9" + _sub_blocks(struct.pack("<BHB", 0x05, 0, 10))
    b += b"\x2c" + struct.pack("<HHHHB", 1, 1, 3, 3, 0)
    b.append(8)
    b += _sub_blocks(_lzw_encode(patch.reshape(-1), 8))
    b.append(0x3B)
    dec = decode_gif(bytes(b))
    assert dec.shape[0] == 2
    exp = f1.copy()
    exp[1:4, 1:4] = np.where(patch == 10, 10, patch)
    assert np.array_equal(dec[1, :, :, 0], exp)


def test_non_gif_rejected():
    with pytest.raises(ValueError):
        gif_meta(b"PNG\x00 definitely not")
    with pytest.raises(ValueError):
        decode_gif(b"GIF85a" + b"\x00" * 16)


def test_spark_image_ops_over_gif(spark):
    """GIF flows through the same mapInPandas dispatch as PNG/JPEG: the
    meta probe reads the header only; pixel decode surfaces RGB."""
    from mysql_syncer_spark.functions.multimodal import (
        decode_image_meta,
        make_image_bytes,
    )

    rows = [
        (i, make_image_bytes(i, fmt=("gif" if i % 2 else "png")))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    assert len(got) == 6
    for i, r in got.items():
        assert (r["width"], r["height"], r["channels"]) == (32, 24, 3), i
