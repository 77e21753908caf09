"""AVI container codec: structure-exact RIFF walk, frame roundtrip, and
the Spark frame-sampling operator over the real container."""

import struct

import numpy as np
import pytest

from mysql_syncer_spark.functions.avi_codec import encode_avi, parse_avi


def test_roundtrip_exact():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (10, 12, 16), dtype=np.uint8)
    b = encode_avi(frames, fps=8)
    w, h, fps, got = parse_avi(b)
    assert (w, h, fps) == (16, 12, 8)
    assert np.array_equal(got, frames)


def test_riff_structure_is_spec_exact():
    frames = np.zeros((3, 5, 7), dtype=np.uint8)  # odd width: stride padding
    b = encode_avi(frames, fps=4)
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    # RIFF size covers the whole remainder
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8
    # hdrl list first, movi list and idx1 present
    assert b[12:16] == b"LIST" and b[20:24] == b"hdrl"
    assert b.count(b"00db") == 3 + 3  # movi chunks + idx1 entries
    assert b"idx1" in b
    w, h, fps, got = parse_avi(b)
    assert got.shape == (3, 5, 7)


def test_parser_tolerates_junk_chunks():
    frames = np.full((2, 4, 4), 9, dtype=np.uint8)
    b = bytearray(encode_avi(frames, fps=2))
    # splice a JUNK chunk after the hdrl list (common in real files)
    hdrl_end = 12 + 8 + struct.unpack_from("<I", b, 16)[0] + (
        struct.unpack_from("<I", b, 16)[0] & 1
    )
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    spliced = bytes(b[:hdrl_end]) + junk + bytes(b[hdrl_end:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    w, h, fps, got = parse_avi(spliced)
    assert np.array_equal(got, frames)


def test_non_avi_rejected():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_spark_frame_sampling_over_real_avi(spark):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.functions.multimodal import (
        make_video_bytes,
        sample_video_frames,
    )

    rows = [(i, make_video_bytes(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = sample_video_frames(df, every_n=4).select(
        "media_id", "frame_idx", "ts_s", F.length("frame").alias("n")
    )
    got = out.collect()
    assert len(got) == 6 * 6  # 24 frames, every 4th
    assert all(r["n"] == 16 * 12 for r in got)
    assert {r["frame_idx"] for r in got} == {0, 4, 8, 12, 16, 20}
    assert {r["ts_s"] for r in got if r["frame_idx"] == 4} == {0.5}


def test_seek_table_matches_full_decode():
    rng = np.random.default_rng(17)
    frames = rng.integers(0, 256, (24, 12, 16), dtype=np.uint8)
    b = encode_avi(frames, fps=8)
    from mysql_syncer_spark.functions.avi_codec import (
        parse_avi_meta_and_offsets,
        read_frame_at,
    )

    w, h, fps, offs = parse_avi_meta_and_offsets(b)
    assert (w, h, fps, len(offs)) == (16, 12, 8, 24)
    for i in range(0, 24, 4):
        assert np.array_equal(read_frame_at(b, w, h, offs[i]), frames[i]), i

def _gradient_frames(n: int, h: int = 24, w: int = 32) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [((yy * 4 + xx * 3 + 10 * i) % 200 + 20).astype(np.uint8)
         for i in range(n)]
    )


def test_mjpg_roundtrip_within_tolerance():
    """MJPG codec: each '00dc' chunk is an independent baseline JPEG
    (jpeg_codec); lossy, so assert tolerance + structure, not byte
    parity. Seek-table single-frame decode must equal the full walk."""
    frames = _gradient_frames(6)
    b = encode_avi(frames, fps=8, codec="MJPG", quality=95)
    # container structure: MJPG fourcc in strh+strf, '00dc' chunks
    assert b.count(b"MJPG") == 2
    assert b.count(b"00dc") == 6 + 6 and b"00db" not in b
    # compressed: gradient frames shrink well below raw DIB size
    assert len(b) < len(encode_avi(frames, fps=8)) // 2
    w, h, fps, got = parse_avi(b)
    assert (w, h, fps) == (32, 24, 8) and got.shape == frames.shape
    err = np.abs(got.astype(int) - frames.astype(int))
    assert err.mean() < 1.0 and err.max() <= 10

    from mysql_syncer_spark.functions.avi_codec import (
        parse_avi_meta_and_offsets,
        read_frame_at,
    )

    w2, h2, _fps, offs = parse_avi_meta_and_offsets(b)
    assert (w2, h2, len(offs)) == (32, 24, 6)
    for i in (0, 3, 5):
        assert np.array_equal(read_frame_at(b, w2, h2, offs[i]), got[i]), i


def test_unknown_codec_rejected():
    with pytest.raises(ValueError):
        encode_avi(np.zeros((1, 4, 4), np.uint8), fps=2, codec="H264")


def test_spark_frame_sampling_over_mjpg_avi(spark):
    """The Spark sampling operator is codec-agnostic: read_frame_at
    auto-detects JPEG chunk bodies, so an MJPG AVI flows through the same
    mapInPandas path and yields full-size decoded grayscale frames."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.functions.multimodal import (
        make_video_bytes,
        sample_video_frames,
    )

    rows = [(i, make_video_bytes(i, codec="MJPG")) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = sample_video_frames(df, every_n=8).select(
        "media_id", "frame_idx", F.length("frame").alias("n")
    )
    got = out.collect()
    assert len(got) == 4 * 3  # 24 frames, every 8th
    assert all(r["n"] == 16 * 12 for r in got)
    assert {r["frame_idx"] for r in got} == {0, 8, 16}
