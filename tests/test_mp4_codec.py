"""MP4 / ISO-BMFF container codec: encode→parse→frame-decode round trip,
sample-table geometry, foreign-codec metadata fallback, and the Spark
operators (video_meta probe + frame sampling) over mixed containers."""

import struct

import numpy as np
import pytest

from mysql_syncer_spark.functions.mp4_codec import (
    encode_mp4,
    parse_mp4_meta_and_offsets,
    read_mp4_frame,
)
from mysql_syncer_spark.functions.multimodal import make_video_bytes


def _frames(n=10, h=12, w=16, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w), dtype=np.uint8)


def test_mp4_meta_round_trip():
    fr = _frames()
    b = encode_mp4(fr, fps=8)
    assert b[4:8] == b"ftyp"
    m = parse_mp4_meta_and_offsets(b)
    assert (m["w"], m["h"]) == (16, 12)
    assert m["fps"] == 8.0
    assert m["n_frames"] == 10
    assert m["supported"] and m["codec"] == "mp4v/0x6c"
    assert len(m["offsets"]) == 10
    # offsets point INSIDE mdat at JPEG SOIs, sizes are the exact samples
    for off, size in m["offsets"]:
        assert b[off : off + 2] == b"\xff\xd8"
        assert b[off + size - 2 : off + size] == b"\xff\xd9"


def test_mp4_frame_decode_tolerance():
    """MJPEG is lossy: decoded frames match the source within JPEG
    quantization error (same tolerance the AVI MJPG tests use)."""
    fr = _frames(n=6)
    b = encode_mp4(fr, fps=4, quality=90)
    m = parse_mp4_meta_and_offsets(b)
    for i, (off, size) in enumerate(m["offsets"]):
        img = read_mp4_frame(b, off, size, m)
        assert img.shape == (12, 16)
        assert np.mean(np.abs(img.astype(int) - fr[i].astype(int))) < 16


def test_mp4_foreign_codec_metadata_fallback():
    """A non-MJPEG sample entry (avc1) still parses to a full metadata
    row — geometry, fps, frame count — with supported=False; pixel
    decode raises NotImplementedError (the honest-fallback policy)."""
    b = bytearray(encode_mp4(_frames(n=4), fps=8))
    i = bytes(b).find(b"mp4v")
    assert i > 0
    b[i : i + 4] = b"avc1"
    m = parse_mp4_meta_and_offsets(bytes(b))
    assert m["supported"] is False and m["codec"] == "avc1"
    assert m["n_frames"] == 4 and (m["w"], m["h"]) == (16, 12)
    off, size = m["offsets"][0]
    with pytest.raises(NotImplementedError):
        read_mp4_frame(bytes(b), off, size, m)


def test_mp4_co64_and_multi_sample_chunks():
    """Decoder-side generality the encoder doesn't emit: rewrite stco as
    co64 (64-bit offsets) and verify the walk still lands on SOIs."""
    b = encode_mp4(_frames(n=5), fps=8)
    m = parse_mp4_meta_and_offsets(b)
    # build co64 from the parsed 32-bit offsets and splice it in place
    n = len(m["offsets"])
    stco_body = struct.pack(">I", n) + b"".join(
        struct.pack(">I", o) for o, _ in m["offsets"]
    )
    old = struct.pack(">I", 8 + 4 + len(stco_body)) + b"stco" \
        + struct.pack(">I", 0) + stco_body
    co64_body = struct.pack(">I", n) + b"".join(
        struct.pack(">Q", o) for o, _ in m["offsets"]
    )
    new = struct.pack(">I", 8 + 4 + len(co64_body)) + b"co64" \
        + struct.pack(">I", 0) + co64_body
    assert old in b
    # box sizes differ -> fix the enclosing sizes by rebuilding: simplest
    # honest check is a same-size box, so pad stco offsets as co64 only
    # when sizes match; instead parse a synthetic buffer where the stbl
    # chain is rewritten wholesale
    b2 = b.replace(old, new)
    # enclosing boxes (stbl/minf/mdia/trak/moov) now carry stale sizes;
    # patch them: each grew by len(new)-len(old)
    delta = len(new) - len(old)
    moov_at = b2.find(b"moov") - 4
    out = bytearray(b2)
    pos = moov_at
    # walk down the container chain patching the first matching box size
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = b2.find(fourcc, pos)
        assert at > 0
        sz = struct.unpack_from(">I", b2, at - 4)[0]
        struct.pack_into(">I", out, at - 4, sz + delta)
        pos = at
    m2 = parse_mp4_meta_and_offsets(bytes(out))
    assert [o for o, _ in m2["offsets"]] == [o for o, _ in m["offsets"]]
    for off, size in m2["offsets"]:
        assert bytes(out)[off : off + 2] == b"\xff\xd8"


def test_video_meta_operator_mixed_containers(spark):
    """video_meta over AVI-DIB, AVI-MJPG, MP4, and a foreign-codec MP4:
    one metadata row each, decodable flag honest per codec."""
    from mysql_syncer_spark.functions.multimodal import video_meta

    avc1 = bytearray(make_video_bytes(3, container="mp4"))
    i = bytes(avc1).find(b"mp4v")
    avc1[i : i + 4] = b"avc1"
    rows = [
        (0, make_video_bytes(0)),                           # AVI DIB
        (1, make_video_bytes(1, codec="MJPG")),             # AVI MJPG
        (2, make_video_bytes(2, container="mp4")),          # MP4 MJPEG
        (3, bytes(avc1)),                                   # MP4 foreign
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r.asDict() for r in video_meta(df).collect()}
    assert got[0]["container"] == "avi" and got[0]["codec"] == "DIB"
    assert got[1]["codec"] == "MJPG" and got[1]["decodable"]
    assert got[2]["container"] == "mp4" and got[2]["codec"] == "mp4v/0x6c"
    assert got[2]["decodable"] and got[2]["fps"] == 8.0
    assert got[3]["codec"] == "avc1" and not got[3]["decodable"]
    for r in got.values():
        assert (r["width"], r["height"], r["n_frames"]) == (16, 12, 24)


def test_sample_video_frames_mp4(spark):
    """Frame sampling explodes MP4 the same as AVI: every 4th frame,
    timestamps from the stts-derived fps, 16x12 grayscale payloads."""
    from mysql_syncer_spark.functions.multimodal import sample_video_frames

    rows = [(i, make_video_bytes(i, container="mp4")) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = sample_video_frames(df, every_n=4).collect()
    assert len(out) == 4 * 6  # 24 frames / 4
    for r in out:
        assert len(r["frame"]) == 16 * 12
        assert r["ts_s"] == r["frame_idx"] / 8.0
