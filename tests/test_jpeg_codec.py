"""Pure-numpy baseline JPEG codec: encode/decode round trip, metadata
agreement, chroma subsampling + restart markers (hand-built streams the
4:4:4 encoder cannot emit), progressive/truncation failure modes, and the
Spark decode operators over JPEG bytes."""

import struct

import numpy as np
import pytest

from mysql_syncer_spark.functions.jpeg_codec import (
    ZIGZAG,
    _AC_CHR,
    _AC_LUM,
    _BitWriter,
    _DC_CHR,
    _DC_LUM,
    _build_codes,
    decode_jpeg,
    encode_jpeg,
)
from mysql_syncer_spark.functions.multimodal import jpeg_meta


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(h + w - 2, 1)],
        axis=-1,
    ).astype(np.uint8)


def test_round_trip_color_and_meta():
    img = _gradient(45, 37)  # odd dims exercise edge-replicated padding
    b = encode_jpeg(img, quality=95)
    assert jpeg_meta(b) == (37, 45, 3)
    dec = decode_jpeg(b)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() < 48, (err.mean(), err.max())


def test_round_trip_gray():
    g = (np.mgrid[0:40, 0:56][0] * 255 // 39).astype(np.uint8)
    b = encode_jpeg(g, quality=90)
    assert jpeg_meta(b) == (56, 40, 1)
    dec = decode_jpeg(b)
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() < 16


def test_quality_knob_changes_size_and_error():
    img = (np.random.default_rng(3).integers(0, 256, (32, 32, 3))).astype(np.uint8)
    lo, hi = encode_jpeg(img, quality=20), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    assert err_hi < err_lo


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dc_only_block(bw, codes, diff):
    """One 8x8 block holding only a DC difference (solid color)."""
    cat = int(abs(diff)).bit_length()
    code, ln = codes["dc"][cat]
    bw.put(code, ln)
    if cat:
        amp = diff if diff >= 0 else diff + (1 << cat) - 1
        bw.put(amp, cat)
    code, ln = codes["ac"][0x00]  # EOB
    bw.put(code, ln)


def _build_420(y_vals, cb_vals, cr_vals, w, h, restart=0):
    """Hand-build a 4:2:0 baseline JPEG of solid-color MCUs (one (Y,Cb,Cr)
    triple per 16x16 MCU) with all-ones quant tables — a stream shape the
    4:4:4 encoder never produces."""
    lum = {"dc": _build_codes(*_DC_LUM), "ac": _build_codes(*_AC_LUM)}
    chr_ = {"dc": _build_codes(*_DC_CHR), "ac": _build_codes(*_AC_CHR)}
    bw = _BitWriter()
    chunks = []
    pred = [0, 0, 0]
    n = 0
    for (y, cb, cr) in zip(y_vals, cb_vals, cr_vals):
        if restart and n and n % restart == 0:
            chunks.append(bw.flush())
            chunks.append(bytes([0xFF, 0xD0 + ((n // restart - 1) % 8)]))
            bw = _BitWriter()
            pred = [0, 0, 0]
        n += 1
        dc = [round(8 * (v - 128)) for v in (y, cb, cr)]
        for blk in range(4):  # 2x2 luma blocks
            _dc_only_block(bw, lum, dc[0] - pred[0])
            pred[0] = dc[0]
        _dc_only_block(bw, chr_, dc[1] - pred[1])
        pred[1] = dc[1]
        _dc_only_block(bw, chr_, dc[2] - pred[2])
        pred[2] = dc[2]
    chunks.append(bw.flush())

    out = bytearray(b"\xff\xd8")
    ones = bytes(np.ones(64, np.uint8))
    out += _seg(0xDB, bytes([0]) + ones) + _seg(0xDB, bytes([1]) + ones)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _seg(0xC0, sof)
    for cls, tbl, tid in ((0, _DC_LUM, 0), (1, _AC_LUM, 0),
                          (0, _DC_CHR, 1), (1, _AC_CHR, 1)):
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(tbl[0]) + bytes(tbl[1]))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xDA, sos)
    for c in chunks:
        out += c
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("restart", [0, 1])
def test_chroma_subsampled_420_decode(restart):
    """2x2-subsampled MCUs decode with chroma upsampled to full res; with
    restart=1 every MCU boundary carries an RSTn marker and resets the DC
    predictors."""
    y_vals, cb_vals, cr_vals = [100, 60], [120, 128], [140, 128]
    b = _build_420(y_vals, cb_vals, cr_vals, w=32, h=16, restart=restart)
    assert jpeg_meta(b) == (32, 16, 3)
    dec = decode_jpeg(b)
    assert dec.shape == (16, 32, 3)
    for mcu, (y, cb, cr) in enumerate(zip(y_vals, cb_vals, cr_vals)):
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        bl = y + 1.772 * (cb - 128)
        want = np.clip(np.round([r, g, bl]), 0, 255).astype(np.uint8)
        got = dec[:16, mcu * 16: (mcu + 1) * 16]
        assert np.all(np.abs(got.astype(int) - want.astype(int)) <= 1), (
            mcu, got[0, 0], want)


def test_progressive_round_trip_matches_baseline():
    """Progressive (SOF2) decode: the ten-scan successive-approximation
    encoding of an image must decode to the same pixels as its baseline
    encoding (identical quantized coefficients; ≤1 gray-level skew
    allowed for float summation order at the 0.5 rounding boundary)."""
    from mysql_syncer_spark.functions.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    cases = []
    for shape in [(16, 16), (24, 40, 3), (7, 13, 3), (8, 8), (1, 1, 3)]:
        if len(shape) == 2:
            base = np.add.outer(
                np.linspace(0, 255, shape[0]), np.linspace(0, 40, shape[1])
            )
        else:
            base = np.linspace(0, 255, int(np.prod(shape))).reshape(shape)
        cases.append(
            np.clip(base + rng.normal(0, 20, shape), 0, 255).astype(np.uint8)
        )
    for img in cases:
        for q in (90, 50, 25):
            b = decode_jpeg(encode_jpeg(img, q))
            p = decode_jpeg(encode_jpeg_progressive(img, q))
            assert b.shape == p.shape
            d = np.abs(b.astype(int) - p.astype(int))
            assert d.max() <= 1, (img.shape, q, d.max(), (d > 0).sum())


def test_progressive_marker_detected_and_scans_parse():
    """A progressive stream is a real SOF2 file (marker present) and
    parses scan-by-scan, not via the metadata fallback."""
    from mysql_syncer_spark.functions.jpeg_codec import encode_jpeg_progressive

    img = _gradient(32, 16)  # RGB
    b = encode_jpeg_progressive(img, 80)
    assert b"\xff\xc2" in b and b"\xff\xc0" not in b
    assert b.count(b"\xff\xda") == 10  # color scan script
    out = decode_jpeg(b)
    assert out.shape == (32, 16, 3)
    gray = img[..., 0]
    bg = encode_jpeg_progressive(gray, 80)
    assert bg.count(b"\xff\xda") == 6  # grayscale scan script
    assert decode_jpeg(bg).shape == (32, 16)


def test_progressive_eob_run_spans_blocks():
    """Foreign encoders emit EOBn symbols (run length > 1) the capped
    in-repo encoder never produces — hand-assembled two-block scan with
    EOB2 covering the second block."""
    from mysql_syncer_spark.functions.jpeg_codec import (
        ZIGZAG,
        _build_codes,
        _BitWriter,
    )

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    # DQT: ones, except a big step at zigzag-1 so the single ±1 AC
    # coefficient dequantizes to a visible (±32 gray level) cosine ramp
    qt = np.ones(64, np.uint8)
    qt[1] = 64
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qt))
    # SOF2: 1 component, 8 rows x 16 cols = 2 blocks
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += seg(0xC2, sof)
    # DC table: categories 0..1; AC table: 0x00(EOB), 0x10(EOB2), 0x01
    dc_bits = [2, 0] + [0] * 14
    dc_vals = [0, 1]
    ac_bits = [0, 3] + [0] * 14
    ac_vals = [0x00, 0x10, 0x01]
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    dc_codes = _build_codes(dc_bits, dc_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)
    # scan 1: DC first (Al=0) — both DCs zero (cat 0 twice)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    bw = _BitWriter()
    code, ln = dc_codes[0]
    bw.put(code, ln)
    bw.put(code, ln)
    out += bw.flush()
    # scan 2: AC 1..63 first (Al=0): block0 k=1 -> +1, then EOB2 with
    # 1 appended bit 0 -> eobrun covers block0's tail AND all of block1
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    bw = _BitWriter()
    code, ln = ac_codes[0x01]
    bw.put(code, ln)  # (r=0, s=1)
    bw.put(1, 1)      # amplitude +1
    code, ln = ac_codes[0x10]
    bw.put(code, ln)  # EOBn, r=1
    bw.put(0, 1)      # eobrun = (1<<1) - 1 + 0 = 1
    out += bw.flush()
    out += b"\xff\xd9"

    px = decode_jpeg(bytes(out))
    assert px.shape == (8, 16)
    # block0 has one AC coefficient (zigzag k=1 -> natural (0,1)): a
    # horizontal cosine ramp; block1 is flat 128
    assert px[:, 8:].min() == px[:, 8:].max() == 128
    assert px[:, :8].std() > 0


def test_truncated_raises():
    b = encode_jpeg(_gradient(24, 24))
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_spark_meta_and_resize_over_jpeg(spark):
    """The Spark operators (decode_image_meta, resize_image) run over
    JPEG bytes without PIL — the round-4 gap (pixel path used to raise
    NotImplementedError for every web JPEG)."""
    from mysql_syncer_spark.functions.multimodal import (
        decode_image_meta,
        make_image_bytes,
        resize_image,
    )

    rows = [
        (i, make_image_bytes(
            i, w=32, h=24, c=3,
            fmt="jpeg_progressive" if i % 2 else "jpeg",  # SOF0+SOF2 mix
        ))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    meta = {r["media_id"]: (r["width"], r["height"], r["channels"])
            for r in decode_image_meta(df).collect()}
    assert meta == {i: (32, 24, 3) for i in range(8)}
    rs = resize_image(df, out_w=16, out_h=12).collect()
    assert len(rs) == 8 and all(r["width"] == 16 and r["height"] == 12 for r in rs)
