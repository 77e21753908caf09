"""WebP VP8L codec tests: own-encoder roundtrips + HAND-BUILT bitstreams
for the decoder branches the encoder doesn't emit (LZ77 backward refs,
color cache, packed color-indexing, predictor / cross-color transforms,
meta prefix groups) — the same strategy as tests/test_jpeg_codec.py.
Spec-faithfulness of the parts a self-consistent roundtrip can't prove
(distance neighborhood order, predictor arithmetic) is pinned by direct
unit tests against hand-computed spec values."""

from __future__ import annotations

import numpy as np
import pytest

from mysql_syncer_spark.functions.webp_codec import (
    _DIST_MAP,
    _BitWriter,
    _canonical_codes,
    _predict,
    _prefix_value,
    _write_full_byte_code,
    _write_single_symbol_code,
    decode_webp,
    encode_webp_lossless,
    wrap_vp8l,
)


# ---------------------------------------------------------------------------
# encoder → decoder roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 24)])
def test_roundtrip_rgb(shape, subtract_green):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(img, subtract_green=subtract_green))
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_roundtrip_rgba_and_gray():
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(rgba))
    assert out.shape == (9, 11, 4)
    np.testing.assert_array_equal(out, rgba)
    gray = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(gray))
    np.testing.assert_array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))


# ---------------------------------------------------------------------------
# spec-pinned unit tests
# ---------------------------------------------------------------------------


def test_distance_map_head_matches_spec():
    """First entries of the 2D neighborhood table as printed in the WebP
    Lossless Bitstream Specification §4.2.2 (x offset, y offset)."""
    want = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    assert _DIST_MAP[:16] == want
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_prefix_value_ranges():
    """Length/distance prefix decoding: codes 0-3 are literals 1-4, then
    (2 + lsb) << extra ranges (spec)."""

    class Bits:
        def __init__(self, v):
            self.v = v

        def read(self, n):
            return self.v

    assert _prefix_value(0, Bits(0)) == 1
    assert _prefix_value(3, Bits(0)) == 4
    assert _prefix_value(4, Bits(0)) == 5  # offset 4, 1 extra bit
    assert _prefix_value(4, Bits(1)) == 6
    assert _prefix_value(5, Bits(0)) == 7
    assert _prefix_value(13, Bits(24)) == 121  # offset 96 + 24 + 1


def _px(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_predict_select_spec():
    """Select (mode 11): P = L+T−TL per channel; return whichever of
    L/T is closer to P in L1 — equivalently compare ‖T−TL‖ vs ‖L−TL‖,
    ties to top."""
    tl = _px(255, 10, 10, 10)
    top = _px(255, 11, 10, 10)   # ‖T−TL‖ = 1
    left = _px(255, 10, 40, 10)  # ‖L−TL‖ = 30
    assert _predict(11, left, top, tl, 0) == left  # P closer to L
    # roles swapped: P−T' = L'−TL (norm 1) → still the same pixel VALUE
    # (now passed as top) wins
    assert _predict(11, top, left, tl, 0) == left
    # tie → top
    assert _predict(11, top, top, tl, 0) == top


def test_predict_clamp_add_subtract_half_truncates_toward_zero():
    """Mode 13: ave = (L+T)>>1; ave + (ave−TL)/2 with C-style truncation
    toward zero (NOT floor) before clamping."""
    left = _px(255, 0, 0, 10)
    top = _px(255, 0, 0, 12)     # ave blue = 11
    tl = _px(255, 0, 0, 14)      # ave − TL = −3 → trunc(−1.5) = −1
    got = _predict(13, left, top, tl, 0) & 0xFF
    assert got == 10  # 11 + (−1); floor division would give 11 − 2 = 9


def test_predict_averages():
    left = _px(255, 100, 0, 0)
    top = _px(255, 50, 0, 0)
    tl = _px(255, 25, 0, 0)
    tr = _px(255, 11, 0, 0)
    assert (_predict(7, left, top, tl, tr) >> 16) & 0xFF == 75  # avg(L,T)
    assert (_predict(6, left, top, tl, tr) >> 16) & 0xFF == 62  # avg(L,TL)
    assert (_predict(9, left, top, tl, tr) >> 16) & 0xFF == 30  # avg(T,TR)
    # mode 5: avg(avg(L,TR), T) = avg(55, 50) = 52
    assert (_predict(5, left, top, tl, tr) >> 16) & 0xFF == 52
    # mode 12: clamp(L+T−TL) = 125
    assert (_predict(12, left, top, tl, tr) >> 16) & 0xFF == 125


# ---------------------------------------------------------------------------
# hand-built streams: helpers
# ---------------------------------------------------------------------------


def _emit_normal_code(bw: _BitWriter, lengths: dict[int, int], alphabet: int):
    """Write a normal (code-length-coded) prefix-code header for
    ``lengths`` (symbol → bit length), padding the tail with zero runs so
    the decoder's token loop lands exactly on ``alphabet``. Returns the
    canonical symbol→(code, len) table for writing payload symbols."""
    used = sorted(set(lengths.values()))
    tokens = used + [17, 18, 0]
    clc_bits = max(1, (len(tokens) - 1).bit_length())
    clc_lengths = {t: clc_bits for t in tokens}
    clc_codes = _canonical_codes(clc_lengths)

    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    bw.write(0, 1)  # not simple
    bw.write(15, 4)  # num_code_lengths = 19 (all slots explicit)
    for t in order:
        bw.write(clc_lengths.get(t, 0), 3)
    bw.write(0, 1)  # no explicit max_symbol: token budget = alphabet

    def tok(t):
        code, ln = clc_codes[t]
        bw.write_code(code, ln)

    def zero_run(n):
        while n:
            if n >= 11:
                step = min(n, 138)
                tok(18)
                bw.write(step - 11, 7)
            elif n >= 3:
                step = n
                tok(17)
                bw.write(step - 3, 3)
            else:
                step = 1
                tok(0)
            n -= step

    sym = 0
    for s in sorted(lengths):
        zero_run(s - sym)
        tok(lengths[s])
        sym = s + 1
    zero_run(alphabet - sym)
    return _canonical_codes(lengths)


def _header(bw: _BitWriter, w: int, h: int, alpha: bool = False):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha else 0, 1)
    bw.write(0, 3)


def _decode_bits(bw: _BitWriter) -> np.ndarray:
    return decode_webp(wrap_vp8l(b"\x2f" + bw.bytes()))


# ---------------------------------------------------------------------------
# hand-built streams: decoder branches
# ---------------------------------------------------------------------------


def test_lz77_backward_reference():
    """8×1 image: one literal pixel then two (length-3, dist-1) copies and
    a literal — exercises length prefix codes and dist code > 120."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    # green: literal 10 and length-code 2 (→ length 3), both 1 bit
    gcodes = _emit_normal_code(bw, {10: 1, 256 + 2: 1}, 256 + 24)
    _write_single_symbol_code(bw, 1)  # red
    _write_single_symbol_code(bw, 3)  # blue
    _write_single_symbol_code(bw, 255)  # alpha
    _write_single_symbol_code(bw, 13)  # distance: prefix 13 + 5 bits
    for _ in range(2):
        bw.write_code(*gcodes[10])  # literal (green=10, red=1, blue=3)
        bw.write_code(*gcodes[256 + 2])  # length 3
        bw.write(24, 5)  # dist value 121 → plane code 121-120 = 1
    assert _decode_bits(bw).tolist() == [[[1, 10, 3]] * 8]


def test_color_cache():
    """Literal pixel then a color-cache hit reproducing it (cache_bits=4,
    spec hash 0x1E35A7BD)."""
    a, r, g, b = 255, 1, 2, 3
    val = (a << 24) | (r << 16) | (g << 8) | b
    idx = (0x1E35A7BD * val & 0xFFFFFFFF) >> 28
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(4, 4)  # cache_bits = 4
    bw.write(0, 1)  # no meta prefix
    gcodes = _emit_normal_code(
        bw, {g: 1, 256 + 24 + idx: 1}, 256 + 24 + 16
    )
    _write_single_symbol_code(bw, r)
    _write_single_symbol_code(bw, b)
    _write_single_symbol_code(bw, a)
    _write_single_symbol_code(bw, 0)  # distance (unused)
    bw.write_code(*gcodes[g])  # literal → fills cache slot idx
    bw.write_code(*gcodes[256 + 24 + idx])  # cache hit
    assert _decode_bits(bw).tolist() == [[[r, g, b], [r, g, b]]]


def test_color_indexing_packed_with_crop():
    """4-color palette → 2 bits/pixel bundling (4 px per green byte) on a
    width-10 image: the last packed pixel carries 2 padding slots that
    must be cropped. Palette entries are component deltas of the
    previous entry (spec)."""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx_row = [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]  # width 10

    bw = _BitWriter()
    _header(bw, 10, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3, 8)  # n_colors - 1
    # palette sub-image (level != 0): 4 delta pixels, full-byte codes
    prev = (255, 0, 0, 0)  # a, r, g, b of implicit zero predecessor
    deltas = []
    pa = pg = pr = pb = 0
    for (r, g, b) in colors:
        deltas.append(((255 - pa) & 0xFF, (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF))
        pa, pr, pg, pb = 255, r, g, b
    bw.write(0, 1)  # no color cache (sub-image)
    _write_full_byte_code(bw, 256 + 24)  # green
    _write_full_byte_code(bw, 256)  # red
    _write_full_byte_code(bw, 256)  # blue
    _write_full_byte_code(bw, 256)  # alpha
    _write_single_symbol_code(bw, 0)  # distance
    for (da, dr, dg, db) in deltas:
        bw.write_code(dg, 8)
        bw.write_code(dr, 8)
        bw.write_code(db, 8)
        bw.write_code(da, 8)
    # back at level 0
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    # packed width = ceil(10/4) = 3 pixels; indices in green, low bits first
    packed = []
    for i in range(0, 10, 4):
        grp = idx_row[i : i + 4]
        v = 0
        for s, q in enumerate(grp):
            v |= q << (2 * s)
        packed.append(v)
    gcodes = _emit_normal_code(bw, {v: 2 for v in set(packed)} if len(set(packed)) > 1 else {packed[0]: 1, 255: 1}, 256 + 24)
    _write_single_symbol_code(bw, 0)  # red
    _write_single_symbol_code(bw, 0)  # blue
    _write_single_symbol_code(bw, 255)  # alpha
    _write_single_symbol_code(bw, 0)  # distance
    for v in packed:
        bw.write_code(*gcodes[v])
    out = _decode_bits(bw)
    assert out.shape == (1, 10, 3)
    assert [tuple(p) for p in out[0]] == [colors[i] for i in idx_row]


def test_predictor_transform_all_modes():
    """Predictor transform with a 4-block mode image covering L, T,
    Select and ClampAddSubtractHalf: residuals computed in-test with the
    decoder's own forward arithmetic must invert to the original image
    (borders follow the spec's first-row/first-column rules)."""
    rng = np.random.default_rng(3)
    h, w, bits = 8, 8, 2  # 2x2 blocks of 4x4
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    argb = (
        np.full((h, w), 255, np.uint32) << 24
        | img[..., 0].astype(np.uint32) << 16
        | img[..., 1].astype(np.uint32) << 8
        | img[..., 2].astype(np.uint32)
    )
    modes = np.array([[1, 2], [11, 13]], dtype=np.uint32)

    def sub_px(p, q):
        out = 0
        for i in (0, 8, 16, 24):
            out |= ((((p >> i) & 0xFF) - ((q >> i) & 0xFF)) & 0xFF) << i
        return out

    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[0, x - 1])
            elif x == 0:
                pred = int(argb[y - 1, 0])
            else:
                tr = int(argb[y - 1, x + 1]) if x + 1 < w else int(argb[y, 0])
                pred = _predict(
                    int(modes[y >> bits, x >> bits]),
                    int(argb[y, x - 1]),
                    int(argb[y - 1, x]),
                    int(argb[y - 1, x - 1]),
                    tr,
                )
            res[y, x] = sub_px(int(argb[y, x]), pred)

    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(bits - 2, 3)
    # mode sub-image (2x2): modes in green channel, 2-bit uniform code
    bw.write(0, 1)  # no color cache
    mcodes = _emit_normal_code(bw, {int(m): 2 for m in np.unique(modes)}, 256 + 24)
    _write_single_symbol_code(bw, 0)
    _write_single_symbol_code(bw, 0)
    _write_single_symbol_code(bw, 255)
    _write_single_symbol_code(bw, 0)
    for m in modes.flat:
        bw.write_code(*mcodes[int(m)])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    _write_full_byte_code(bw, 256 + 24)
    _write_full_byte_code(bw, 256)
    _write_full_byte_code(bw, 256)
    _write_single_symbol_code(bw, 0)  # alpha residual constant 0
    _write_single_symbol_code(bw, 0)  # distance
    for y in range(h):
        for x in range(w):
            v = int(res[y, x])
            bw.write_code((v >> 8) & 0xFF, 8)
            bw.write_code((v >> 16) & 0xFF, 8)
            bw.write_code(v & 0xFF, 8)
    np.testing.assert_array_equal(_decode_bits(bw), img)


def test_cross_color_transform():
    """Cross-color with one block: multipliers g2r=-1, g2b=16, r2b=-128
    packed as (blue, green, red) bytes of the sub-image pixel; forward
    deltas computed in-test must invert exactly."""
    rng = np.random.default_rng(5)
    h, w, bits = 4, 4, 3
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    g2r, g2b, r2b = -1, 16, -128

    def to_i8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (t * to_i8(c)) >> 5

    res = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            rr = (r - delta(g2r, g)) & 0xFF
            bb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            res[y, x] = (rr, g, bb)

    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(1, 2)  # CROSS_COLOR
    bw.write(bits - 2, 3)
    # 1x1 sub-image: constant multipliers via single-symbol codes
    bw.write(0, 1)  # no color cache
    _write_single_symbol_code(bw, g2b & 0xFF)  # green channel
    _write_single_symbol_code(bw, r2b & 0xFF)  # red channel
    _write_single_symbol_code(bw, g2r & 0xFF)  # blue channel
    _write_single_symbol_code(bw, 0)  # alpha
    _write_single_symbol_code(bw, 0)  # distance
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    _write_full_byte_code(bw, 256 + 24)
    _write_full_byte_code(bw, 256)
    _write_full_byte_code(bw, 256)
    _write_single_symbol_code(bw, 255)
    _write_single_symbol_code(bw, 0)
    for y in range(h):
        for x in range(w):
            rr, g, bb = (int(v) for v in res[y, x])
            bw.write_code(g, 8)
            bw.write_code(rr, 8)
            bw.write_code(bb, 8)
    np.testing.assert_array_equal(_decode_bits(bw), img)


def test_meta_prefix_groups():
    """Entropy image with 2 code groups (entropy_bits=2): left half uses
    a green=5 single-symbol group, right half green=9 — group switching
    consumes zero extra bits per pixel."""
    w, h, ebits = 8, 4, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix present
    bw.write(ebits - 2, 3)
    # entropy sub-image 2x1: group ids in (pixel >> 8) & 0xFFFF
    bw.write(0, 1)  # no color cache
    ecodes = _emit_normal_code(bw, {0: 1, 1: 1}, 256 + 24)
    _write_single_symbol_code(bw, 0)  # red (group id high byte)
    _write_single_symbol_code(bw, 0)
    _write_single_symbol_code(bw, 255)
    _write_single_symbol_code(bw, 0)
    bw.write_code(*ecodes[0])
    bw.write_code(*ecodes[1])
    # group 0: green 5; group 1: green 9 — all single-symbol codes
    for green in (5, 9):
        _write_single_symbol_code(bw, green)
        _write_single_symbol_code(bw, 0)
        _write_single_symbol_code(bw, 0)
        _write_single_symbol_code(bw, 255)
        _write_single_symbol_code(bw, 0)
    out = _decode_bits(bw)
    assert out.shape == (h, w, 3)
    assert (out[:, :4, 1] == 5).all() and (out[:, 4:, 1] == 9).all()


# ---------------------------------------------------------------------------
# container / error paths
# ---------------------------------------------------------------------------


def test_container_errors():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp(b"nope" * 4)
    lossy = b"RIFF" + b"\x14\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x04\x00\x00\x00" + b"\x00" * 4
    # a garbage VP8 body: libwebp (when loadable) rejects it as corrupt;
    # without libwebp the lossy branch raises NotImplementedError
    from mysql_syncer_spark.functions import webp_native

    if webp_native.available():
        with pytest.raises(ValueError, match="libwebp"):
            decode_webp(lossy)
    else:
        with pytest.raises(NotImplementedError, match="lossy VP8"):
            decode_webp(lossy)
    with pytest.raises(ValueError, match="0x2f"):
        decode_webp(wrap_vp8l(b"\x00\x01\x02"))


def test_truncated_stream_raises():
    b = bytearray(encode_webp_lossless(np.zeros((4, 4, 3), np.uint8)))
    with pytest.raises(ValueError):
        decode_webp(bytes(b[: len(b) // 2]))


def test_roundtrip_property_sweep():
    """Property sweep: any uint8 image of any small shape/channel count
    roundtrips exactly through the VP8L encoder+decoder."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        import pytest as _pytest

        _pytest.skip("hypothesis unavailable")

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 18),
        h=st.integers(1, 14),
        c=st.sampled_from([2, 3, 4]),  # 2 → gray path via [:, :, 0]? no: gray is ndim==2
        seed=st.integers(0, 2**31 - 1),
        sg=st.booleans(),
    )
    def run(w, h, c, seed, sg):
        rng = np.random.default_rng(seed)
        if c == 2:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            want = np.repeat(img[:, :, None], 3, axis=2)
        else:
            img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            want = img
        out = decode_webp(encode_webp_lossless(img, subtract_green=sg))
        np.testing.assert_array_equal(out, want)

    run()
