"""Pure-python WebP LOSSLESS (VP8L) codec — decoder for the full VP8L
feature set the lossless web format uses (WebP Lossless Bitstream
Specification): LSB-first bit stream, canonical prefix codes (simple and
code-length-coded), meta-prefix (entropy-image) code groups, LZ77
backward references with the 2D distance neighborhood map, color cache,
and all four transforms (predictor ×14 modes, cross-color,
subtract-green, color-indexing incl. sub-byte pixel packing). The VP8L
half is cross-validated byte-exact against libwebp in BOTH directions
(libwebp-encoded streams through this decoder, this encoder's streams
through libwebp — tests/test_webp_native.py). Lossy VP8 (boolean
arithmetic coding) decodes through the system libwebp via ctypes
(``webp_native.py``, round 5) and raises NotImplementedError where no
libwebp is loadable; ``multimodal.webp_meta`` probes it without
decoding either way.

The encoder emits a deliberately simple-but-valid subset (literal-only,
optional subtract-green, optional palette) used by any VP8L decoder —
the same own-encoder + hand-built-stream test strategy as the JPEG codec
(jpeg_codec.py). Hand-built streams in tests/test_webp_codec.py exercise
the decoder branches the encoder doesn't emit (LZ77 refs, color cache,
predictor/cross-color transforms, meta groups).

Like the PNG/JPEG/GIF codecs, this exists for the multimodal decode
OPERATOR: the Spark-side plumbing (mapInPandas batching, schema,
partitioning) is what must scale; the per-image decode is embarrassingly
parallel inside the Arrow batch.

The 2D distance table is derived from the spec's neighborhood ordering
(120 closest (dx, dy) pixels, dy in 0..7, sorted by squared distance,
ties broken by larger dy then smaller |dx| with +dx before −dx)."""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first within bytes, as the VP8L stream is packed)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated VP8L stream")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """n bits of ``value``, LSB first (the stream convention)."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """A prefix code is transmitted MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def write_bytes_as_codes(self, values: np.ndarray) -> None:
        """Vectorized ``write_code(v, 8)`` for a byte array — the
        encoder's pixel hot loop (all literal codes are the 8-bit
        identity code). Bits go MSB-of-value first into the LSB-first
        stream; numpy unpack/pack replaces per-bit Python."""
        bits = np.unpackbits(values.astype(np.uint8).reshape(-1, 1), axis=1)
        pend = np.array(
            [(self.acc >> i) & 1 for i in range(self.nbits)], dtype=np.uint8
        )
        allb = np.concatenate([pend, bits.ravel()])
        n_full = len(allb) & ~7
        self.out.extend(np.packbits(allb[:n_full], bitorder="little").tobytes())
        self.acc = 0
        self.nbits = int(len(allb) - n_full)
        for i, bit in enumerate(allb[n_full:]):
            self.acc |= int(bit) << i

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style assignment; decode walks bits
# MSB-of-code first, which is exactly the stream's bit order)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (shorter codes first, then
    symbol order) — the assignment both DEFLATE and VP8L use."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        if ln > 0:
            by_len.setdefault(ln, []).append(sym)
    code = 0
    out: dict[int, tuple[int, int]] = {}
    for ln in range(1, max(by_len, default=0) + 1):
        for sym in sorted(by_len.get(ln, [])):
            out[sym] = (code, ln)
            code += 1
        code <<= 1
    return out


class _PrefixCode:
    """Decoder for one canonical prefix code. A single-symbol code has
    length 0: it decodes without consuming bits (spec)."""

    def __init__(self, lengths: dict[int, int]) -> None:
        nonzero = {s: l for s, l in lengths.items() if l > 0}
        if len(nonzero) == 1:
            self.single = next(iter(nonzero))
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(nonzero).items()
        }
        if not self.table:
            raise ValueError("empty prefix code")

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt VP8L prefix code")


# order in which code-length-code lengths are transmitted (spec)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        if num_symbols == 1:
            code = _PrefixCode.__new__(_PrefixCode)
            code.single = sym0
            code.table = {}
            return code
        sym1 = br.read(8)
        return _PrefixCode({sym0: 1, sym1: 1})
    num_clc = 4 + br.read(4)
    clc_lengths = {s: 0 for s in range(19)}
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read(1):  # explicit max number of length tokens
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = {}
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        tok = clc.decode(br)
        if tok < 16:
            lengths[symbol] = tok
            symbol += 1
            if tok:
                prev_len = tok
        elif tok == 16:
            for _ in range(3 + br.read(2)):
                lengths[symbol] = prev_len
                symbol += 1
        elif tok == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (spec): codes 0-3 literal, then
    (2 + lsb) << extra ranges."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _distance_map() -> list[tuple[int, int]]:
    cands = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(
        key=lambda p: (
            p[0] * p[0] + p[1] * p[1],
            -p[1],
            abs(p[0]),
            0 if p[0] >= 0 else 1,
        )
    )
    return cands[:120]


_DIST_MAP = _distance_map()


def _plane_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * width + dx)


# ---------------------------------------------------------------------------
# image-stream decoding (ARGB int32 pixels; recursive for sub-images)
# ---------------------------------------------------------------------------

_GREEN_LITERALS = 256
_LENGTH_CODES = 24


def _subimage_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """→ uint32 (h, w) ARGB. Reads transforms only at level 0; reads its
    own color cache + code groups at every level (spec)."""
    transforms: list[tuple] = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _subimage_size(w, bits), _subimage_size(h, bits), False
                )
                transforms.append(("predictor", bits, sub))
            elif ttype == 1:  # cross-color
                bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _subimage_size(w, bits), _subimage_size(h, bits), False
                )
                transforms.append(("color", bits, sub))
            elif ttype == 2:
                transforms.append(("subtract_green",))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_image_stream(br, n_colors, 1, False)[0]
                # palette entries are componentwise deltas of the previous
                pal = np.cumsum(
                    pal.view(np.uint8).reshape(-1, 4).astype(np.uint32),
                    axis=0,
                    dtype=np.uint32,
                ) & 0xFF
                pal = (
                    pal.astype(np.uint32)[:, 0]
                    | (pal.astype(np.uint32)[:, 1] << 8)
                    | (pal.astype(np.uint32)[:, 2] << 16)
                    | (pal.astype(np.uint32)[:, 3] << 24)
                )
                if n_colors <= 2:
                    pack_bits = 3
                elif n_colors <= 4:
                    pack_bits = 2
                elif n_colors <= 16:
                    pack_bits = 1
                else:
                    pack_bits = 0
                # remember the width at read time: the inverse unpacks
                # back to it (the last packed pixel may carry padding)
                transforms.append(("palette", pack_bits, pal, w))
                if pack_bits:
                    w = _subimage_size(w, pack_bits)

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("invalid VP8L color-cache size")
    cache = np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None

    entropy_img = None
    entropy_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):  # meta prefix codes
        entropy_bits = br.read(3) + 2
        entropy_img = _decode_image_stream(
            br,
            _subimage_size(w, entropy_bits),
            _subimage_size(h, entropy_bits),
            False,
        )
        meta = ((entropy_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
        entropy_img = meta

    green_alpha = _GREEN_LITERALS + _LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n_px = w * h
    px = np.zeros(n_px, dtype=np.uint32)
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    while pos < n_px:
        if entropy_img is not None:
            x, y = pos % w, pos // w
            gi = entropy_img[y >> entropy_bits, x >> entropy_bits]
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        s = g_green.decode(br)
        if s < _GREEN_LITERALS:
            red = g_red.decode(br)
            blue = g_blue.decode(br)
            alpha = g_alpha.decode(br)
            val = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = val
            if cache is not None:
                cache[(0x1E35A7BD * int(val) & 0xFFFFFFFF) >> (32 - cache_bits)] = val
            pos += 1
        elif s < _GREEN_LITERALS + _LENGTH_CODES:
            length = _prefix_value(s - _GREEN_LITERALS, br)
            dist = _plane_dist(_prefix_value(g_dist.decode(br), br), w)
            if dist > pos or pos + length > n_px:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                val = px[pos - dist]
                px[pos] = val
                if cache is not None:
                    cache[
                        (0x1E35A7BD * int(val) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = val
                pos += 1
        else:
            val = cache[s - _GREEN_LITERALS - _LENGTH_CODES]
            px[pos] = int(val)
            pos += 1

    img = px.reshape(h, w)
    for t in reversed(transforms):
        img = _apply_inverse_transform(img, t, h)
    return img


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _split(img: np.ndarray):
    return (
        (img >> 24) & 0xFF,
        (img >> 16) & 0xFF,
        (img >> 8) & 0xFF,
        img & 0xFF,
    )


def _join(a, r, g, b) -> np.ndarray:
    return (
        (a.astype(np.uint32) << 24)
        | ((r.astype(np.uint32) & 0xFF) << 16)
        | ((g.astype(np.uint32) & 0xFF) << 8)
        | (b.astype(np.uint32) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """One ARGB predictor (14 modes, per-channel byte arithmetic)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    ch = lambda v, i: (v >> i) & 0xFF
    out = 0
    for i in (0, 8, 16, 24):
        l, t, c, r = ch(left, i), ch(top, i), ch(tl, i), ch(tr, i)
        if mode == 5:
            v = _avg2(_avg2(l, r), t)
        elif mode == 6:
            v = _avg2(l, c)
        elif mode == 7:
            v = _avg2(l, t)
        elif mode == 8:
            v = _avg2(c, t)
        elif mode == 9:
            v = _avg2(t, r)
        elif mode == 10:
            v = _avg2(_avg2(l, c), _avg2(t, r))
        elif mode == 11:
            # select: whole-pixel Manhattan choice, computed once below
            v = 0
        elif mode == 12:
            v = min(255, max(0, l + t - c))
        else:  # 13: ClampAddSubtractHalf — (a-c)/2 truncates toward zero
            a = _avg2(l, t)
            d = a - c
            v = min(255, max(0, a + (d // 2 if d >= 0 else -(-d // 2))))
        out |= (v & 0xFF) << i
    if mode == 11:
        # Select: P = L+T−TL componentwise; return the input P is closer
        # to in L1 — ‖P−L‖ = ‖T−TL‖ and ‖P−T‖ = ‖L−TL‖; ties go to top
        ch_sum = lambda p, q: sum(
            abs(((p >> i) & 0xFF) - ((q >> i) & 0xFF)) for i in (0, 8, 16, 24)
        )
        return left if ch_sum(top, tl) < ch_sum(left, tl) else top
    return out


def _apply_inverse_transform(img: np.ndarray, t: tuple, out_h: int) -> np.ndarray:
    kind = t[0]
    if kind == "subtract_green":
        a, r, g, b = _split(img)
        return _join(a, (r + g) & 0xFF, g, (b + g) & 0xFF)
    if kind == "palette":
        _, pack_bits, pal, orig_w = t
        h, cw = img.shape
        idx = (img >> 8) & 0xFF
        if pack_bits:
            # bundled pixels: leftmost index in the LEAST significant bits
            # of the green byte; the last packed pixel may carry padding
            # past the original width — crop it
            per = 1 << pack_bits
            bits_pp = 8 >> pack_bits
            mask = (1 << bits_pp) - 1
            full = np.zeros((h, cw * per), dtype=np.uint32)
            for s in range(per):
                full[:, s::per] = (idx >> (s * bits_pp)) & mask
            idx = full[:, :orig_w]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("VP8L palette index out of range")
        return pal[idx]
    if kind == "predictor":
        _, bits, sub = t
        modes = (sub >> 8) & 0xF
        h, w = img.shape
        res = img
        dec = np.zeros_like(img)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(dec[0, x - 1])  # mode L on first row
                elif x == 0:
                    pred = int(dec[y - 1, 0])  # mode T on first column
                else:
                    mode = int(modes[y >> bits, x >> bits])
                    # TR at the right edge: prediction addresses pixels by
                    # 1D row-major index, so (x+1, y-1) wraps to (0, y) —
                    # the CURRENT row's leftmost pixel (already decoded)
                    tr = (
                        int(dec[y - 1, x + 1])
                        if x + 1 < w
                        else int(dec[y, 0])
                    )
                    pred = _predict(
                        mode,
                        int(dec[y, x - 1]),
                        int(dec[y - 1, x]),
                        int(dec[y - 1, x - 1]),
                        tr,
                    )
                dec[y, x] = _add_pixels(int(res[y, x]), pred)
        return dec
    if kind == "color":
        _, bits, sub = t
        h, w = img.shape
        a, r, g, b = _split(img)
        # ColorTransformElement packing: green_to_red = blue byte,
        # green_to_blue = green byte, red_to_blue = red byte (spec)
        g2r = _to_i8(sub & 0xFF)
        g2b = _to_i8((sub >> 8) & 0xFF)
        r2b = _to_i8((sub >> 16) & 0xFF)
        ys, xs = np.mgrid[0:h, 0:w]
        by, bx = ys >> bits, xs >> bits
        cg2r = g2r[by, bx]
        cg2b = g2b[by, bx]
        cr2b = r2b[by, bx]
        gs = _to_i8_arr(g)
        new_r = (r + ((cg2r * gs) >> 5)) & 0xFF
        rs = _to_i8_arr(new_r)
        new_b = (b + ((cg2b * gs) >> 5) + ((cr2b * rs) >> 5)) & 0xFF
        return _join(a, new_r, g, new_b)
    raise AssertionError(kind)


def _add_pixels(px: int, pred: int) -> int:
    out = 0
    for i in (0, 8, 16, 24):
        out |= ((((px >> i) & 0xFF) + ((pred >> i) & 0xFF)) & 0xFF) << i
    return out


def _to_i8(arr: np.ndarray) -> np.ndarray:
    return arr.astype(np.uint8).astype(np.int8).astype(np.int64)


def _to_i8_arr(arr: np.ndarray) -> np.ndarray:
    return arr.astype(np.int64).astype(np.uint8).astype(np.int8).astype(np.int64)


# ---------------------------------------------------------------------------
# container + public API
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes) -> tuple[np.ndarray, bool]:
    """VP8L chunk payload → (uint32 (h, w) ARGB, has_alpha_hint)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream (missing 0x2f signature)")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = bool(br.read(1))
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    return _decode_image_stream(br, w, h, True), alpha_hint


def decode_webp(b: bytes) -> np.ndarray:
    """WebP RIFF bytes → uint8 (h, w, 3) RGB or (h, w, 4) RGBA (alpha
    kept when the stream hints it). Lossless (VP8L) decodes pure-Python
    (cross-validated byte-exact against libwebp both directions,
    tests/test_webp_native.py); lossy VP8 decodes through the system
    libwebp via ctypes (webp_native.py) and raises NotImplementedError
    when no libwebp is loadable (arithmetic coding + ~2k RFC 6386
    probability constants make a trustworthy pure-Python path
    impractical; webp_meta still probes it without pixels)."""
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    pos = 12
    saw_alpha = False
    while pos + 8 <= len(b):
        cid, clen = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"VP8X" and len(body) >= 1:
            # len(body) not clen: a truncated file whose declared clen
            # overruns the buffer must raise ValueError below, not
            # IndexError here (ADVICE r5)
            saw_alpha |= bool(body[0] & 0x10)  # alpha flag
        if cid == b"ALPH":
            saw_alpha = True
        if cid == b"VP8L":
            argb, alpha_hint = decode_vp8l(body)
            a, r, g, bl = _split(argb)
            rgba = np.stack([r, g, bl, a], axis=-1).astype(np.uint8)
            return rgba if alpha_hint else rgba[..., :3]
        if cid == b"VP8 ":
            from . import webp_native

            if not webp_native.available():
                raise NotImplementedError(
                    "lossy VP8 needs the system libwebp (not loadable "
                    "here); webp_meta probes it without pixels"
                )
            rgba = webp_native.decode_rgba(b)  # full RIFF: VP8X/ALPH too
            return rgba if saw_alpha else rgba[..., :3]
        pos += 8 + clen + (clen & 1)
    raise ValueError("WebP has no VP8L/VP8 chunk")


# ---------------------------------------------------------------------------
# encoder (valid literal-only VP8L subset; see module docstring)
# ---------------------------------------------------------------------------


def _write_full_byte_code(bw: _BitWriter, alphabet_size: int) -> None:
    """Emit the normal-code header for 'symbols 0..255 all length 8,
    rest 0' — a complete code (256 × 2^-8 == 1)."""
    bw.write(0, 1)  # not simple
    bw.write(8, 4)  # num_code_lengths = 12 (covers symbols 16 and 8)
    clc = [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1]  # order: 17,18,0..5,16,6,7,8
    for v in clc:
        bw.write(v, 3)
    # code-length code: {16: len 1 -> code 1, 8: len 1 -> code 0}
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 8
    bw.write(84, 8)  # max_symbol = 2 + 84 = 86 tokens
    bw.write_code(0, 1)  # token '8' (literal length 8)
    for _ in range(85):  # 85 × repeat-prev(3) == 255 more
        bw.write_code(1, 1)  # token '16'
        bw.write(0, 2)  # repeat count 3
    assert alphabet_size >= 256


def _write_single_symbol_code(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # 1 symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def encode_webp_lossless(
    img: np.ndarray, subtract_green: bool = False
) -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA → WebP VP8L
    bytes (literal-only; optional subtract-green transform). Lossless
    roundtrip by construction."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    h, w, c = img.shape
    has_alpha = c == 4
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    a = img[..., 3].astype(np.int64) if has_alpha else np.full((h, w), 255, np.int64)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    _write_full_byte_code(bw, 256 + 24)  # green
    _write_full_byte_code(bw, 256)  # red
    _write_full_byte_code(bw, 256)  # blue
    if has_alpha:
        _write_full_byte_code(bw, 256)  # alpha
    else:
        _write_single_symbol_code(bw, 255)  # constant alpha: 0 bits/px
    _write_single_symbol_code(bw, 0)  # distance (never used)

    chans = [g, r, b] + ([a] if has_alpha else [])
    bw.write_bytes_as_codes(
        np.stack([c.reshape(-1) for c in chans], axis=1).ravel()
    )
    return wrap_vp8l(b"\x2f" + bw.bytes())


def wrap_vp8l(payload: bytes) -> bytes:
    """VP8L chunk payload (incl. the 0x2f signature byte) → WebP RIFF
    container bytes."""
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
