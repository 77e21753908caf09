"""Pure numpy JPEG codec (ITU-T T.81): baseline sequential DCT AND
progressive DCT (SOF2).

No PIL/libjpeg exists in this container; this implements the subsets the
web's dominant image format actually uses: 8-bit samples, Huffman
entropy coding (standard Annex K tables on encode; ANY tables on
decode), grayscale or YCbCr color, arbitrary chroma sampling factors on
decode (4:4:4 / 4:2:2 / 4:2:0 with nearest-neighbor upsampling), restart
markers, FF00 byte stuffing, and — progressive — spectral selection +
successive approximation in all four scan kinds (DC first/refine, AC
first/refine with EOB runs), coefficients accumulated across scans and
reconstructed with one vectorized IDCT. Progressive ENCODE uses the
classic ten-scan script with EOB runs capped at 1 so the standard
Annex K tables stay legal. Arithmetic coding and hierarchical mode
raise ``NotImplementedError`` — callers fall back to the metadata probe
(``multimodal.jpeg_meta``).

The DCT/IDCT is the exact 8x8 DCT-II matrix product (float64) — slow-path
Python, but this codec exists for the multimodal decode OPERATOR, whose
Spark-side plumbing (schema, Arrow batching, partitioning) is the thing
that must scale; the per-image decode is embarrassingly parallel inside
``mapInPandas``.

Encode emits 4:4:4 (no subsampling) with the Annex K quantization tables
scaled by ``quality`` (libjpeg's 5000/q // 200-2q convention).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_CHR_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables (T.81 Annex K.3): (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill padding per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JPEG bytes
    (4:4:4, standard Huffman tables)."""
    if img.dtype != np.uint8:
        raise ValueError("8-bit images only")
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    if gray:
        comps = [img.reshape(h, w).astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        comps = [y, cb, cr]
    qts = [_quality_scale(_LUM_QT, quality).reshape(8, 8)]
    if not gray:
        qts.append(_quality_scale(_CHR_QT, quality).reshape(8, 8))

    dc_codes = [_build_codes(*_DC_LUM), _build_codes(*_DC_CHR)]
    ac_codes = [_build_codes(*_AC_LUM), _build_codes(*_AC_CHR)]

    bw = _BitWriter()
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for c in comps:
        p = np.empty((ph, pw))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1: h, :]  # edge replicate
        p[:, w:] = p[:, w - 1: w]
        padded.append(p - 128.0)
    pred = [0] * len(comps)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, p in enumerate(padded):
                ti = 0 if ci == 0 else 1
                qt = qts[ti if not gray else 0]
                block = _C @ p[by: by + 8, bx: bx + 8] @ _C.T
                q = np.round(block / qt).astype(np.int64)
                zz = q.flatten()[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                cat = _category(diff)
                code, ln = dc_codes[ti][cat]
                bw.put(code, ln)
                if cat:
                    bw.put(_amplitude(diff, cat), cat)
                run = 0
                last_nz = np.nonzero(zz[1:])[0]
                last = int(last_nz[-1]) + 1 if len(last_nz) else 0
                for i in range(1, last + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[ti][0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    cat = _category(v)
                    code, ln = ac_codes[ti][(run << 4) | cat]
                    bw.put(code, ln)
                    bw.put(_amplitude(v, cat), cat)
                    run = 0
                if last < 63:
                    code, ln = ac_codes[ti][0x00]  # EOB
                    bw.put(code, ln)
    data = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    for i, qt in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(qt.flatten()[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, ti])  # id, 1x1 sampling, qt id
    out += seg(0xC0, sof)
    for cls, (bits, vals), tid in (
        (0, _DC_LUM, 0), (1, _AC_LUM, 0), (0, _DC_CHR, 1), (1, _AC_CHR, 1),
    )[: 2 if gray else 4]:
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader with FF00 unstuffing and RST awareness."""

    def __init__(self, b: bytes, pos: int) -> None:
        self.b = b
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.b
        if self.pos >= len(b):
            raise ValueError("truncated JPEG entropy stream")
        v = b[self.pos]
        if v == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached: feed 1-bits (the decoder loop detects the
                # marker itself via at_marker())
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker {nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | v
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def at_marker(self) -> int | None:
        """The next marker byte if the stream sits at one (bit-aligned
        padding consumed), else None."""
        if self.nbits:
            return None
        if self.pos + 1 < len(self.b) and self.b[self.pos] == 0xFF:
            nxt = self.b[self.pos + 1]
            if nxt != 0x00:
                return nxt
        return None

    def sync_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        if self.b[self.pos] != 0xFF or not (0xD0 <= self.b[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (H, W) or (H, W, 3)."""
    try:
        return _decode_jpeg(b)
    except (IndexError, struct.error) as e:  # cut-off segment/stream
        raise ValueError(f"truncated or corrupt JPEG: {e}") from e


def _decode_jpeg(b: bytes) -> np.ndarray:
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart = 0
    coefs = None  # progressive: per-component coefficient accumulators
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("corrupt marker stream")
        while b[pos + 1] == 0xFF and pos + 2 < len(b):
            pos += 1
        marker = b[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        body = b[pos + 4: pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            q = 0
            while q < len(body):
                prec, tid = body[q] >> 4, body[q] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[q + 1: q + 65], np.uint8)
                qts[tid] = tbl.reshape(8, 8)
                q += 65
        elif marker == 0xC4:  # DHT
            q = 0
            while q < len(body):
                cls, tid = body[q] >> 4, body[q] & 0xF
                bits = list(body[q + 1: q + 17])
                n = sum(bits)
                vals = list(body[q + 17: q + 17 + n])
                huff[(cls, tid)] = _build_decoder(bits, vals)
                q += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + ci * 3: 9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame type SOF marker {marker:#x} "
                "(arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xD9:  # EOI
            break
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            order = []
            for si in range(ns):
                cid, tt = body[1 + si * 2: 3 + si * 2]
                scan[cid] = (tt >> 4, tt & 0xF)
                order.append(cid)
            br = _BitReader(b, pos + 2 + seg_len)
            if not frame.get("progressive"):
                return _decode_scan(frame, scan, qts, huff, br, restart)
            # progressive: accumulate this scan's coefficients, continue
            # the marker walk from wherever the entropy segment ended
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ab = body[3 + 2 * ns]
            if coefs is None:
                coefs = _init_prog_coefs(frame)
            _prog_scan(frame, order, scan, huff, br, restart, coefs,
                       ss, se, ab >> 4, ab & 0xF)
            pos = br.pos
            continue
        pos += 2 + seg_len
    if frame is not None and frame.get("progressive") and coefs is not None:
        return _reconstruct_prog(frame, coefs, qts)
    raise ValueError("JPEG has no scan")


def _decode_scan(frame, scan, qts, huff, br, restart) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and n_mcu and n_mcu % restart == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                dc_t = huff[(0, scan[c["id"]][0])]
                ac_t = huff[(1, scan[c["id"]][1])]
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        cat = _decode_huff(br, dc_t)
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_t)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(rs & 0xF), rs & 0xF)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = zz * qt.flatten()[ZIGZAG]
                        px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0: y0 + 8, x0: x0 + 8] = px
    return _planes_to_image(planes, comps, hmax, vmax, h, w)


def _planes_to_image(planes, comps, hmax, vmax, h, w) -> np.ndarray:
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:  # nearest upsample
            p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    rgb = np.stack([r, g, bch], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive DCT (SOF2) — T.81 G.2: spectral selection + successive
# approximation. Scans accumulate into per-component coefficient arrays
# (zigzag order); reconstruction is one vectorized dequant + IDCT.
# ---------------------------------------------------------------------------

def _prog_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _init_prog_coefs(frame) -> list[np.ndarray]:
    _, _, mcus_x, mcus_y = _prog_geometry(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]


def _ni_grid(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid of one component (T.81 A.2.2): blocks
    cover ceil(x·h/hmax) × ceil(y·v/vmax) samples, NOT the MCU-padded
    plane."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8  # (block rows, block cols)


def _prog_scan(frame, order, scan, huff, br, restart, coefs,
               ss, se, ah, al) -> None:
    comps = frame["comps"]
    members = []
    for cid in order:
        for ci, c in enumerate(comps):
            if c["id"] == cid:
                members.append((ci, c))
    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        if len(members) > 1:
            _prog_dc_interleaved(frame, members, scan, huff, br, restart,
                                 coefs, ah, al)
        else:
            _prog_dc_single(frame, members[0], scan, huff, br, restart,
                            coefs, ah, al)
    else:  # AC scan: exactly one component, non-interleaved
        if len(members) != 1:
            raise ValueError("interleaved AC scan in progressive JPEG")
        _prog_ac(frame, members[0], scan, huff, br, restart, coefs,
                 ss, se, ah, al)


def _prog_dc_interleaved(frame, members, scan, huff, br, restart, coefs,
                         ah, al) -> None:
    _, _, mcus_x, mcus_y = _prog_geometry(frame)
    pred = {ci: 0 for ci, _ in members}
    n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and n and n % restart == 0:
                br.sync_restart()
                pred = {ci: 0 for ci, _ in members}
            n += 1
            for ci, c in members:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        _dc_unit(br, huff, scan, c, coefs[ci], row, col,
                                 pred, ci, ah, al)


def _prog_dc_single(frame, member, scan, huff, br, restart, coefs,
                    ah, al) -> None:
    ci, c = member
    bh, bw = _ni_grid(frame, c)
    pred = {ci: 0}
    n = 0
    for row in range(bh):
        for col in range(bw):
            if restart and n and n % restart == 0:
                br.sync_restart()
                pred = {ci: 0}
            n += 1
            _dc_unit(br, huff, scan, c, coefs[ci], row, col, pred, ci,
                     ah, al)


def _dc_unit(br, huff, scan, c, arr, row, col, pred, ci, ah, al) -> None:
    if ah == 0:  # first scan: diff-coded, point-transformed values
        dc_t = huff[(0, scan[c["id"]][0])]
        cat = _decode_huff(br, dc_t)
        diff = _extend(br.bits(cat), cat) if cat else 0
        pred[ci] += diff
        arr[row, col, 0] = pred[ci] << al
    else:  # refinement: one bit per block at position Al
        if br.bit():
            arr[row, col, 0] |= 1 << al


def _prog_ac(frame, member, scan, huff, br, restart, coefs,
             ss, se, ah, al) -> None:
    ci, c = member
    ac_t = huff[(1, scan[c["id"]][1])]
    bh, bw = _ni_grid(frame, c)
    arr = coefs[ci]
    eobrun = 0
    n = 0
    for row in range(bh):
        for col in range(bw):
            if restart and n and n % restart == 0:
                br.sync_restart()
                eobrun = 0
            n += 1
            blk = arr[row, col]
            if ah == 0:
                eobrun = _ac_first_block(br, ac_t, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, ac_t, blk, ss, se, al, eobrun)


def _ac_first_block(br, ac_t, blk, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits(r) all-EOB blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, ac_t, blk, ss, se, al, eobrun) -> int:
    """T.81 G.2 AC successive-approximation refinement: correction bits
    for already-nonzero coefficients ride inline; new coefficients
    appear as ±1<<Al."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, ac_t)
            r, s = rs >> 4, rs & 0xF
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement symbol")
                s_val = p1 if br.bit() else m1
            # advance over r zero-history coefficients, reading a
            # correction bit at every nonzero-history one passed
            while k <= se:
                if blk[k] != 0:
                    if br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                blk[k] = s_val
            k += 1
    if eobrun > 0:
        # EOB region: correction bits for the remaining nonzero-history
        # coefficients of THIS block, then the run covers later blocks
        while k <= se:
            if blk[k] != 0 and br.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_prog(frame, coefs, qts) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax, _, _ = _prog_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        arr = coefs[ci]  # (bh, bw, 64) zigzag order
        qt_zz = qts[c["tq"]].flatten()[ZIGZAG].astype(np.float64)
        deq = arr.astype(np.float64) * qt_zz
        bh, bw = arr.shape[:2]
        nat = np.zeros((bh, bw, 64))
        nat[..., ZIGZAG] = deq
        blocks = nat.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,rcjk,kl->rcil", _C.T, blocks, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_image(planes, comps, hmax, vmax, h, w)


# ---------------------------------------------------------------------------
# progressive encoder (fixture/test side — the web's producers are real
# libjpeg/mozjpeg). Classic ten-scan script; EOB runs capped at 1 so the
# standard Annex K Huffman tables stay sufficient (they carry EOB=0x00
# but not the EOBn symbols 0x10..0xE0).
# ---------------------------------------------------------------------------

def _quantize_components(img: np.ndarray, quality: int):
    """Forward path shared with the baseline encoder's math: pad, level
    shift, 8x8 DCT, quantize; returns zigzag-ordered int coefficient
    grids per component."""
    if img.dtype != np.uint8:
        raise ValueError("8-bit images only")
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    if gray:
        comps = [img.reshape(h, w).astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = (-0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
              + 0.5 * rgb[..., 2] + 128)
        cr = (0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
              - 0.081312 * rgb[..., 2] + 128)
        comps = [y, cb, cr]
    qts = [_quality_scale(_LUM_QT, quality).reshape(8, 8)]
    if not gray:
        qts.append(_quality_scale(_CHR_QT, quality).reshape(8, 8))
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = []
    for ci, cpl in enumerate(comps):
        p = np.empty((ph, pw))
        p[:h, :w] = cpl
        p[h:, :w] = cpl[h - 1: h, :]
        p[:, w:] = p[:, w - 1: w]
        p -= 128.0
        bh, bw = ph // 8, pw // 8
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ij,rcjk,kl->rcil", _C, blocks, _C.T)
        qt = qts[0 if (gray or ci == 0) else 1]
        q = np.round(dct / qt).astype(np.int32)
        out.append(q.reshape(bh, bw, 64)[..., ZIGZAG])
    return gray, h, w, out, qts


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → progressive (SOF2) JPEG
    bytes — spectral selection + successive approximation, 4:4:4,
    standard Huffman tables. Decodes to EXACTLY the pixels the baseline
    encoding of the same image decodes to (same quantized coefficients,
    different scan order on the wire)."""
    gray, h, w, comps_zz, qts = _quantize_components(img, quality)
    ncomp = 1 if gray else 3
    dc_codes = [_build_codes(*_DC_LUM), _build_codes(*_DC_CHR)]
    ac_codes = [_build_codes(*_AC_LUM), _build_codes(*_AC_CHR)]

    # (component list, Ss, Se, Ah, Al) — the classic libjpeg-shaped script
    if gray:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for i, qt in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(qt.flatten()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, ti])
    out += seg(0xC2, sof)
    for cls, (bits, vals), tid in (
        (0, _DC_LUM, 0), (1, _AC_LUM, 0), (0, _DC_CHR, 1), (1, _AC_CHR, 1),
    )[: 2 if gray else 4]:
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    for comp_ids, ss, se, ah, al in script:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            ti = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (ti << 4) | ti])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw_ = _BitWriter()
        if ss == 0:
            _enc_dc_scan(bw_, comps_zz, comp_ids, gray, dc_codes, ah, al)
        else:
            _enc_ac_scan(bw_, comps_zz[comp_ids[0]],
                         ac_codes[0 if comp_ids[0] == 0 else 1],
                         ss, se, ah, al)
        out += bw_.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _enc_dc_scan(bw_, comps_zz, comp_ids, gray, dc_codes, ah, al) -> None:
    # all components share one (4:4:4) block grid here, so the MCU walk
    # is the grid walk with one block per component per MCU
    bh, bwid = comps_zz[0].shape[:2]
    pred = {ci: 0 for ci in comp_ids}
    for row in range(bh):
        for col in range(bwid):
            for ci in comp_ids:
                dc = int(comps_zz[ci][row, col, 0])
                if ah == 0:  # first: diff-code the point-transformed DC
                    v = dc >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    cat = _category(diff)
                    code, ln = dc_codes[0 if ci == 0 else 1][cat]
                    bw_.put(code, ln)
                    if cat:
                        bw_.put(_amplitude(diff, cat), cat)
                else:  # refinement: emit bit Al of each DC
                    bw_.put((dc >> al) & 1, 1)


def _enc_ac_scan(bw_, comp_zz, codes, ss, se, ah, al) -> None:
    bh, bwid = comp_zz.shape[:2]
    for row in range(bh):
        for col in range(bwid):
            blk = comp_zz[row, col]
            if ah == 0:
                _enc_ac_first_block(bw_, blk, ss, se, al, codes)
            else:
                _enc_ac_refine_block(bw_, blk, ss, se, al, codes)


def _enc_ac_first_block(bw_, blk, ss, se, al, codes) -> None:
    r = 0
    for k in range(ss, se + 1):
        t = int(blk[k])
        t2 = (t if t >= 0 else -t) >> al
        if t2 == 0:
            r += 1
            continue
        while r > 15:
            code, ln = codes[0xF0]
            bw_.put(code, ln)
            r -= 16
        v = t2 if t >= 0 else -t2
        cat = t2.bit_length()
        code, ln = codes[(r << 4) | cat]
        bw_.put(code, ln)
        bw_.put(_amplitude(v, cat), cat)
        r = 0
    if r:  # EOB (run capped at 1: plain 0x00, no EOBn symbols needed)
        code, ln = codes[0x00]
        bw_.put(code, ln)


def _enc_ac_refine_block(bw_, blk, ss, se, al, codes) -> None:
    absv = {}
    eob = 0
    for k in range(ss, se + 1):
        t = int(blk[k])
        t = (t if t >= 0 else -t) >> al
        absv[k] = t
        if t == 1:
            eob = k  # last NEWLY-nonzero coefficient
    r = 0
    pending: list[int] = []  # buffered correction bits

    def flush_bits():
        for b in pending:
            bw_.put(b, 1)
        pending.clear()

    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            code, ln = codes[0xF0]
            bw_.put(code, ln)
            r -= 16
            flush_bits()
        if t > 1:  # history-nonzero: buffer its correction bit
            pending.append(t & 1)
            continue
        # newly nonzero: (run, 1) symbol + sign bit + buffered bits
        code, ln = codes[(r << 4) | 1]
        bw_.put(code, ln)
        bw_.put(1 if int(blk[k]) >= 0 else 0, 1)
        flush_bits()
        r = 0
    if r > 0 or pending:  # EOB covers the tail; corrections ride after it
        code, ln = codes[0x00]
        bw_.put(code, ln)
        flush_bits()
