"""Pure numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

No PIL/libjpeg exists in this container; this implements the baseline
subset the web's dominant image format actually uses: 8-bit samples,
Huffman entropy coding (standard Annex K tables on encode; ANY tables on
decode), grayscale or YCbCr color, arbitrary chroma sampling factors on
decode (4:4:4 / 4:2:2 / 4:2:0 with nearest-neighbor upsampling), restart
markers, FF00 byte stuffing. Progressive (SOF2) and arithmetic coding
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
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + ci * 3: 9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            for si in range(ns):
                cid, tt = body[1 + si * 2: 3 + si * 2]
                scan[cid] = (tt >> 4, tt & 0xF)
            br = _BitReader(b, pos + 2 + seg_len)
            return _decode_scan(frame, scan, qts, huff, br, restart)
        pos += 2 + seg_len
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
