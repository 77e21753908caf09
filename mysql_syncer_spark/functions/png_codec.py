"""Pure numpy+zlib PNG codec — a REAL image format for the multimodal path.

No PIL/ffmpeg exists in this container, but PNG needs neither: the format
is zlib-deflated filtered scanlines inside CRC-framed chunks (PNG spec,
RFC 2083 / W3C PNG). This implements the subset a training-data pipeline
meets most: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace. Decode handles ALL five scanline filters
(None/Sub/Up/Average/Paeth); encode emits filter 0.

``png_meta`` reads width/height/channels from the IHDR chunk alone — an
O(33 bytes) metadata probe that never inflates pixel data, which is what a
100 TB metadata pass wants.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C) with C in {1, 2, 3, 4} → PNG bytes."""
    if img.dtype != np.uint8:
        raise ValueError("8-bit images only")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_meta(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, channels, bit_depth) from IHDR — no pixel inflate."""
    if bytes(b[:8]) != PNG_SIG:
        raise ValueError("not a PNG")
    if b[12:16] != b"IHDR":
        raise ValueError("IHDR not first chunk")
    w, h, depth, ctype = struct.unpack_from(">IIBB", b, 16)
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    return w, h, _CHANNELS[ctype], depth


def _paeth(a: np.ndarray, bb: np.ndarray, cc: np.ndarray) -> np.ndarray:
    a16 = a.astype(np.int16)
    b16 = bb.astype(np.int16)
    c16 = cc.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, bb, cc))
    return out.astype(np.uint8)


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → uint8 (H, W, C). Supports filters 0-4, 8-bit, no
    interlace. The per-scanline un-filter is sequential by spec (each row
    depends on the previous); rows are vectorized where the filter allows
    (Up fully; Sub/Average/Paeth pixel-sequential within the row)."""
    w, h, c, depth = png_meta(b)
    if depth != 8:
        raise ValueError("8-bit depth only")
    # walk chunks, concatenate IDAT
    pos, idat = 8, []
    while pos < len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        tag = bytes(b[pos + 4 : pos + 8])
        if tag == b"IDAT":
            idat.append(bytes(b[pos + 8 : pos + 8 + ln]))
        if tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * c
    if len(raw) != h * stride:
        raise ValueError("corrupt pixel data")
    raw = raw.reshape(h, stride)
    filters, data = raw[:, 0], raw[:, 1:].copy()
    out = np.zeros((h, w * c), dtype=np.uint8)
    bpp = c  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = int(filters[y])
        row = data[y]
        prev = out[y - 1] if y else np.zeros(w * c, dtype=np.uint8)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            acc = row.copy()
            for x in range(bpp, w * c):
                acc[x] = (int(acc[x]) + int(acc[x - bpp])) & 0xFF
            out[y] = acc
        elif f == 2:  # Up
            out[y] = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            acc = np.zeros(w * c, dtype=np.uint8)
            for x in range(w * c):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (int(row[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
            out[y] = acc
        elif f == 4:  # Paeth
            acc = np.zeros(w * c, dtype=np.uint8)
            for x in range(w * c):
                left = acc[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                p = _paeth(
                    np.uint8(left), np.uint8(prev[x]), np.uint8(ul)
                )
                acc[x] = (int(row[x]) + int(p)) & 0xFF
            out[y] = acc
        else:
            raise ValueError(f"unknown filter {f}")
    return out.reshape(h, w, c)
