"""Pure-python GIF codec (GIF87a/89a, CompuServe spec): LZW entropy
coding with variable code width, global/local color tables, interlacing,
Graphic Control Extensions, multi-frame animations — a REAL format (any
browser opens the output), same no-external-libs approach as the PNG
(png_codec.py), JPEG (jpeg_codec.py) and AVI (avi_codec.py) codecs.

Encode emits grayscale frames against a 256-entry gray global color
table (pixel value == palette index, so the roundtrip is lossless) with
a GCE delay per frame for animations. Decode handles arbitrary palettes,
local color tables, interlaced images, transparency indices (composited
over the prior frame — disposal method "do not dispose", the common web
case), and returns RGB frames.

Like the other codecs this exists for the multimodal decode OPERATOR:
the Spark-side plumbing (mapInPandas batching, schema, partitioning) is
what must scale; per-image LZW is embarrassingly parallel inside the
Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIG = b"GIF8"  # followed by "7a" or "9a"


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for px in indices.tobytes():
        cand = prefix + bytes([px])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:  # table full: reset (decoder mirrors on the clear code)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([px])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _sub_blocks(body: bytes) -> bytes:
    """Split ``body`` into ≤255-byte length-prefixed sub-blocks + 0 end."""
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        ln = b[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += b[pos : pos + ln]
        pos += ln


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(frames: np.ndarray, delay_cs: int = 10) -> bytes:
    """uint8 (h, w) or (n, h, w) grayscale → GIF bytes. Single frame →
    GIF87a still; multiple → GIF89a animation with ``delay_cs``
    (1/100 s) Graphic Control Extensions. The 256-gray global palette
    makes pixel value == palette index (lossless roundtrip)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    animated = n > 1
    out = bytearray(b"GIF89a" if animated else b"GIF87a")
    # logical screen: GCT present, 8-bit color resolution, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    gray = np.arange(256, dtype=np.uint8)
    out += np.repeat(gray, 3).tobytes()  # 768-byte gray GCT
    for i in range(n):
        if animated:
            # GCE: disposal=1 (do not dispose), no transparency
            out += b"\x21\xf9" + _sub_blocks(
                struct.pack("<BHB", 0x04, delay_cs, 0)
            )
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # descriptor
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(frames[i].reshape(-1), 8))
    out.append(0x3B)  # trailer
    return bytes(out)


def gif_meta(b: bytes) -> tuple[int, int, int, int]:
    """Header probe without LZW decode: → (w, h, n_frames, gct_entries).
    Walks block structure (skipping image data sub-blocks by length) —
    O(blocks), not O(pixels)."""
    b = bytes(b)
    if b[:4] != GIF_SIG or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    w, h, packed = struct.unpack_from("<HHB", b, 6)
    pos = 13
    gct = 2 << (packed & 0x07) if packed & 0x80 else 0
    pos += 3 * gct
    n_frames = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _read_sub_blocks(b, pos)
        elif block == 0x2C:
            n_frames += 1
            ipacked = b[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            _, pos = _read_sub_blocks(b, pos)
        else:
            raise ValueError(f"corrupt GIF block 0x{block:02x}")
    return int(w), int(h), n_frames, gct


def decode_gif(b: bytes) -> np.ndarray:
    """GIF bytes → uint8 (n, h, w, 3) RGB frames, composited on the
    logical screen (transparent pixels keep the prior frame's value —
    disposal "do not dispose", the common web-animation case)."""
    b = bytes(b)
    if b[:4] != GIF_SIG or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, 3 * ncol, offset=pos).reshape(-1, 3)
        pos += 3 * ncol
    canvas = np.zeros((h, w), dtype=np.uint8)
    if gct is not None:
        canvas[:] = bg
    frames: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = b[pos]
            pos += 1
            body, pos = _read_sub_blocks(b, pos)
            if label == 0xF9 and len(body) >= 4:  # GCE
                flags, _delay, tindex = struct.unpack_from("<BHB", body, 0)
                transparent = tindex if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        palette = gct
        if ipacked & 0x80:  # local color table
            ncol = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                b, np.uint8, 3 * ncol, offset=pos
            ).reshape(-1, 3)
            pos += 3 * ncol
        if palette is None:
            raise ValueError("GIF image has no color table")
        min_code = b[pos]
        pos += 1
        data, pos = _read_sub_blocks(b, pos)
        idx = _lzw_decode(data, min_code, iw * ih)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            # rows[y] = which TRANSMITTED row lands on display row y
            rows = np.empty(ih, dtype=np.int64)
            r = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, ih, step):
                    rows[y] = r
                    r += 1
            idx = idx.reshape(ih, iw)[rows]
        else:
            idx = idx.reshape(ih, iw)
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            region[:] = np.where(idx == transparent, region, idx)
        else:
            region[:] = idx
        transparent = None  # GCE applies to one image only
        frames.append(palette[canvas].copy())
    if not frames:
        raise ValueError("GIF has no image descriptors")
    return np.stack(frames)
