"""Pure-struct AVI container codec (RIFF 'AVI ': hdrl/avih/strl/strh/strf +
movi '00db' frames + idx1) with uncompressed 24-bit DIB frames — a REAL
format: any media player / ffprobe opens the output. No video libs needed,
same approach as the PNG (png_codec.py) and WAV (multimodal.encode_wav)
codecs.

Grayscale frames are stored as BGR24 with the gray value replicated across
channels; DIB rows are bottom-up and padded to 4-byte strides per the
BITMAPINFOHEADER spec. Compressed codecs (MJPEG/H.264) stay out of scope —
entropy decode needs a codec lib; the CONTAINER layer here is complete.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """frames: (n, h, w) uint8 grayscale → AVI bytes (BGR24 DIB)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def dib(frame: np.ndarray) -> bytes:
        bgr = np.repeat(frame[::-1, :, None], 3, axis=2)  # bottom-up, gray→BGR
        row = np.zeros((h, stride), dtype=np.uint8)
        row[:, : w * 3] = bgr.reshape(h, w * 3)
        return row.tobytes()

    avih = _chunk(
        b"avih",
        struct.pack(
            "<10I4I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            frame_size * fps,  # dwMaxBytesPerSec
            0,                 # dwPaddingGranularity
            0x10,              # dwFlags: AVIF_HASINDEX
            n, 0, 1,           # total frames, initial frames, streams
            frame_size,        # dwSuggestedBufferSize
            w, h,
            0, 0, 0, 0,        # reserved
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n,
                      frame_size, 0, 0, 0, 0, w, h),
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = b""
    offsets = []
    for i in range(n):
        offsets.append(len(movi_body) + 4)  # offset from the 'movi' fourcc
        movi_body += _chunk(b"00db", dib(frames[i]))
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<III", 0x10, off, frame_size)
            for off in offsets
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """AVI bytes → (w, h, fps, frames (n, h, w) uint8 grayscale: the B
    channel of each BGR24 DIB). Walks RIFF chunks, tolerating unknown
    chunks (JUNK, INFO, extra streams' non-video data are skipped)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI buffer")
    w = h = None
    fps = None
    frames: list[np.ndarray] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, fps
        pos = lo
        while pos + 8 <= hi:
            cid, clen = struct.unpack_from("<4sI", b, pos)
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + clen)  # skip the list-type fourcc
            elif cid == b"avih":
                vals = struct.unpack_from("<10I", b, body)
                w, h = vals[8], vals[9]
            elif cid == b"strh" and b[body : body + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", b, body + 20)
                fps = rate // max(scale, 1)
            elif cid in (b"00db", b"00dc") and w and h:
                stride = (w * 3 + 3) & ~3
                raw = np.frombuffer(b, np.uint8, stride * h, offset=body)
                rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                frames.append(rows[::-1, :, 0].copy())  # un-flip, B channel
            pos = body + clen + (clen & 1)

    walk(12, 8 + struct.unpack_from("<I", b, 4)[0])
    if w is None or fps is None:
        raise ValueError("AVI missing avih/strh headers")
    stack = np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)
    return int(w), int(h), int(fps), stack


def parse_avi_meta_and_offsets(b: bytes) -> tuple[int, int, int, list[int]]:
    """Header probe + frame seek table WITHOUT decoding pixels: reads
    avih/strh for (w, h, fps) and the idx1 index for each frame chunk's
    offset (relative to the 'movi' fourcc). Sampling every Nth frame of a
    long video then decodes ONLY the sampled chunks — O(header + sampled)
    instead of O(all frames)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI buffer")
    w = h = fps = None
    offsets: list[int] = []
    movi_base = None

    pos, end = 12, 8 + struct.unpack_from("<I", b, 4)[0]
    stack = [(pos, end)]
    while stack:
        lo, hi = stack.pop()
        p = lo
        while p + 8 <= hi:
            cid, clen = struct.unpack_from("<4sI", b, p)
            body = p + 8
            if cid == b"LIST":
                if b[body : body + 4] == b"movi":
                    movi_base = body  # offsets in idx1 are movi-relative
                stack.append((body + 4, body + clen))
            elif cid == b"avih":
                vals = struct.unpack_from("<10I", b, body)
                w, h = vals[8], vals[9]
            elif cid == b"strh" and b[body : body + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", b, body + 20)
                fps = rate // max(scale, 1)
            elif cid == b"idx1":
                for off in range(body, body + clen, 16):
                    fourcc, _fl, chunk_off, _sz = struct.unpack_from("<4sIII", b, off)
                    if fourcc in (b"00db", b"00dc"):
                        offsets.append(chunk_off)
            p = body + clen + (clen & 1)
    if w is None or fps is None or movi_base is None:
        raise ValueError("AVI missing avih/strh/movi")
    # idx1 offsets point at each chunk's fourcc, relative to 'movi'
    return int(w), int(h), int(fps), [movi_base + o + 8 for o in offsets]


def read_frame_at(b: bytes, w: int, h: int, data_off: int) -> np.ndarray:
    """Decode ONE BGR24 DIB frame whose data starts at ``data_off``."""
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(b, np.uint8, stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, 0].copy()
