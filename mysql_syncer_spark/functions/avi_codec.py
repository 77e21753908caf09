"""Pure-struct AVI container codec (RIFF 'AVI ': hdrl/avih/strl/strh/strf +
movi frames + idx1) — a REAL format: any media player / ffprobe opens the
output. No video libs needed, same approach as the PNG (png_codec.py) and
WAV (multimodal.encode_wav) codecs.

Two codecs:
- ``DIB`` (default): uncompressed 24-bit frames in '00db' chunks.
  Grayscale is stored as BGR24 with the gray value replicated; DIB rows
  are bottom-up and padded to 4-byte strides per the BITMAPINFOHEADER
  spec.
- ``MJPG``: Motion-JPEG — each frame is an independent baseline JPEG
  stream (jpeg_codec.py, pure numpy) in a '00dc' chunk, biCompression =
  'MJPG'. This is the dominant COMPRESSED intra-frame AVI codec (webcams,
  capture cards); inter-frame codecs (H.264/VP9) stay out of scope.

Decode auto-detects per chunk (JPEG SOI vs raw DIB), so mixed inputs and
either codec parse through the same walk / seek-table path.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(
    frames: np.ndarray, fps: int, codec: str = "DIB", quality: int = 90
) -> bytes:
    """frames: (n, h, w) uint8 grayscale → AVI bytes. ``codec``: ``"DIB"``
    (uncompressed BGR24, '00db' chunks) or ``"MJPG"`` (per-frame baseline
    JPEG at ``quality``, '00dc' chunks)."""
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unsupported AVI codec {codec!r}")
    mjpg = codec == "MJPG"
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    stride = (w * 3 + 3) & ~3

    if mjpg:
        from .jpeg_codec import encode_jpeg

        bodies = [encode_jpeg(frames[i], quality) for i in range(n)]
    else:

        def dib(frame: np.ndarray) -> bytes:
            # bottom-up, gray→BGR
            bgr = np.repeat(frame[::-1, :, None], 3, axis=2)
            row = np.zeros((h, stride), dtype=np.uint8)
            row[:, : w * 3] = bgr.reshape(h, w * 3)
            return row.tobytes()

        bodies = [dib(frames[i]) for i in range(n)]
    frame_size = max((len(x) for x in bodies), default=stride * h)
    chunk_id = b"00dc" if mjpg else b"00db"
    # strh fccHandler + strf biCompression both carry the codec fourcc
    # (biCompression 0 == BI_RGB == raw DIB)
    handler = b"MJPG" if mjpg else b"DIB "
    bi_compression = struct.unpack("<I", b"MJPG")[0] if mjpg else 0

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
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n,
                      frame_size, 0, 0, 0, 0, w, h),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, bi_compression, frame_size,
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = b""
    offsets = []
    for body in bodies:
        offsets.append(len(movi_body) + 4)  # offset from the 'movi' fourcc
        movi_body += _chunk(chunk_id, body)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            chunk_id + struct.pack("<III", 0x10, off, len(body))
            for off, body in zip(offsets, bodies)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _decode_frame_body(
    b: bytes, body: int, clen: int, w: int, h: int
) -> np.ndarray:
    """One movi chunk body → (h, w) uint8 grayscale. Dispatch on content:
    JPEG SOI → jpeg_codec (MJPG; luma plane of a color frame), else raw
    bottom-up BGR24 DIB (B channel)."""
    if b[body : body + 2] == b"\xff\xd8":
        from .jpeg_codec import decode_jpeg

        px = decode_jpeg(b[body : body + clen])
        return px if px.ndim == 2 else px[..., 0].copy()
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(b, np.uint8, stride * h, offset=body)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, 0].copy()  # un-flip, B channel


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
                frames.append(_decode_frame_body(b, body, clen, w, h))
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
    """Decode ONE frame whose chunk data starts at ``data_off`` (DIB or
    MJPG, auto-detected; the chunk length sits in the 4 bytes preceding
    the data, per the RIFF chunk header the seek table pointed past)."""
    (clen,) = struct.unpack_from("<I", b, data_off - 4)
    return _decode_frame_body(b, data_off, clen, w, h)
