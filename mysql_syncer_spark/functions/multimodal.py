"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample operators.

The Spark-side plumbing is REAL — schemas, Arrow-batched ``mapInPandas``
operators, partitioning, explode semantics.

Codecs (round 2): **images are REAL PNG** — encoded and decoded by the
pure numpy+zlib codec in ``png_codec.py`` (IHDR metadata probe without
pixel inflate; full decode with all five scanline filters). The legacy
synthetic ``IMG1`` raster remains accepted for old inputs. **Audio is
REAL WAV** (round 3): RIFF/WAVE PCM16 encoded and chunk-walked by
``encode_wav``/``parse_wav`` (pure struct, tolerates extra LIST/fact
chunks); the legacy ``PCM1`` frame stays accepted. **JPEG is REAL
end-to-end** (round 4): ``jpeg_meta`` walks T.81 marker segments to the
SOF frame header, and ``jpeg_codec.py`` is a pure-numpy
Huffman+DCT codec — encode (4:4:4, Annex K tables) AND pixel decode
(any-table baseline, chroma subsampling, restart markers); since round
5 **progressive (SOF2) decodes for real too** — spectral selection +
successive approximation, all four scan kinds, EOB runs — plus a
ten-scan progressive encoder for fixtures. **WebP lossless is REAL end-to-end** (round 5): ``webp_meta``
walks RIFF chunks to VP8/VP8L/VP8X, and ``webp_codec.py`` is a
pure-python VP8L codec — full-featured decode (prefix codes, LZ77,
color cache, meta groups, all four transforms; cross-validated
byte-exact against libwebp both directions) + a literal-subset
encoder; **LOSSY VP8 decodes for real** (round 5) through the system
libwebp via ctypes (``webp_native.py``, gated — raises where no
libwebp is loadable; pure-Python VP8 is impractical: boolean
arithmetic coding plus ~2k RFC 6386 probability constants). **Video is a REAL AVI container**
(round 3): RIFF 'AVI ' (``avi_codec.py`` — hdrl/strl headers, movi
chunks, idx1 index; any player opens it) with uncompressed BGR24 DIB
frames or, since round 4, **MJPG** — per-frame baseline JPEG via the
pure-numpy ``jpeg_codec`` (chunk-level auto-detect on decode).
Inter-frame codecs (H.264/VP9) stay out of scope without a codec lib.
The legacy ``VID1`` frame stays accepted.

Wire formats:
  image: PNG (RFC 2083 subset: 8-bit gray/RGB/RGBA); baseline JPEG;
         GIF87a/89a (LZW, gif_codec.py); WebP VP8L (webp_codec.py) and
         lossy VP8 (webp_native.py, system libwebp); or legacy
         b"IMG1" + u16 w + u16 h + u8 channels + w*h*c payload bytes
  audio: RIFF/WAVE PCM16 mono, or legacy b"PCM1" + u32 sr + s16le samples
  video: RIFF/AVI, uncompressed DIB or MJPG (avi_codec.py); MP4/ISO-BMFF
         with MJPEG samples (mp4_codec.py, round 5 — foreign codecs like
         avc1 parse to metadata with decodable=False); or legacy
         b"VID1" + u16 w + u16 h + u8 fps + u16 n_frames + w*h-byte
         gray frames
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# real codec gates — absent in this container by design
try:  # pragma: no cover
    import PIL.Image as _pil  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ---------------------------------------------------------------------------
# synthetic media generators (seed-deterministic)
# ---------------------------------------------------------------------------


def make_image_bytes(
    media_id: int, w: int = 32, h: int = 24, c: int = 3, fmt: str = "png"
) -> bytes:
    """Deterministic REAL image bytes: PNG (numpy+zlib codec,
    png_codec.py), baseline JPEG (numpy Huffman+DCT codec,
    jpeg_codec.py), GIF (LZW codec, gif_codec.py — grayscale,
    palette pixels surface as RGB on decode), or WebP VP8L
    (webp_codec.py — lossless, subtract-green)."""
    rng = np.random.default_rng(media_id)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    if fmt == "png":
        from .png_codec import encode_png

        return encode_png(img)
    if fmt == "jpeg":
        from .jpeg_codec import encode_jpeg

        return encode_jpeg(img if c != 1 else img[:, :, 0], quality=90)
    if fmt == "jpeg_progressive":  # SOF2 successive approximation
        from .jpeg_codec import encode_jpeg_progressive

        return encode_jpeg_progressive(
            img if c != 1 else img[:, :, 0], quality=90
        )
    if fmt == "gif":
        from .gif_codec import encode_gif

        return encode_gif(img[:, :, 0])
    if fmt == "webp":
        from .webp_codec import encode_webp_lossless

        return encode_webp_lossless(img, subtract_green=True)
    raise ValueError(f"unknown fixture format {fmt!r}")


def encode_wav(samples: np.ndarray, sr: int, n_channels: int = 1) -> bytes:
    """REAL RIFF/WAVE container (PCM16): RIFF header + canonical ``fmt ``
    chunk + ``data`` chunk — any standard audio tool opens the output.
    Pure struct packing, like the PNG codec: no audio libs needed."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sr * n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sr, byte_rate,
        n_channels * 2, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff_len = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data


def parse_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a PCM16 WAV: walk RIFF chunks (tolerating extra chunks like
    LIST/fact before data). Returns (sample_rate, n_channels, samples)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos = 12
    sr = n_channels = bits = None
    pcm = None
    while pos + 8 <= len(b):
        cid, clen = struct.unpack_from("<4sI", b, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, n_channels, sr, _, _, bits = struct.unpack_from(
                "<HHIIHH", b, body
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif cid == b"data":
            pcm = b[body : body + clen]
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(sr), int(n_channels), np.frombuffer(pcm, np.int16)


def make_audio_bytes(media_id: int, sr: int = 16000, seconds: float = 0.25) -> bytes:
    """Deterministic sawtooth PCM16 in a REAL WAV container. The waveform
    is PURE INTEGER arithmetic — unlike a libm sine, every sample is
    exactly reproducible by any engine (the DuckDB oracle rebuilds the
    identical buffer), while still exercising real waveform feature math
    downstream."""
    n = int(sr * seconds)
    i = np.arange(n, dtype=np.int64)
    freq = 220 + (media_id % 24) * 55
    wave = (((i * freq) % sr) * 24000 // sr - 12000).astype(np.int16)
    return encode_wav(wave, sr)


def make_video_bytes(
    media_id: int,
    w: int = 16,
    h: int = 12,
    fps: int = 8,
    n_frames: int = 24,
    codec: str = "DIB",
    container: str = "avi",
) -> bytes:
    """Deterministic REAL video (any player opens it). ``container``:
    ``"avi"`` (RIFF — avi_codec.py) with ``codec="DIB"`` (default,
    uncompressed — what the oracle can reproduce byte-exactly) or
    ``"MJPG"`` (per-frame baseline JPEG; lossy, so tests assert
    tolerance, not byte parity); or ``"mp4"`` (ISO-BMFF — mp4_codec.py,
    MJPEG samples, codec knob ignored)."""
    rng = np.random.default_rng(media_id)
    frames = rng.integers(0, 256, (n_frames, h, w), dtype=np.uint8)
    if container == "mp4":
        from .mp4_codec import encode_mp4

        return encode_mp4(frames, fps)
    from .avi_codec import encode_avi

    return encode_avi(frames, fps, codec=codec)


# ---------------------------------------------------------------------------
# decode operators (mapInPandas — Arrow batches in, typed columns out)
# ---------------------------------------------------------------------------

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

# SOF0..SOF15 carry the frame header; 0xC4/0xC8/0xCC are DHT/JPG/DAC.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_meta(b: bytes) -> tuple[int, int, int]:
    """Metadata probe for REAL JPEG files (ITU T.81 §B.2): walk the marker
    segments from SOI to the first SOF frame header and read precision-free
    (height, width, n_components). Handles fill bytes, standalone markers
    (RST/TEM), and both baseline (SOF0) and progressive (SOF2) frames —
    i.e. any camera/web JPEG. Entropy decode is NOT attempted (no DCT lib
    in this container); only the header is read, so the probe is O(header)
    regardless of image size — the right cost model for a 100 TB scan."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, n = 2, len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        while b[pos + 1] == 0xFF and pos + 2 < n:  # fill bytes
            pos += 1
        marker = b[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        if marker in _JPEG_SOF:
            _precision, h, w, ncomp = struct.unpack_from(">BHHB", b, pos + 4)
            return w, h, ncomp
        if marker == 0xDA:  # SOS: entropy data follows; SOF must precede it
            break
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOF frame header")


def webp_meta(b: bytes) -> tuple[int, int, int]:
    """Metadata probe for REAL WebP files: RIFF chunk walk to the first of
    VP8 (lossy: 14-bit dims after the 9D 01 2A sync code), VP8L (lossless:
    0x2F signature then 14+14-bit minus-one dims + alpha flag), or VP8X
    (extended: 24-bit minus-one canvas + alpha flag). Pixel decode is not
    attempted (arithmetic/Huffman coding needs a codec lib)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    pos = 12
    while pos + 8 <= len(b):
        cid, clen = struct.unpack_from("<4sI", b, pos)
        body = pos + 8
        if cid == b"VP8 " and b[body + 3 : body + 6] == b"\x9d\x01\x2a":
            w, h = struct.unpack_from("<HH", b, body + 6)
            return w & 0x3FFF, h & 0x3FFF, 3
        if cid == b"VP8L" and b[body] == 0x2F:
            (bits,) = struct.unpack_from("<I", b, body + 1)
            alpha = (bits >> 28) & 1
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, 4 if alpha else 3
        if cid == b"VP8X":
            flags = b[body]
            w = int.from_bytes(b[body + 4 : body + 7], "little") + 1
            h = int.from_bytes(b[body + 7 : body + 10], "little") + 1
            return w, h, 4 if flags & 0x10 else 3
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("WebP missing VP8/VP8L/VP8X chunk")


def _decode_image_header(b: bytes) -> tuple[int, int, int]:
    from .png_codec import PNG_SIG, png_meta

    b = bytes(b)
    if b[:8] == PNG_SIG:
        w, h, c, _ = png_meta(b)  # IHDR probe — no pixel inflate
        return w, h, c
    if b[:2] == b"\xff\xd8":  # real JPEG — marker walk to SOF
        return jpeg_meta(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":  # real WebP
        return webp_meta(b)
    if b[:4] == b"GIF8":  # real GIF — block walk, no LZW decode
        from .gif_codec import gif_meta

        w, h, _n_frames, _gct = gif_meta(b)
        return w, h, 3  # palette pixels surface as RGB
    if b[:4] == b"IMG1":  # legacy synthetic raster
        w, h, c = struct.unpack_from("<HHB", b, 4)
        return w, h, c
    raise ValueError(
        "unknown image format (PNG/JPEG/GIF/WebP/IMG1 supported)"
    )


def _decode_image_pixels(b: bytes) -> np.ndarray:
    from .png_codec import PNG_SIG, decode_png

    b = bytes(b)
    if b[:8] == PNG_SIG:
        return decode_png(b)
    if b[:4] == b"IMG1":
        w, h, c = struct.unpack_from("<HHB", b, 4)
        return np.frombuffer(b, np.uint8, w * h * c, offset=9).reshape(h, w, c)
    if b[:2] == b"\xff\xd8":  # real JPEG — pure-numpy baseline decoder
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(b)  # baseline AND progressive (SOF2)
    if b[:4] == b"GIF8":  # real GIF — LZW decode, first frame as RGB
        from .gif_codec import decode_gif

        return decode_gif(b)[0]
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from .webp_codec import decode_webp

        try:
            return decode_webp(b)  # real VP8L decode, pure python
        except NotImplementedError:
            if HAVE_PIL:  # pragma: no cover — lossy VP8 needs a codec lib
                import io

                return np.asarray(_pil.open(io.BytesIO(b)))
            raise
    raise ValueError(
        "unknown image format (PNG/JPEG/GIF/WebP/IMG1 supported)"
    )


def decode_image_meta(df: DataFrame, bytes_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """→ (id, width, height, channels, n_bytes)."""
    schema = T.StructType(
        [df.schema[id_col]] + list(IMAGE_META.fields)
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[bytes_col]:
                w, h, c = _decode_image_header(b)
                metas.append((w, h, c, len(b)))
            out = pd.DataFrame(metas, columns=["width", "height", "channels", "n_bytes"])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(mapper, schema=schema)


def resize_image(
    df: DataFrame, out_w: int, out_h: int, bytes_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Nearest-neighbor resize on the synthetic raster (numpy fancy-indexing
    per image — real math, stub codec). → (id, media resized, width, height).
    """
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("media", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png_codec import encode_png

        for pdf in batches:
            out_rows = []
            for b in pdf[bytes_col]:
                img = _decode_image_pixels(b)
                h, w = img.shape[:2]
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = img[ys][:, xs]
                out_rows.append(encode_png(small))
            out = pd.DataFrame({"media": out_rows})
            out.insert(0, id_col, pdf[id_col].values)
            out["width"] = out_w
            out["height"] = out_h
            yield out

    return df.mapInPandas(mapper, schema=schema)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_features(df: DataFrame, bytes_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """PCM feature extraction — real numpy math over the sample buffer."""
    schema = T.StructType([df.schema[id_col]] + list(AUDIO_FEATURES.fields))

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bytes_col]:
                b = bytes(b)
                if b[:4] == b"RIFF":  # real WAV container
                    sr, _, samples = parse_wav(b)
                elif b[:4] == b"PCM1":  # legacy synthetic frames
                    (sr,) = struct.unpack_from("<I", b, 4)
                    samples = np.frombuffer(b, np.int16, offset=8)
                else:
                    raise ValueError("unknown audio format (WAV/PCM1 supported)")
                rows.append(
                    (
                        sr,
                        len(samples),
                        round(len(samples) / sr, 6),
                        round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), 4),
                        int(np.abs(samples).max()) if len(samples) else 0,
                    )
                )
            out = pd.DataFrame(
                rows, columns=["sample_rate", "n_samples", "duration_s", "rms", "peak"]
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(mapper, schema=schema)


def sample_video_frames(
    df: DataFrame, every_n: int = 4, bytes_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Frame sampling: one OUTPUT ROW per sampled frame (explode semantics
    via mapInPandas yielding more rows than in). → (id, frame_idx, ts_s,
    frame bytes)."""
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_s", T.DoubleType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi_codec import parse_avi_meta_and_offsets, read_frame_at
        from .mp4_codec import parse_mp4_meta_and_offsets, read_mp4_frame

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(b)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":  # real container
                    # idx1 seek table: decode ONLY the sampled frames —
                    # O(header + sampled), not O(all frames)
                    w, h, fps, offs = parse_avi_meta_and_offsets(b)
                    for i in range(0, len(offs), every_n):
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(round(i / fps, 6))
                        frames.append(read_frame_at(b, w, h, offs[i]).tobytes())
                    continue
                if len(b) >= 12 and b[4:8] == b"ftyp":  # ISO-BMFF / MP4
                    # stco/stsz sample table: same O(header + sampled)
                    meta = parse_mp4_meta_and_offsets(b)
                    for i in range(0, meta["n_frames"], every_n):
                        off, size = meta["offsets"][i]
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(round(i / meta["fps"], 6))
                        frames.append(
                            read_mp4_frame(b, off, size, meta).tobytes()
                        )
                    continue
                if b[:4] != b"VID1":
                    raise ValueError(
                        "unknown video format (AVI/MP4/VID1 supported)"
                    )
                w, h, fps, n_frames = struct.unpack_from("<HHBH", b, 4)
                fsz = w * h
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(round(i / fps, 6))
                    off = 11 + i * fsz
                    frames.append(b[off : off + fsz])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "ts_s": tss, "frame": frames}
            )

    return df.mapInPandas(mapper, schema=schema)


VIDEO_META = T.StructType(
    [
        T.StructField("container", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decodable", T.BooleanType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def video_meta(
    df: DataFrame, bytes_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Container probe WITHOUT pixel decode: geometry/fps/frame count/
    codec for AVI (RIFF walk), MP4 (ISO-BMFF sample tables — including
    foreign codecs like avc1, where ``decodable=False`` and the caller
    keeps the metadata row instead of failing), and legacy VID1. This is
    the fallback path for inter-frame codecs this repo honestly cannot
    decode, mirroring the lossy-WebP policy."""
    schema = T.StructType([df.schema[id_col], *VIDEO_META.fields])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi_codec import parse_avi_meta_and_offsets
        from .mp4_codec import parse_mp4_meta_and_offsets

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(b)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    w, h, fps, offs = parse_avi_meta_and_offsets(b)
                    # chunk-level sniff: MJPG frames start with JPEG SOI
                    mjpg = bool(offs) and b[offs[0] : offs[0] + 2] == b"\xff\xd8"
                    rows.append(
                        (mid, "avi", "MJPG" if mjpg else "DIB", w, h,
                         float(fps), len(offs), True, len(b))
                    )
                elif len(b) >= 12 and b[4:8] == b"ftyp":
                    m = parse_mp4_meta_and_offsets(b)
                    rows.append(
                        (mid, "mp4", m["codec"], m["w"], m["h"],
                         float(m["fps"]), m["n_frames"],
                         bool(m["supported"]), len(b))
                    )
                elif b[:4] == b"VID1":
                    w, h, fps, n = struct.unpack_from("<HHBH", b, 4)
                    rows.append(
                        (mid, "vid1", "RAW", w, h, float(fps), n, True, len(b))
                    )
                else:
                    raise ValueError("unknown video format (AVI/MP4/VID1)")
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(mapper, schema=schema)
