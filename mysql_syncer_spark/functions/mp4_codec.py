"""Pure-struct MP4 / ISO-BMFF container codec (ISO/IEC 14496-12/-14) —
the dominant web-video container. Same no-video-libs approach as the AVI
(avi_codec.py), PNG, and JPEG codecs: real bytes any player/ffprobe
opens.

Encoder writes Motion-JPEG-in-MP4 the way ffmpeg's movenc does
(``-c:v mjpeg out.mp4``): a ``vide`` track whose sample description is an
``mp4v`` VisualSampleEntry carrying an ``esds`` DecoderConfigDescriptor
with objectTypeIndication 0x6C (JPEG, per the MP4RA object-type
registry) — every sample an independent baseline JPEG (jpeg_codec.py).
Box layout: ``ftyp`` + ``mdat`` (samples) + trailing ``moov`` with the
full sample tables (stsd/stts/stsc/stsz/stco).

Decoder is a generic box walker: it handles 64-bit ``largesize`` boxes,
``co64``, multi-sample ``stsc`` runs, and both MJPEG flavours
(``mp4v``+OTI 0x6C and the QuickTime-style ``jpeg`` sample entry).
Compressed inter-frame codecs (``avc1``/``hev1``/``vp09``...) are
honestly out of scope: ``parse_mp4_meta_and_offsets`` still returns
their geometry/fps/sample table (the metadata probe), and
``read_mp4_frame`` raises ``NotImplementedError`` so callers fall back
to metadata-only, mirroring the lossy-WebP/progressive-JPEG policy.
"""

from __future__ import annotations

import struct

import numpy as np

_SUPPORTED_JPEG_ENTRIES = {b"mp4v", b"jpeg"}


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _desc(tag: int, body: bytes) -> bytes:
    """MPEG-4 descriptor with the expandable length field (all ours are
    < 128 bytes, one length byte)."""
    assert len(body) < 128
    return bytes([tag, len(body)]) + body


def _esds_jpeg() -> bytes:
    """ES_Descriptor → DecoderConfig(OTI=0x6C JPEG, streamType=visual) →
    SLConfig(2), the esds ffmpeg writes for mjpeg-in-mp4."""
    dec_cfg = _desc(
        0x04,
        bytes([0x6C, (0x04 << 2) | 1])  # OTI jpeg; visual, reserved=1
        + b"\x00\x00\x00"               # bufferSizeDB
        + struct.pack(">II", 0, 0),     # max/avg bitrate (unknown)
    )
    sl_cfg = _desc(0x06, b"\x02")
    es = _desc(0x03, struct.pack(">HB", 1, 0) + dec_cfg + sl_cfg)
    return _full(b"esds", 0, 0, es)


def encode_mp4(frames: np.ndarray, fps: int, quality: int = 90) -> bytes:
    """frames: (n, h, w) uint8 grayscale → MP4 bytes (MJPEG samples).

    moov is written last (ffmpeg's default layout), so sample offsets in
    ``stco`` are known after ``ftyp``+``mdat`` are laid out."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    from .jpeg_codec import encode_jpeg

    samples = [encode_jpeg(frames[i], quality) for i in range(n)]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    # absolute file offsets of each sample (one sample per chunk)
    base = len(ftyp) + 8
    offs, acc = [], base
    for s in samples:
        offs.append(acc)
        acc += len(s)

    mv_timescale = 1000
    duration_mv = n * mv_timescale // fps

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, mv_timescale, duration_mv)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + _MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 3,  # enabled | in_movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration_mv)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        # media timescale = fps, one tick per frame (stts delta 1)
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"mp4v",
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + struct.pack(">HHII", 0, 0, 0, 0) + b"\x00" * 4
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32                                 # compressorname
        + struct.pack(">Hh", 24, -1)
        + _esds_jpeg(),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(b: bytes, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each box in [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        size = struct.unpack_from(">I", b, pos)[0]
        fourcc = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = hi - pos
        if size < 8 or pos + size > hi:
            raise ValueError("corrupt MP4 box at offset %d" % pos)
        yield fourcc, body, pos + size
        pos += size


def _find(b: bytes, lo: int, hi: int, fourcc: bytes):
    for fc, blo, bhi in _walk(b, lo, hi):
        if fc == fourcc:
            return blo, bhi
    return None


def _esds_oti(b: bytes, lo: int, hi: int) -> int | None:
    """objectTypeIndication out of an esds box body (skip the expandable
    length fields, which may be multi-byte)."""
    pos = lo + 4  # version/flags

    def read_desc(p):
        tag = b[p]
        p += 1
        ln, n = 0, 0
        while True:
            c = b[p]
            p += 1
            ln = (ln << 7) | (c & 0x7F)
            n += 1
            if not (c & 0x80) or n == 4:
                break
        return tag, p, ln

    tag, p, ln = read_desc(pos)
    if tag != 0x03:
        return None
    p += 3  # ES_ID + flags (no optional fields when flags==0)
    tag, p, ln = read_desc(p)
    if tag != 0x04:
        return None
    return b[p]


def parse_mp4_meta_and_offsets(b: bytes) -> dict:
    """MP4 bytes → {w, h, fps, n_frames, codec, supported,
    offsets: [(abs_off, size), ...]} from the first video track's sample
    tables. O(header) — never touches mdat. ``supported`` is True only
    for MJPEG flavours this repo can decode to pixels; callers use the
    rest as the metadata probe for foreign codecs."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    moov = _find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    out: dict = {}
    for fc, lo, hi in _walk(b, *moov):
        if fc != b"trak":
            continue
        mdia = _find(b, lo, hi, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(b, *mdia, b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(b, lo, hi, b"tkhd")
        if tkhd is not None:
            tlo, thi = tkhd
            ver = b[tlo]
            geo = thi - 8
            out["w"] = struct.unpack_from(">I", b, geo)[0] >> 16
            out["h"] = struct.unpack_from(">I", b, geo + 4)[0] >> 16
        mdhd = _find(b, *mdia, b"mdhd")
        mlo = mdhd[0]
        ver = b[mlo]
        timescale = struct.unpack_from(
            ">I", b, mlo + (20 if ver == 1 else 12)
        )[0]
        minf = _find(b, *mdia, b"minf")
        stbl = _find(b, *minf, b"stbl")
        # stsd: codec fourcc (+ esds OTI for mp4v)
        stsd = _find(b, *stbl, b"stsd")
        slo = stsd[0] + 8  # version/flags + entry_count
        entry_fc = b[slo + 4 : slo + 8]
        codec = entry_fc.decode("latin-1").strip()
        supported = entry_fc in _SUPPORTED_JPEG_ENTRIES
        if entry_fc == b"mp4v":
            # VisualSampleEntry fixed part is 78 bytes; esds follows
            esds = _find(b, slo + 8 + 78, stsd[1], b"esds")
            oti = _esds_oti(b, *esds) if esds else None
            supported = oti == 0x6C
            codec = f"mp4v/{oti:#04x}" if oti is not None else "mp4v"
        # stts → dominant sample delta → fps
        stts = _find(b, *stbl, b"stts")
        n_ent = struct.unpack_from(">I", b, stts[0] + 4)[0]
        total = best_n = 0
        delta = 1
        for i in range(n_ent):
            cnt, dl = struct.unpack_from(">II", b, stts[0] + 8 + 8 * i)
            total += cnt
            if cnt > best_n:
                best_n, delta = cnt, dl
        fps = timescale / max(delta, 1)
        # stsz → sizes
        stsz = _find(b, *stbl, b"stsz")
        fixed, n_samples = struct.unpack_from(">II", b, stsz[0] + 4)
        if fixed:
            sizes = [fixed] * n_samples
        else:
            sizes = list(
                struct.unpack_from(">%dI" % n_samples, b, stsz[0] + 12)
            )
        # stco/co64 → chunk offsets; stsc → samples-per-chunk runs
        stco = _find(b, *stbl, b"stco")
        if stco is not None:
            n_ch = struct.unpack_from(">I", b, stco[0] + 4)[0]
            chunk_offs = list(
                struct.unpack_from(">%dI" % n_ch, b, stco[0] + 8)
            )
        else:
            co64 = _find(b, *stbl, b"co64")
            n_ch = struct.unpack_from(">I", b, co64[0] + 4)[0]
            chunk_offs = list(
                struct.unpack_from(">%dQ" % n_ch, b, co64[0] + 8)
            )
        stsc = _find(b, *stbl, b"stsc")
        n_runs = struct.unpack_from(">I", b, stsc[0] + 4)[0]
        runs = [
            struct.unpack_from(">III", b, stsc[0] + 8 + 12 * i)
            for i in range(n_runs)
        ]
        # expand runs → samples per chunk, walk chunks accumulating sizes
        offsets: list[tuple[int, int]] = []
        si = 0
        for ri, (first, per_chunk, _sd) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_ch
            for ci in range(first - 1, last):
                pos = chunk_offs[ci]
                for _ in range(per_chunk):
                    if si >= n_samples:
                        break
                    offsets.append((pos, sizes[si]))
                    pos += sizes[si]
                    si += 1
        out.update(
            fps=fps, n_frames=n_samples, codec=codec,
            supported=supported, offsets=offsets,
        )
        return out
    raise ValueError("no video track")


def read_mp4_frame(b: bytes, off: int, size: int, meta: dict) -> np.ndarray:
    """Decode one sample to grayscale pixels. Raises NotImplementedError
    for non-MJPEG codecs (caller falls back to the metadata probe)."""
    if not meta.get("supported"):
        raise NotImplementedError(
            f"MP4 codec {meta.get('codec')!r} not decodable here "
            "(MJPEG mp4v/0x6c and 'jpeg' sample entries supported)"
        )
    from .jpeg_codec import decode_jpeg

    img = decode_jpeg(bytes(b[off : off + size]))
    if img.ndim == 3:  # luma of an RGB JPEG
        img = np.round(
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).astype(np.uint8)
    return img
