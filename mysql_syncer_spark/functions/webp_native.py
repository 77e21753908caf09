"""ctypes binding to the system libwebp — the production decode path for
LOSSY VP8 WebP.

The pure-Python codec (``webp_codec.py``) implements VP8L lossless
end-to-end but honestly refuses lossy VP8 (boolean arithmetic coding
plus ~2,000 RFC 6386 probability-table constants that cannot be
transcribed reliably from memory; a subtly-wrong table would decode our
own fixtures while silently mis-decoding real files — worse than
raising). libwebp is the reference implementation (public, BSD,
``libwebp.so.7`` is part of this container's base image), so when it is
loadable we bind its 4-call simple API via ctypes and lossy WebP
decodes for real; when it is not, every entry point here raises
``NotImplementedError`` and the pure-Python lossless path keeps working
unchanged — same gating pattern as the optional PIL fallback.

Reference parity note (MySQL-Syncer has no media path; this module
serves the multimodal corpus columns): the encoder half exists for
fixtures and for CROSS-VALIDATING the pure-Python VP8L codec against a
reference implementation — libwebp-encoded lossless streams exercise
the decoder branches our own minimal encoder never emits (LZ77 refs,
color cache, meta prefix-code groups, predictor/cross-color
transforms), and our encoder's output must survive the reference
decoder byte-for-byte (``tests/test_webp_native.py``).

Executor-side use: the CDLL handle is created lazily per process, so
``mapInPandas`` workers each load the library once; calls release the
GIL inside libwebp, and the output buffer is copied into numpy then
freed with ``WebPFree`` (no ownership leaks across the ctypes edge).
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache

import numpy as np

_SONAMES = ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL | None:
    names = []
    found = ctypes.util.find_library("webp")
    if found:
        names.append(found)
    names.extend(_SONAMES)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            _bind(lib)
        except AttributeError:  # a libwebp too old for the simple API
            continue
        return lib
    return None


def _bind(lib: ctypes.CDLL) -> None:
    """Declare argtypes/restypes once; raises AttributeError if the
    library lacks the simple one-shot API (libwebp < 0.2)."""
    c_ubyte_p = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPGetInfo.argtypes = [
        c_ubyte_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPGetInfo.restype = ctypes.c_int
    lib.WebPDecodeRGBA.argtypes = [
        c_ubyte_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeRGBA.restype = c_ubyte_p
    lib.WebPEncodeRGB.argtypes = [
        c_ubyte_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(c_ubyte_p),
    ]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = lib.WebPEncodeRGB.argtypes
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        c_ubyte_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(c_ubyte_p),
    ]
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = lib.WebPEncodeLosslessRGB.argtypes
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    lib.WebPFree.restype = None


def available() -> bool:
    """True when a usable system libwebp is loadable in this process."""
    return _lib() is not None


def _require() -> ctypes.CDLL:
    lib = _lib()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not loadable; lossy VP8 WebP needs it "
            "(pure-Python VP8L lossless keeps working without)"
        )
    return lib


def _as_ubyte_p(b: bytes) -> ctypes.POINTER(ctypes.c_ubyte):
    # zero-copy view of the caller's bytes: libwebp only READS the buffer
    # and every call site keeps ``b`` alive for the call's duration, so
    # the previous create_string_buffer copy (a full extra copy of each
    # media blob per decode on the executor hot path) is unnecessary
    return ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_ubyte))


def webp_info(b: bytes) -> tuple[int, int]:
    """RIFF bytes → (width, height) via WebPGetInfo (any WebP flavor)."""
    lib = _require()
    b = bytes(b)
    w, h = ctypes.c_int(), ctypes.c_int()
    if not lib.WebPGetInfo(_as_ubyte_p(b), len(b), ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("libwebp: not a decodable WebP stream")
    return w.value, h.value


def decode_rgba(b: bytes) -> np.ndarray:
    """Full WebP RIFF bytes → uint8 (h, w, 4) RGBA. Decodes every flavor
    the system libwebp supports: lossy VP8, lossless VP8L, extended
    VP8X (alpha, but not animation)."""
    lib = _require()
    b = bytes(b)
    w, h = ctypes.c_int(), ctypes.c_int()
    out = lib.WebPDecodeRGBA(_as_ubyte_p(b), len(b), ctypes.byref(w), ctypes.byref(h))
    if not out:
        raise ValueError("libwebp: decode failed (corrupt or unsupported stream)")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def _encode(fn, img: np.ndarray, channels: int, quality: float | None) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != channels:
        raise ValueError(f"expected (h, w, {channels}) uint8 image")
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_ubyte)()
    src = img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    stride = w * channels
    if quality is None:
        size = fn(src, w, h, stride, ctypes.byref(out))
    else:
        size = fn(src, w, h, stride, ctypes.c_float(quality), ctypes.byref(out))
    if not size:
        raise ValueError("libwebp: encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _lib().WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_rgb(img: np.ndarray, quality: float = 90.0) -> bytes:
    """uint8 (h, w, 3) → lossy VP8 WebP bytes (fixture/test encoder)."""
    return _encode(_require().WebPEncodeRGB, img, 3, quality)


def encode_rgba(img: np.ndarray, quality: float = 90.0) -> bytes:
    """uint8 (h, w, 4) → lossy VP8+ALPH WebP bytes."""
    return _encode(_require().WebPEncodeRGBA, img, 4, quality)


def encode_lossless_rgb(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → lossless VP8L WebP bytes — the reference
    encoder the pure-Python VP8L decoder is cross-validated against."""
    return _encode(_require().WebPEncodeLosslessRGB, img, 3, None)


def encode_lossless_rgba(img: np.ndarray) -> bytes:
    """uint8 (h, w, 4) → lossless VP8L WebP bytes (alpha kept)."""
    return _encode(_require().WebPEncodeLosslessRGBA, img, 4, None)
