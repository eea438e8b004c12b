"""ctypes binding to the system libwebp, when present — the lossy-VP8 path.

The pure-python VP8L codec (functions/webp.py) covers lossless WebP from
scratch; lossy VP8 interop needs RFC 6386's large default probability /
dequant tables, which cannot be re-derived — so lossy decode binds the
public libwebp C library (already on this image as libwebp.so.7) through
stdlib ctypes, with NO import-time hard dependency: when the library is
absent, ``available()`` is False and callers fall through to the PIL/fake
path exactly like the other unsupported codec modes (the reference gets
the same formats through PIL, utils/image_util.py:23-107).

A second job of this module is INTEROP GATES for the from-scratch VP8L
codec: tests round-trip our encoder's output through libwebp's decoder and
libwebp's lossless encoder's output through our decoder (bit-exact both
ways), which validates the pure-python implementation against the format's
reference implementation rather than only against itself.

Simple one-shot API only (WebPDecodeRGB / WebPEncodeRGB /
WebPEncodeLosslessRGB / WebPFree); every returned buffer is copied into
numpy/bytes and freed immediately.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib: "ctypes.CDLL | None | bool" = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGB.restype = u8p
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(u8p),
        ]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(u8p),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
    _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def decode_rgb(payload: bytes) -> np.ndarray:
    """Decode any WebP payload (lossy VP8 or lossless VP8L, VP8X containers
    included) -> uint8 (h, w, 3) via libwebp. Raises ValueError when the
    library is absent or the payload is rejected."""
    lib = _load()
    if not lib:
        raise ValueError("webp: libwebp not available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(payload, len(payload), ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("webp: libwebp rejected header")
    if w.value * h.value > 1 << 26:
        raise ValueError("webp: image too large")
    buf = lib.WebPDecodeRGB(payload, len(payload), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise ValueError("webp: libwebp decode failed")
    try:
        n = h.value * w.value * 3
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.WebPFree(buf)
    return arr.reshape(h.value, w.value, 3)


def _as_rgb_bytes(arr: np.ndarray) -> tuple[bytes, int, int]:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("webp: expected (h, w[, 3]) uint8 array")
    h, w = a.shape[:2]
    return np.ascontiguousarray(a).tobytes(), w, h


def encode_rgb(arr: np.ndarray, quality: float = 85.0) -> bytes:
    """Encode uint8 (h, w, 3) (or grayscale (h, w)) to LOSSY VP8 WebP."""
    lib = _load()
    if not lib:
        raise ValueError("webp: libwebp not available")
    data, w, h = _as_rgb_bytes(arr)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(data, w, h, w * 3, float(quality), ctypes.byref(out))
    if not size or not out:
        raise ValueError("webp: libwebp encode failed")
    try:
        payload = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)
    return payload


def encode_lossless_rgb(arr: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 3) (or grayscale) to LOSSLESS WebP via libwebp —
    used only by the interop gates for the pure-python VP8L decoder."""
    lib = _load()
    if not lib:
        raise ValueError("webp: libwebp not available")
    data, w, h = _as_rgb_bytes(arr)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGB(data, w, h, w * 3, ctypes.byref(out))
    if not size or not out:
        raise ValueError("webp: libwebp encode failed")
    try:
        payload = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)
    return payload
