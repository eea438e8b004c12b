"""ctypes binding to the SYSTEM libtiff — interop oracle for the
from-scratch TIFF codec (functions/tiff.py), the same role
webp_native.py plays for the VP8L codec (VERDICT r4 #10: cross-gate the
self-encoded codecs against a reference implementation on fuzzed
payloads; skip cleanly when the lib is absent).

File-based (TIFFOpen on a private temp file) rather than TIFFClientOpen:
the memory-stream callbacks need a compiled shim, and this binding only
serves tests/benchmarks. TIFFGetField/TIFFSetField are variadic — C
default-argument promotion makes plain ints correct for both the uint16
and uint32 tags used here."""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np

# TIFF tag / value constants (TIFF 6.0 spec)
_TAG_IMAGEWIDTH = 256
_TAG_IMAGELENGTH = 257
_TAG_BITSPERSAMPLE = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_SAMPLESPERPIXEL = 277
_TAG_ROWSPERSTRIP = 278
_TAG_PLANARCONFIG = 284
_COMPRESSION = {"none": 1, "lzw": 5, "packbits": 32773}
_PHOTOMETRIC_RGB = 2
_ORIENTATION_TOPLEFT = 1

_lib: "ctypes.CDLL | None | bool" = None


def _load():
    global _lib
    if _lib is None:
        _lib = False
        for name in ("libtiff.so.6", "libtiff.so.5", ctypes.util.find_library("tiff")):
            if not name:
                continue
            try:
                lib = ctypes.CDLL(name)
                lib.TIFFOpen.restype = ctypes.c_void_p
                lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
                lib.TIFFClose.argtypes = [ctypes.c_void_p]
                lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
                lib.TIFFReadRGBAImageOriented.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_uint32,
                    ctypes.c_uint32,
                    ctypes.c_void_p,
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.TIFFWriteEncodedStrip.restype = ctypes.c_int64
                lib.TIFFWriteEncodedStrip.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_uint32,
                    ctypes.c_void_p,
                    ctypes.c_int64,
                ]
                # silence libtiff's stderr chatter (handlers return void*)
                lib.TIFFSetErrorHandler.restype = ctypes.c_void_p
                lib.TIFFSetErrorHandler.argtypes = [ctypes.c_void_p]
                lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
                lib.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
                lib.TIFFSetErrorHandler(None)
                lib.TIFFSetWarningHandler(None)
                _lib = lib
                break
            except (OSError, AttributeError):
                continue
    return _lib or None


def available() -> bool:
    return _load() is not None


def decode_rgb(payload: bytes) -> np.ndarray:
    """System-libtiff decode → (h, w, 3) uint8 RGB, top-left orientation."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libtiff not available")
    fd, path = tempfile.mkstemp(suffix=".tif")
    try:
        os.write(fd, payload)
        os.close(fd)
        tif = lib.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise ValueError("libtiff could not open payload")
        try:
            w = ctypes.c_uint32(0)
            h = ctypes.c_uint32(0)
            lib.TIFFGetField(ctypes.c_void_p(tif), _TAG_IMAGEWIDTH, ctypes.byref(w))
            lib.TIFFGetField(ctypes.c_void_p(tif), _TAG_IMAGELENGTH, ctypes.byref(h))
            if not (w.value and h.value):
                raise ValueError("libtiff: zero dimensions")
            raster = np.empty(h.value * w.value, dtype=np.uint32)
            ok = lib.TIFFReadRGBAImageOriented(
                tif,
                w.value,
                h.value,
                raster.ctypes.data_as(ctypes.c_void_p),
                _ORIENTATION_TOPLEFT,
                1,
            )
            if not ok:
                raise ValueError("libtiff decode failed")
            # packed ABGR words: little-endian byte view is [R, G, B, A]
            rgba = raster.view(np.uint8).reshape(h.value, w.value, 4)
            return np.ascontiguousarray(rgba[:, :, :3])
        finally:
            lib.TIFFClose(tif)
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def encode_rgb(arr: np.ndarray, compression: str = "lzw") -> bytes:
    """System-libtiff encode of a (h, w, 3) uint8 RGB raster (single strip,
    chunky planar) — the reference encodes our decoder must read back."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libtiff not available")
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
    h, w, _ = arr.shape
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        tif = lib.TIFFOpen(path.encode(), b"w")
        if not tif:
            raise ValueError("libtiff could not open temp file for write")
        try:
            tp = ctypes.c_void_p(tif)
            lib.TIFFSetField(tp, _TAG_IMAGEWIDTH, w)
            lib.TIFFSetField(tp, _TAG_IMAGELENGTH, h)
            lib.TIFFSetField(tp, _TAG_BITSPERSAMPLE, 8)
            lib.TIFFSetField(tp, _TAG_SAMPLESPERPIXEL, 3)
            lib.TIFFSetField(tp, _TAG_PHOTOMETRIC, _PHOTOMETRIC_RGB)
            lib.TIFFSetField(tp, _TAG_PLANARCONFIG, 1)
            lib.TIFFSetField(tp, _TAG_ROWSPERSTRIP, h)
            lib.TIFFSetField(tp, _TAG_COMPRESSION, _COMPRESSION[compression])
            raw = np.ascontiguousarray(arr)
            n = lib.TIFFWriteEncodedStrip(
                tif,
                0,
                raw.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(raw.nbytes),
            )
            if n < 0:
                raise ValueError("libtiff encode failed")
        finally:
            lib.TIFFClose(tif)
        with open(path, "rb") as f:
            return f.read()
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass
