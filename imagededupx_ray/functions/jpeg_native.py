"""Compiled ctypes shim over the SYSTEM libjpeg — interop oracle for the
from-scratch JPEG codec (functions/jpeg.py), the webp_native.py role for
the JPEG family (VERDICT r4 #10). A ~60-line C shim is compiled once per
node against jpeglib.h (the jpeg_(de)compress structs are ABI-version-
sized, so a header-compiled shim is the only robust ctypes route) and
loaded via the same content-addressed /tmp cache discipline as
functions/native.py; absent header/lib/compiler → available() is False
and the cross-gates skip cleanly.

Exposes:
- decode_rgb(payload) — libjpeg decode to (h, w, 3|1) uint8
- encode(arr, quality, progressive) — libjpeg encode (baseline or
  jpeg_simple_progression progressive), the reference encodes our decoder
  must read back
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SOURCE = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct err_mgr { struct jpeg_error_mgr pub; jmp_buf jb; };

static void err_exit(j_common_ptr cinfo) {
    struct err_mgr* e = (struct err_mgr*)cinfo->err;
    longjmp(e->jb, 1);
}

int xdecode_jpeg(const unsigned char* buf, unsigned long len,
                 unsigned char** out, int* w, int* h, int* comps) {
    struct jpeg_decompress_struct c; struct err_mgr jerr;
    unsigned char* data = NULL;
    c.err = jpeg_std_error(&jerr.pub); jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&c); free(data); return -1; }
    jpeg_create_decompress(&c);
    jpeg_mem_src(&c, buf, len);
    jpeg_read_header(&c, TRUE);
    jpeg_start_decompress(&c);
    {
        int W = c.output_width, H = c.output_height, C = c.output_components;
        data = (unsigned char*)malloc((size_t)W * H * C);
        if (!data) { jpeg_destroy_decompress(&c); return -2; }
        while (c.output_scanline < c.output_height) {
            unsigned char* row = data + (size_t)c.output_scanline * W * C;
            jpeg_read_scanlines(&c, &row, 1);
        }
        jpeg_finish_decompress(&c); jpeg_destroy_decompress(&c);
        *out = data; *w = W; *h = H; *comps = C;
    }
    return 0;
}

int xencode_jpeg(const unsigned char* pix, int w, int h, int comps,
                 int quality, int progressive,
                 unsigned char** out, unsigned long* outlen) {
    struct jpeg_compress_struct c; struct err_mgr jerr;
    unsigned char* mem = NULL; unsigned long memlen = 0;
    c.err = jpeg_std_error(&jerr.pub); jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.jb)) { jpeg_destroy_compress(&c); free(mem); return -1; }
    jpeg_create_compress(&c);
    jpeg_mem_dest(&c, &mem, &memlen);
    c.image_width = (JDIMENSION)w; c.image_height = (JDIMENSION)h;
    c.input_components = comps;
    c.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    if (progressive) jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        const unsigned char* row = pix + (size_t)c.next_scanline * w * comps;
        jpeg_write_scanlines(&c, (JSAMPARRAY)&row, 1);
    }
    jpeg_finish_compress(&c); jpeg_destroy_compress(&c);
    *out = mem; *outlen = memlen;
    return 0;
}

void xfree(void* p) { free(p); }
"""

_lib: "ctypes.CDLL | None | bool" = None


def _build_and_load():
    src_hash = hashlib.blake2b(_SOURCE.encode(), digest_size=8).hexdigest()
    cache_dir = os.path.join(tempfile.gettempdir(), f"imagededupx_native_{os.getuid()}")
    so_path = os.path.join(cache_dir, f"jpegio_{src_hash}.so")
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    st = os.stat(cache_dir)
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        return None  # squatted or group/world-writable — refuse (native.py rule)
    if not os.path.exists(so_path):
        if not os.path.exists("/usr/include/jpeglib.h"):
            return None
        c_path = os.path.join(cache_dir, f"jpegio_{src_hash}.c")
        with open(c_path, "w") as f:
            f.write(_SOURCE)
        fd, tmp_so = tempfile.mkstemp(suffix=".so", dir=cache_dir)
        os.close(fd)
        try:
            subprocess.run(
                ["cc", "-O2", "-fPIC", "-shared", "-o", tmp_so, c_path, "-ljpeg"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.rename(tmp_so, so_path)
        except (subprocess.SubprocessError, OSError):
            if os.path.exists(tmp_so):
                os.unlink(tmp_so)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.xdecode_jpeg.restype = ctypes.c_int
    lib.xdecode_jpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.c_ulong,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.xencode_jpeg.restype = ctypes.c_int
    lib.xencode_jpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_ulong),
    ]
    lib.xfree.restype = None
    lib.xfree.argtypes = [ctypes.c_void_p]
    return lib


def _load():
    global _lib
    if _lib is None:
        _lib = _build_and_load() or False
    return _lib or None


def available() -> bool:
    return _load() is not None


def decode_rgb(payload: bytes) -> np.ndarray:
    """System-libjpeg decode → (h, w, 3) RGB or (h, w) grayscale uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libjpeg not available")
    out = ctypes.c_void_p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    comps = ctypes.c_int()
    rc = lib.xdecode_jpeg(
        payload, len(payload), ctypes.byref(out),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(comps),
    )
    if rc != 0:
        raise ValueError(f"libjpeg decode failed (rc={rc})")
    try:
        n = w.value * h.value * comps.value
        arr = np.ctypeslib.as_array(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), shape=(n,)
        ).copy()
    finally:
        lib.xfree(out)
    if comps.value == 1:
        return arr.reshape(h.value, w.value)
    return arr.reshape(h.value, w.value, comps.value)


def encode(arr: np.ndarray, quality: int = 85, progressive: bool = False) -> bytes:
    """System-libjpeg encode of a uint8 raster ((h, w) gray or (h, w, 3)
    RGB); ``progressive`` uses jpeg_simple_progression — coefficient-
    identical to the baseline encode at the same settings."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libjpeg not available")
    assert arr.dtype == np.uint8 and arr.ndim in (2, 3)
    comps = 1 if arr.ndim == 2 else arr.shape[2]
    assert comps in (1, 3)
    h, w = arr.shape[:2]
    raw = np.ascontiguousarray(arr).tobytes()
    out = ctypes.c_void_p()
    outlen = ctypes.c_ulong()
    rc = lib.xencode_jpeg(
        raw, w, h, comps, int(quality), int(bool(progressive)),
        ctypes.byref(out), ctypes.byref(outlen),
    )
    if rc != 0:
        raise ValueError(f"libjpeg encode failed (rc={rc})")
    try:
        return ctypes.string_at(out, outlen.value)
    finally:
        lib.xfree(out)
