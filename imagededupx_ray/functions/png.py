"""Dependency-free PNG codec (stdlib zlib + numpy only).

The reference's namesake input is encoded image files decoded through PIL
(/root/reference/improved_faiss_detector.py:145-257 extract pipeline,
/root/reference/similarities/similarities/utils/image_util.py:23-107
multi-format loader). This container ships no image libraries, but PNG needs
none: the format is zlib-compressed filtered scanlines (RFC 2083 / the public
PNG specification). This module implements the baseline subset —
non-interlaced, bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), all five scanline filters — which covers what the
standard encoders emit, so the perceptual-hash pipeline runs on GENUINE
encoded images rather than pre-decoded rasters.

decode_png: bytes → uint8 ndarray (h, w[, channels]).
encode_png: uint8 ndarray → bytes (filter 0 or a fixed per-row filter — the
            test vector generator for the decoder's filter paths).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters. raw is (h, 1 + stride) — filter byte +
    filtered bytes per row. Returns (h, stride) reconstructed bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: rec[x] = line[x] + rec[x-bpp] — per-lane prefix sum
            rec = line.copy()
            # cumulative along the row with stride bpp: pad to a multiple,
            # reshape (n_px, bpp), cumsum mod 256 down the pixel axis
            n_px = (stride + bpp - 1) // bpp
            pad = n_px * bpp - stride
            lanes = np.concatenate([rec, np.zeros(pad, np.int32)]).reshape(n_px, bpp)
            rec = (np.cumsum(lanes, axis=0) % 256).reshape(-1)[:stride]
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average — sequential along the row
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth — sequential along the row
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for grayscale, else (h, w, channels).
    Palette images resolve through PLTE to (h, w, 3)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    plte = None
    idat = []
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(payload)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rec = _unfilter(raw.reshape(height, stride + 1), height, stride, ch)
    img = rec.reshape(height, width, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
        ch = 3
    return img[:, :, 0] if ch == 1 else img


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) or (h, w, 3/4) → PNG bytes. ``filter_type`` applies
    the same filter to every scanline (0/1/2/3/4) — nonzero values exist to
    generate decoder test vectors for every filter path."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    rows = []
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = flat[y]
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = (line - left) % 256
        elif filter_type == 2:
            filt = (line - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = (line - (left + prev) // 2) % 256
        elif filter_type == 4:
            filt = np.zeros(stride, np.int32)
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                filt[x] = (line[x] - _paeth(int(left), int(prev[x]), int(ul))) % 256
        else:
            raise ValueError(f"unknown filter {filter_type}")
        rows.append(bytes([filter_type]) + bytes(filt.astype(np.uint8)))
        prev = line
    payload = zlib.compress(b"".join(rows), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )
