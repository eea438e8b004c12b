"""Dependency-free GIF decoder (stdlib + numpy only).

Completes the web-image codec set next to functions/png.py and
functions/jpeg.py (the reference's multi-format loader,
/root/reference/similarities/similarities/utils/image_util.py:23-107,
accepts GIF through PIL). Implements the public GIF87a/GIF89a
specification: logical screen descriptor, global/local color tables,
interlaced and non-interlaced image descriptors, variable-code-size LZW
decompression, and the GIF89a graphic-control transparency flag. Decodes
the FIRST frame (the dedup-relevant one for thumbnail/preview dup mining);
animation would iterate the same block parser.

decode_gif: bytes -> uint8 (h, w, 3) RGB array.
encode_gif: uint8 array -> bytes, palette-quantized only in the trivial
            sense (<=256 distinct colors required) — the test-vector
            generator for the decoder's LZW/interlace paths.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """Variable-width LZW with CLEAR/EOI codes (GIF Appendix F)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: LSB-first across the concatenated sub-block bytes
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8)[:, None], axis=1, bitorder="little"
    ).reshape(-1)
    pos = 0
    nbits = len(bits)

    def read_code(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            return eoi
        v = 0
        for i in range(width):
            v |= int(bits[pos + i]) << i
        pos += width
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while len(out) < max_pixels:
        code = read_code(width)
        if code == eoi:
            break
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: invalid LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:max_pixels]), dtype=np.uint8)


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    """GIF 4-pass interlace → sequential row order."""
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = data[pos]
                flags = data[pos + 1]
                if flags & 0x01:
                    transparent = data[pos + 4]
                pos += 1 + size
            while data[pos] != 0:  # skip remaining sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("gif: no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), w * h)
            if len(idx) < w * h:
                idx = np.pad(idx, (0, w * h - len(idx)))
            idx = idx.reshape(h, w)
            if ipacked & 0x40:
                idx = _deinterlace(idx, h)
            rgb = ct[np.minimum(idx, len(ct) - 1)]
            if transparent is not None and gct is not None:
                # composite transparent pixels over the background color
                rgb = np.where(
                    (idx == transparent)[:, :, None], gct[min(bg, len(gct) - 1)], rgb
                )
            return rgb.astype(np.uint8)
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    raise ValueError("gif: no image data")


def _lzw_encode(min_code_size: int, idx: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    out_bits: list[tuple[int, int]] = [(clear, width)]
    prev = b""
    for px in idx.reshape(-1).tobytes():
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # table full: emit CLEAR, reset
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prev = bytes([px])
    if prev:
        out_bits.append((table[prev], width))
    out_bits.append((eoi, width))
    acc = 0
    nacc = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return bytes(data)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB with <=256 distinct colors →
    GIF89a bytes (the decoder's test-vector generator)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << depth
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    idx = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx_out = idx[order]
    else:
        idx_out = idx
    min_code = max(2, depth)
    lzw = _lzw_encode(min_code, idx_out)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------- BMP
# Uncompressed Windows BMP (BITMAPINFOHEADER, 8/24/32-bit) — the fourth
# stdlib-decodable format in the reference's loader set
# (utils/image_util.py:23-107). Tiny enough to live beside GIF.
BMP_SIGNATURE = b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 8-bit-palette / 24-bit / 32-bit BMP → uint8 RGB."""
    if data[:2] != BMP_SIGNATURE:
        raise ValueError("bmp: missing BM signature")
    (offset,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h = struct.unpack("<IiI", data[14:26])
    # height sign encodes row order; planes/bpp follow
    h_signed = struct.unpack("<i", data[22:26])[0]
    bpp, compression = struct.unpack("<HI", data[28:34])
    if compression != 0:
        raise ValueError("bmp: only uncompressed (BI_RGB) supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 8:
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data[pal_off : pal_off + 1024], dtype=np.uint8).reshape(
            -1, 4
        )[:, :3][:, ::-1]  # BGRA -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            data[offset : offset + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        rgb = pal[rows]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(
            data[offset : offset + stride * h], dtype=np.uint8
        ).reshape(h, stride)
        px = rows[:, : w * nb].reshape(h, w, nb)
        rgb = px[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB
    else:
        raise ValueError(f"bmp: unsupported bpp {bpp}")
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → 24-bit uncompressed BMP."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix
