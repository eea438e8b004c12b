"""Dependency-free baseline TIFF decoder/encoder (stdlib + numpy only).

Extends the web-image codec set (functions/png.py, jpeg.py, gif.py) with
the TIFF container the reference accepts through PIL
(/root/reference/similarities/similarities/utils/image_util.py:23-107).
Implements the public TIFF 6.0 baseline specification: both byte orders
(II/MM), IFD tag directory, strip-based storage (StripOffsets /
StripByteCounts / RowsPerStrip), BitsPerSample 8, PhotometricInterpretation
0/1 (grayscale, incl. WhiteIsZero inversion) and 2 (RGB, with packed or
planar configuration), and the three baseline compressions: 1 (none),
5 (LZW, MSB-first variable-width codes with the early-change convention),
and 32773 (PackBits). Tiled TIFFs, 16-bit samples, and palette color raise
ValueError so callers fall through to the fake-decode path exactly like
progressive JPEG does (stages/multimodal.py).

decode_tiff: bytes -> uint8 (h, w, 3) RGB (or (h, w) replicated gray -> RGB).
encode_tiff: uint8 array -> bytes; compression in {"none", "packbits",
             "lzw"} — the test-vector generator for the decoder paths.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_SIGNATURES = (b"II*\x00", b"MM\x00*")

# baseline tag ids
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_TILE_WIDTH = 322

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("tiff: truncated IFD offset")
    (n_tags,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("tiff: truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * cnt
        off = base + 8 if total <= 4 else struct.unpack_from(bo + "I", data, base + 8)[0]
        if off + total > len(data):
            raise ValueError("tiff: tag value out of bounds")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            tags[tag] = []
            continue
        tags[tag] = list(struct.unpack_from(bo + fmt * cnt, data, off))
    return tags


def _packbits_decode(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        h = src[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += src[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("tiff: packbits truncated")
            out += bytes([src[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: packbits underrun")
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF LZW (spec section 13): MSB-first bit order, 9->12 bit codes,
    code width bumps ONE CODE EARLY (the 'early change' convention every
    mainstream writer uses), CLEAR=256, EOI=257."""
    CLEAR, EOI = 256, 257
    bits = np.unpackbits(np.frombuffer(src, dtype=np.uint8))
    nbits = len(bits)
    pos = 0
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None

    while len(out) < expected and pos + width <= nbits:
        code = 0
        for i in range(width):
            code = (code << 1) | int(bits[pos + i])
        pos += width
        if code == EOI:
            break
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: lzw bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: lzw code out of range")
        out += entry
        prev = entry
        # early change: bump width when the NEXT added code would overflow
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("tiff: lzw underrun")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    if len(data) < 8 or data[:4] not in TIFF_SIGNATURES:
        raise ValueError("tiff: bad signature")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    if _T_TILE_WIDTH in tags:
        raise ValueError("tiff: tiled layout not supported")
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except (KeyError, IndexError) as e:
        raise ValueError("tiff: missing required tag") from e
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [8])
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    if any(b != 8 for b in bits):
        raise ValueError("tiff: only 8-bit samples supported")
    if photo not in (0, 1, 2) or spp not in (1, 3):
        raise ValueError("tiff: unsupported photometric/spp")
    if comp not in (1, 5, 32773):
        raise ValueError("tiff: unsupported compression")
    if len(offsets) != len(counts):
        raise ValueError("tiff: strip tables disagree")

    def strips() -> bytes:
        parts = []
        rows_done = 0
        per_plane_rows = h if planar != 2 else h * spp
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(data):
                raise ValueError("tiff: strip out of bounds")
            n_rows = min(rps, per_plane_rows - rows_done)
            row_bytes = w * (spp if planar != 2 else 1)
            expected = n_rows * row_bytes
            raw = data[off : off + cnt]
            if comp == 1:
                if len(raw) < expected:
                    raise ValueError("tiff: strip underrun")
                parts.append(raw[:expected])
            elif comp == 32773:
                parts.append(_packbits_decode(raw, expected))
            else:
                parts.append(_lzw_decode(raw, expected))
            rows_done += n_rows
            if rows_done >= per_plane_rows:
                rows_done = 0
        return b"".join(parts)

    flat = np.frombuffer(strips(), dtype=np.uint8)
    if spp == 1:
        if len(flat) < h * w:
            raise ValueError("tiff: pixel underrun")
        img = flat[: h * w].reshape(h, w)
        if photo == 0:  # WhiteIsZero
            img = 255 - img
        return np.repeat(img[:, :, None], 3, axis=2).copy()
    if planar == 2:  # separate R, G, B planes
        if len(flat) < 3 * h * w:
            raise ValueError("tiff: pixel underrun")
        planes = flat[: 3 * h * w].reshape(3, h, w)
        return np.moveaxis(planes, 0, 2).copy()
    if len(flat) < h * w * 3:
        raise ValueError("tiff: pixel underrun")
    return flat[: h * w * 3].reshape(h, w, 3).copy()


def _packbits_encode(row: bytes) -> bytes:
    """Greedy PackBits: repeat runs >= 3 as replicate, else literals."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        # literal: scan until a >=3 repeat run or 128 bytes
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and row[j + r] == row[j] and r < 3:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    codes: list[tuple[int, int]] = [(CLEAR, 9)]
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    prev = b""
    for byte in raw:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        codes.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        # early change: width bumps when next_code+1 would overflow
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            codes.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        codes.append((table[prev], width))
    codes.append((EOI, width))
    bits = bytearray()
    for code, wdt in codes:
        for i in range(wdt - 1, -1, -1):
            bits.append((code >> i) & 1)
    pad = (-len(bits)) % 8
    bits.extend([0] * pad)
    arr = np.packbits(np.array(bits, dtype=np.uint8))
    return arr.tobytes()


def encode_tiff(arr: np.ndarray, compression: str = "none") -> bytes:
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8 (h, w, 3)")
    h, w, _ = arr.shape
    raw = arr.tobytes()
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if compression == "none":
        payload = raw
    elif compression == "packbits":
        payload = _packbits_encode(raw)
    else:
        payload = _lzw_encode(raw)

    header = struct.pack("<2sHI", b"II", 42, 8)
    # IFD with 9 tags follows at offset 8; strip data after the IFD
    n_tags = 9
    ifd_size = 2 + n_tags * 12 + 4
    bits_off = 8 + ifd_size
    data_off = bits_off + 6  # 3 SHORT values for BitsPerSample
    entries = [
        (_T_WIDTH, 4, 1, w),
        (_T_HEIGHT, 4, 1, h),
        (_T_BITS, 3, 3, bits_off),
        (_T_COMPRESSION, 3, 1, comp_id),
        (_T_PHOTOMETRIC, 3, 1, 2),
        (_T_STRIP_OFFSETS, 4, 1, data_off),
        (_T_SPP, 3, 1, 3),
        (_T_ROWS_PER_STRIP, 4, 1, h),
        (_T_STRIP_COUNTS, 4, 1, len(payload)),
    ]
    ifd = struct.pack("<H", n_tags)
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)  # next-IFD pointer
    return header + ifd + struct.pack("<HHH", 8, 8, 8) + payload
