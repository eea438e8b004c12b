"""Dependency-free baseline JPEG codec (stdlib + numpy only).

The reference's namesake input is encoded image files decoded through PIL
(/root/reference/improved_faiss_detector.py:145-257 extract pipeline,
/root/reference/similarities/similarities/utils/image_util.py:23-107
multi-format loader), and JPEG is the dominant web-image codec. This
container ships no image libraries, so this module implements the Huffman
DCT subsets of ITU-T T.81 (the public JPEG specification):

- decode_jpeg: SOI/APPn/DQT/DHT/SOF/DRI/SOS/EOI parsing, Huffman entropy
  decode with byte-unstuffing and restart-marker resync, dequantize +
  dezigzag, orthonormal matmul IDCT, chroma upsampling for any (h, v)
  sampling factors (4:4:4, 4:2:2, 4:2:0, ...), JFIF YCbCr -> RGB.
  Handles baseline sequential (SOF0/SOF1) interleaved AND non-interleaved
  multi-scan layouts, plus PROGRESSIVE (SOF2) with spectral selection and
  successive approximation (DC/AC first + refinement scans, EOB runs —
  T.81 Annex G). Arithmetic-coded / lossless / hierarchical frames raise
  ValueError.
- encode_jpeg: baseline encoder (Annex K quantization tables scaled by a
  quality knob, Annex K Huffman tables, optional 2x2 chroma subsampling) —
  the test-vector generator for the decoder's entropy/subsampling paths;
  roundtrip error is bounded by the quantization step sizes.
- encode_jpeg_multiscan / encode_jpeg_progressive: the non-interleaved and
  progressive writers (the latter per the libjpeg jcphuff.c scan-script
  control flow, EOB-run + correction-bit buffering) — decoding their
  output is BIT-IDENTICAL to decoding the baseline encode at the same
  quality (same quantized coefficients, losslessly reordered), which is
  the equality gate in tests/test_jpeg.py.

Entropy decode is a sequential bit loop (Huffman is inherently serial per
scan segment); at pipeline level the cost parallelizes across images via
the actor-pool decode stage, matching how PIL-in-a-process parallelizes in
the reference.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIGNATURE = b"\xff\xd8\xff"

# Zig-zag order: index i of this array holds the raster position of the i-th
# coefficient in scan order (T.81 Figure A.6).
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 luminance / chrominance quantization tables (raster order).
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, symbol values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: X = D @ x (1-D);  blocks: D @ B @ D.T."""
    k = np.arange(8.0)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d * 0.5


_DCT = _dct_matrix()


class _HuffTable:
    """Canonical Huffman table: (code-length, code) -> symbol, built from the
    DHT bits/values lists exactly as T.81 Annex C generates codes."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        idx = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[idx]
                idx += 1
                code += 1
                self.max_len = length
            code <<= 1

    def encode_map(self) -> dict[int, tuple[int, int]]:
        return {sym: (length, code) for (length, code), sym in self.lookup.items()}


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("jpeg: entropy data exhausted")
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, table.max_len + 1):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(value: int, nbits: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the nbits-wide magnitude to a signed value."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


def _parse_segments(data: bytes):
    """Yield (marker, payload, end_offset) for each marker segment up to SOS;
    the caller slices the entropy-coded data itself."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        yield marker, payload, pos + 2 + length
        pos += 2 + length
        if marker == 0xDA:
            return


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """From ``start``, unstuff the entropy-coded stream into restart
    segments; return (segments, offset of the next marker's 0xFF byte)."""
    segments: list[bytes] = []
    cur = bytearray()
    p = start
    n = len(data)
    while p < n:
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker segment
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _block_first(reader, blk, dc_tbl, ac_tbl, ss, se, al, pred, eobrun):
    """First-pass block decode (Ah == 0). Handles sequential scans (ss=0,
    se=63), progressive DC-first (se=0) and progressive AC-first bands —
    the EOB-run form generalizes the baseline EOB (r is always 0 there).
    ``pred`` is a 1-element list (DC predictor); returns the new eobrun."""
    if ss == 0:
        t = reader.read_huff(dc_tbl)
        diff = _extend(reader.read_bits(t), t) if t else 0
        pred[0] += diff
        blk[0] = pred[0] << al
        k = 1
    else:
        if eobrun > 0:
            return eobrun - 1
        k = ss
    while k <= se:
        rs = reader.read_huff(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("jpeg: AC index overflow")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _block_ac_refine(reader, blk, ac_tbl, ss, se, al, eobrun):
    """Progressive AC refinement (Ah > 0): correction bits for
    history-nonzero coefficients plus newly-significant +-1<<Al insertions
    (T.81 G.1.2.3; the libjpeg decode_mcu_AC_refine control flow)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huff(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # correction bits of THIS block's tail below
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("jpeg: bad refine magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit():
                        if (abs(int(blk[k])) & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit():
                    if (abs(int(blk[k])) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else -(1 << al)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JPEG bytes to uint8 (h, w) or (h, w, 3).

    Supports baseline sequential (SOF0/SOF1) — interleaved or
    non-interleaved multi-scan — AND progressive (SOF2) with spectral
    selection + successive approximation (DC/AC first and refinement
    scans, EOB runs, restart resync). Arithmetic-coded and
    lossless/hierarchical frames raise ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    planes: dict[int, np.ndarray] = {}  # comp id -> (bh, bw, 64) ZIGZAG order
    grid = None  # (hmax, vmax, mcus_x, mcus_y)
    got_scan = False

    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("jpeg: truncated segment")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        end = pos + 2 + length
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(payload[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                raster = np.zeros(64, np.int32)
                raster[_ZIGZAG] = tbl
                quant[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if payload[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            grid = (hmax, vmax, mcus_x, mcus_y)
            for c in comps:
                planes[c["id"]] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline/extended sequential and progressive "
                "Huffman frames supported (no arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = payload[0]
            scomps = []
            by_id = {c["id"]: c for c in frame["comps"]}
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                if cs not in by_id:
                    raise ValueError("jpeg: scan references unknown component")
                scomps.append({"c": by_id[cs], "td": tt >> 4, "ta": tt & 0x0F})
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0  # baseline ignores these fields
            segments, pos = _entropy_segments(data, end)
            _decode_scan(
                segments, frame, grid, planes, scomps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            got_scan = True
            continue
        pos = end
    if frame is None or not got_scan:
        raise ValueError("jpeg: missing SOF/SOS")

    hmax, vmax, _, _ = grid
    samples = {}
    for c in frame["comps"]:
        zz = planes[c["id"]]
        bh, bw = zz.shape[:2]
        raster = np.zeros((bh, bw, 64), np.int32)
        raster[:, :, _ZIGZAG] = zz
        coef = raster.reshape(bh, bw, 8, 8).astype(np.float64) * quant[c["tq"]][None, None]
        spatial = np.einsum("ij,bcjk,kl->bcil", _DCT.T, coef, _DCT)
        img = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        samples[c["id"]] = img[: frame["h"], : frame["w"]]

    comps = frame["comps"]
    if len(comps) == 1:
        return np.clip(np.round(samples[comps[0]["id"]]), 0, 255).astype(np.uint8)
    y = samples[comps[0]["id"]]
    cb = samples[comps[1]["id"]] - 128.0
    cr = samples[comps[2]["id"]] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    segments, frame, grid, planes, scomps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval,
):
    """Decode one scan's entropy segments into the zigzag coefficient
    planes. Interleaved scans walk the MCU grid; single-component scans walk
    the component's OWN ceil(samples/8) block grid (T.81 A.2.2 — smaller
    than the MCU-padded plane). The restart interval counts MCUs, where a
    non-interleaved MCU is one block."""
    hmax, vmax, mcus_x, mcus_y = grid
    interleaved = len(scomps) > 1
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {sc["c"]["id"]: [0] for sc in scomps}
    eobrun = 0
    unit = 0

    def restart():
        nonlocal seg_idx, reader, eobrun
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError("jpeg: missing restart segment")
        reader = _BitReader(segments[seg_idx])
        for v in pred.values():
            v[0] = 0
        eobrun = 0

    def do_block(blk, c, sc):
        nonlocal eobrun
        if ah == 0:
            eobrun = _block_first(
                reader, blk,
                huff_dc.get(sc["td"]) if ss == 0 else None,
                huff_ac.get(sc["ta"]) if se > 0 else None,
                ss, se, al, pred[c["id"]], eobrun,
            )
        elif ss == 0:  # DC refinement: one bit, plain OR at bit Al
            blk[0] |= reader.read_bit() << al
        else:
            eobrun = _block_ac_refine(
                reader, blk, huff_ac[sc["ta"]], ss, se, al, eobrun
            )

    if interleaved:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                unit += 1
                for sc in scomps:
                    c = sc["c"]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            do_block(
                                planes[c["id"]][my * c["v"] + v, mx * c["h"] + hh],
                                c, sc,
                            )
    else:
        sc = scomps[0]
        c = sc["c"]
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                unit += 1
                do_block(planes[c["id"]][by, bx], c, sc)


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self):
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """Return (category nbits, raw bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _write_block_sequential(writer, zz, pred, enc_dc, enc_ac):
    """Baseline DC-diff + AC-RLE emission of one zigzag block (shared by the
    interleaved encoder and the non-interleaved multi-scan encoder)."""
    diff = int(zz[0]) - pred[0]
    pred[0] = int(zz[0])
    nb, bits = _magnitude(diff)
    ln, code = enc_dc[nb]
    writer.write(code, ln)
    if nb:
        writer.write(bits, nb)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        val = int(zz[k])
        if val == 0:
            if k > last_nz:
                ln, code = enc_ac[0x00]  # EOB
                writer.write(code, ln)
                break
            run += 1
            if run == 16:
                ln, code = enc_ac[0xF0]  # ZRL
                writer.write(code, ln)
                run = 0
            continue
        nb, bits = _magnitude(val)
        ln, code = enc_ac[(run << 4) | nb]
        writer.write(code, ln)
        writer.write(bits, nb)
        run = 0


def _zz_planes_for_encode(arr: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color-convert, pad to the MCU grid, DCT,
    quantize. Returns (gray, h, w, samp, qy, qc, coefs) where coefs[i] is
    component i's (block_rows, block_cols, 64) int32 ZIGZAG coefficients
    over the MCU-padded grid."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]

    qy = _scaled_quant(_QUANT_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(_QUANT_CHROMA, quality).reshape(8, 8)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        comp_q = [qy]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # Box-average 2x2 chroma; pad odd dims by edge replication first.
            def down(p):
                ph = p if h % 2 == 0 else np.vstack([p, p[-1:]])
                ph = ph if w % 2 == 0 else np.hstack([ph, ph[:, -1:]])
                return 0.25 * (ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2])

            planes = [y - 128.0, down(cb) - 128.0, down(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        comp_q = [qy, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    coefs = []
    for p, (sh, sv), q in zip(planes, samp, comp_q):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        ph, pw = p.shape
        out = np.empty((th, tw), np.float64)
        out[:ph, :pw] = p
        if th > ph:
            out[ph:, :pw] = p[-1:, :]
        if tw > pw:
            out[:, pw:] = out[:, pw - 1 : pw]
        bh, bw = th // 8, tw // 8
        blocks = out.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,bcjk,kl->bcil", _DCT, blocks, _DCT.T)
        qzz = np.round(coef / q[None, None]).astype(np.int32).reshape(bh, bw, 64)
        coefs.append(qzz[:, :, _ZIGZAG])
    return gray, h, w, samp, qy, qc, coefs


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG.
    subsample=True uses 4:2:0 chroma (exercises the decoder's upsampler);
    restart_interval>0 emits DRI + RSTn markers every that many MCUs
    (exercises the decoder's restart resync)."""
    gray, h, w, samp, qy, qc, coefs = _zz_planes_for_encode(arr, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    ncomp = len(coefs)
    dc_y, ac_y = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS), _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c, ac_c = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS), _HuffTable(
        _AC_CHROMA_BITS, _AC_CHROMA_VALS
    )
    enc_dc = [dc_y.encode_map()] + [dc_c.encode_map()] * (ncomp - 1)
    enc_ac = [ac_y.encode_map()] + [ac_c.encode_map()] * (ncomp - 1)

    writer = _BitWriter()
    pred = [[0] for _ in range(ncomp)]
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [[0] for _ in range(ncomp)]
            mcu_count += 1
            for ci, (zzp, (sh, sv)) in enumerate(zip(coefs, samp)):
                for v in range(sv):
                    for hh in range(sh):
                        _write_block_sequential(
                            writer,
                            zzp[my * sv + v, mx * sh + hh],
                            pred[ci],
                            enc_dc[ci],
                            enc_ac[ci],
                        )
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in ((0, qy), (1, qc))[: 1 if gray else 2]:
        out += seg(0xDB, bytes([tq]) + bytes(q.reshape(64)[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += seg(0xC0, sof)
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS), (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tid, bits, vals in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _common_headers(gray, h, w, samp, qy, qc, sof_marker: int) -> bytearray:
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in ((0, qy), (1, qc))[: 1 if gray else 2]:
        out += _seg(0xDB, bytes([tq]) + bytes(q.reshape(64)[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(sof_marker, sof)
    return out


def _comp_block_grid(h: int, w: int, samp, ci: int) -> tuple[int, int]:
    """Non-interleaved scan grid for component ci: ceil(samples / 8) in each
    axis (T.81 A.2.2) — smaller than the MCU-padded coefficient planes."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    cw = -(-w * samp[ci][0] // hmax)
    ch = -(-h * samp[ci][1] // vmax)
    return -(-ch // 8), -(-cw // 8)


def encode_jpeg_multiscan(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Baseline NON-interleaved multi-scan encoder: SOF0 with one SOS per
    component, each scan walking that component's own block grid — the
    legal baseline layout some writers emit, and the decoder's
    multi-scan-walker test vector."""
    gray, h, w, samp, qy, qc, coefs = _zz_planes_for_encode(arr, quality, subsample)
    out = _common_headers(gray, h, w, samp, qy, qc, 0xC0)
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tid, bits, vals in tables:
        out += _seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    dc_y, ac_y = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS), _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c, ac_c = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS), _HuffTable(
        _AC_CHROMA_BITS, _AC_CHROMA_VALS
    )
    for ci, zzp in enumerate(coefs):
        td = 0 if ci == 0 else 1
        enc_dc = (dc_y if ci == 0 else dc_c).encode_map()
        enc_ac = (ac_y if ci == 0 else ac_c).encode_map()
        out += _seg(0xDA, bytes([1, ci + 1, (td << 4) | td, 0, 63, 0]))
        writer = _BitWriter()
        pred = [0]
        bh, bw = _comp_block_grid(h, w, samp, ci)
        for by in range(bh):
            for bx in range(bw):
                _write_block_sequential(writer, zzp[by, bx], pred, enc_dc, enc_ac)
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# near-uniform AC table for progressive scans: EOB-run symbols (r<<4 with
# r up to 14) are not in the Annex K tables, so progressive writers carry
# their own DHT — this one maps every possible symbol (255 codes at 9 bits
# + 1 at 10; DHT per-length counts are single bytes, and the last code 510
# is not all-ones)
_PROG_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_PROG_AC_VALS = list(range(256))


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsample: bool = False, al: int = 1
) -> bytes:
    """Progressive (SOF2) encoder with a 4-kind scan script per T.81 Annex G
    successive approximation: interleaved DC first (Al=al) + DC refinement
    down to Al=0, then per component AC first (band 1..63 at Al=al) + AC
    refinement — exercising every progressive decode path (EOB runs,
    ZRL-in-refine, correction-bit buffering). Decoding the result is
    bit-identical to decoding the baseline encode at the same quality
    (same quantized coefficients, reordered losslessly)."""
    if not 0 <= al <= 1:
        raise ValueError("encode_jpeg_progressive: al must be 0 or 1")
    gray, h, w, samp, qy, qc, coefs = _zz_planes_for_encode(arr, quality, subsample)
    ncomp = len(coefs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = _common_headers(gray, h, w, samp, qy, qc, 0xC2)
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    tables += [(0x10, _PROG_AC_BITS, _PROG_AC_VALS)]
    for tid, bits, vals in tables:
        out += _seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    enc_dc = [
        _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS).encode_map()
        if ci == 0
        else _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS).encode_map()
        for ci in range(ncomp)
    ]
    enc_ac = _HuffTable(_PROG_AC_BITS, _PROG_AC_VALS).encode_map()

    def sos(comp_specs, ss, se, ah, a_low):
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | a_low])
        return _seg(0xDA, body)

    # ---- scan 1: DC first, all components interleaved, Al=al -------------
    out += sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, al)
    writer = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (zzp, (sh, sv)) in enumerate(zip(coefs, samp)):
                for v in range(sv):
                    for hh in range(sh):
                        dc = int(zzp[my * sv + v, mx * sh + hh][0]) >> al
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        nb, bits = _magnitude(diff)
                        ln, code = enc_dc[ci][nb]
                        writer.write(code, ln)
                        if nb:
                            writer.write(bits, nb)
    writer.flush()
    out += writer.out

    # ---- scan 2: DC refinement Ah=al..Al=0 (one raw bit per block) --------
    if al > 0:
        out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, al, 0)
        writer = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (zzp, (sh, sv)) in enumerate(zip(coefs, samp)):
                    for v in range(sv):
                        for hh in range(sh):
                            writer.write(
                                (int(zzp[my * sv + v, mx * sh + hh][0]) >> (al - 1)) & 1, 1
                            )
        writer.flush()
        out += writer.out

    # ---- per component: AC first (Al=al), then AC refine (Ah=al, Al=0) ---
    for ci, zzp in enumerate(coefs):
        bh, bw = _comp_block_grid(h, w, samp, ci)
        out += sos([(ci + 1, 0, 0)], 1, 63, 0, al)
        writer = _BitWriter()
        state = {"eobrun": 0, "bits": []}
        for by in range(bh):
            for bx in range(bw):
                _ac_first_emit(writer, zzp[by, bx], enc_ac, al, state)
        _flush_eobrun(writer, enc_ac, state)
        writer.flush()
        out += writer.out
        if al > 0:
            out += sos([(ci + 1, 0, 0)], 1, 63, al, 0)
            writer = _BitWriter()
            state = {"eobrun": 0, "bits": []}
            for by in range(bh):
                for bx in range(bw):
                    _ac_refine_emit(writer, zzp[by, bx], enc_ac, al - 1, state)
            _flush_eobrun(writer, enc_ac, state)
            writer.flush()
            out += writer.out

    out += b"\xff\xd9"
    return bytes(out)


def _flush_eobrun(writer, enc_ac, state):
    """Emit the pending EOB-run symbol + its buffered correction bits
    (refinement scans append per-block correction bits to the run)."""
    n = state["eobrun"]
    if n == 0 and not state["bits"]:
        return
    if n == 0:
        raise ValueError("jpeg: refine bits without an EOB run")
    r = n.bit_length() - 1
    ln, code = enc_ac[r << 4]
    writer.write(code, ln)
    if r:
        writer.write(n - (1 << r), r)
    for v, nb in state["bits"]:
        writer.write(v, nb)
    state["eobrun"] = 0
    state["bits"] = []


def _ac_first_emit(writer, zz, enc_ac, al, state):
    """Progressive AC first pass for one block: sign-magnitude point
    transform (|v| >> al), EOB-run accumulation across blocks."""
    run = 0
    emitted = False
    for k in range(1, 64):
        v = int(zz[k])
        mag = abs(v) >> al
        if mag == 0:
            run += 1
            continue
        if not emitted:
            _flush_eobrun(writer, enc_ac, state)
            emitted = True
        while run > 15:
            ln, code = enc_ac[0xF0]
            writer.write(code, ln)
            run -= 16
        nb, bits = _magnitude(mag if v > 0 else -mag)
        ln, code = enc_ac[(run << 4) | nb]
        writer.write(code, ln)
        writer.write(bits, nb)
        run = 0
    if run > 0 or not emitted:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(writer, enc_ac, state)


def _ac_refine_emit(writer, zz, enc_ac, al, state):
    """Progressive AC refinement for one block (Ah=al+1 -> Al=al): the
    libjpeg encode_mcu_AC_refine control flow — ZRLs emitted at the first
    nonzero position where the pending zero-run exceeds 15 (but only before
    the block's last newly-significant coefficient, else they fold into the
    EOB run), correction bits buffered and flushed right after each emitted
    symbol so the decoder's walk consumes them in position order."""
    p_bit = 1 << al
    mags = [abs(int(zz[k])) >> al for k in range(64)]
    eob_pos = 0  # 1 + last newly-significant position
    for k in range(1, 64):
        if mags[k] == 1:
            eob_pos = k + 1
    run = 0
    br: list[tuple[int, int]] = []
    emitted = False
    for k in range(1, 64):
        mag = mags[k]
        if mag == 0:
            run += 1
            continue
        # a nonzero position: first fold pending ZRLs (only before eob_pos)
        while run > 15 and k <= eob_pos - 1:
            if not emitted:
                _flush_eobrun(writer, enc_ac, state)
                emitted = True
            ln, code = enc_ac[0xF0]
            writer.write(code, ln)
            run -= 16
            for v, nb in br:
                writer.write(v, nb)
            br = []
        if mag > 1:
            br.append(((int(zz[k]) if zz[k] > 0 else -int(zz[k])) & p_bit and 1 or 0, 1))
            continue
        # newly significant (+-1 at this precision)
        if not emitted:
            _flush_eobrun(writer, enc_ac, state)
            emitted = True
        ln, code = enc_ac[(run << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if zz[k] > 0 else 0, 1)
        for v, nb in br:
            writer.write(v, nb)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["bits"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(writer, enc_ac, state)
