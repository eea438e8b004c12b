"""Dependency-free baseline JPEG codec (stdlib + numpy only).

The reference's namesake input is encoded image files decoded through PIL
(/root/reference/improved_faiss_detector.py:145-257 extract pipeline,
/root/reference/similarities/similarities/utils/image_util.py:23-107
multi-format loader), and JPEG is the dominant web-image codec. This
container ships no image libraries, so this module implements the baseline
sequential DCT subset of ITU-T T.81 (the public JPEG specification):

- decode_jpeg: SOI/APPn/DQT/DHT/SOF0/DRI/SOS/EOI parsing, Huffman entropy
  decode with byte-unstuffing and restart-marker resync, dequantize +
  dezigzag, orthonormal matmul IDCT, chroma upsampling for any (h, v)
  sampling factors (4:4:4, 4:2:2, 4:2:0, ...), JFIF YCbCr -> RGB.
  Progressive (SOF2) and arithmetic-coded streams raise ValueError.
- encode_jpeg: baseline encoder (Annex K quantization tables scaled by a
  quality knob, Annex K Huffman tables, optional 2x2 chroma subsampling) —
  the test-vector generator for the decoder's entropy/subsampling paths;
  roundtrip error is bounded by the quantization step sizes.

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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential JPEG bytes to uint8 (h, w) or (h, w, 3)."""
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    scan_comps = None
    restart_interval = 0
    entropy_start = None

    for marker, payload, end in _parse_segments(data):
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
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline(-ish) sequential
            precision = payload[0]
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0/SOF1) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            # baseline NON-interleaved multi-scan (one SOS per component)
            # would silently decode only the first scan: parsing stops at the
            # first SOS, so a partial-component scan must raise for callers
            # to fall back (same contract as progressive)
            if frame is not None and ns < len(frame["comps"]):
                raise ValueError(
                    "jpeg: non-interleaved multi-scan not supported "
                    f"(scan has {ns} of {len(frame['comps'])} components)"
                )
            scan_comps = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            entropy_start = end
    if frame is None or scan_comps is None or entropy_start is None:
        raise ValueError("jpeg: missing SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        by_id[sc["id"]]["td"] = sc["td"]
        by_id[sc["id"]]["ta"] = sc["ta"]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)

    # Split the entropy stream into unstuffed restart segments.
    segments: list[bytes] = []
    cur = bytearray()
    p = entropy_start
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
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    # Per-component coefficient planes (in blocks).
    planes = {}
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        planes[c["id"]] = np.zeros((bh, bw, 8, 8), dtype=np.int32)

    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for sc in scan_comps:
                c = by_id[sc["id"]]
                dc_tbl = huff_dc[c["td"]]
                ac_tbl = huff_ac[c["ta"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        t = reader.read_huff(dc_tbl)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            blk[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        raster = np.zeros(64, np.int32)
                        raster[_ZIGZAG] = blk
                        planes[c["id"]][my * c["v"] + v, mx * c["h"] + hh] = raster.reshape(8, 8)
            mcu_count += 1

    # Dequantize + IDCT per component (vectorized over all blocks at once).
    samples = {}
    for c in comps:
        coef = planes[c["id"]].astype(np.float64) * quant[c["tq"]][None, None]
        spatial = np.einsum("ij,bcjk,kl->bcil", _DCT.T, coef, _DCT)
        bh, bw = coef.shape[:2]
        img = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        # Upsample to full MCU-grid resolution, then crop to frame size.
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        samples[c["id"]] = img[: frame["h"], : frame["w"]]

    if len(comps) == 1:
        return np.clip(np.round(samples[comps[0]["id"]]), 0, 255).astype(np.uint8)
    y = samples[comps[0]["id"]]
    cb = samples[comps[1]["id"]] - 128.0
    cr = samples[comps[2]["id"]] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG.
    subsample=True uses 4:2:0 chroma (exercises the decoder's upsampler);
    restart_interval>0 emits DRI + RSTn markers every that many MCUs
    (exercises the decoder's restart resync)."""
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

    # Pad each plane to its block grid (edge replication).
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        ph, pw = p.shape
        out = np.empty((th, tw), np.float64)
        out[:ph, :pw] = p
        if th > ph:
            out[ph:, :pw] = p[-1:, :]
        if tw > pw:
            out[:, pw:] = out[:, pw - 1 : pw]
        padded.append(out)

    dc_y, ac_y = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS), _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c, ac_c = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS), _HuffTable(
        _AC_CHROMA_BITS, _AC_CHROMA_VALS
    )
    enc_dc = [dc_y.encode_map()] + [dc_c.encode_map()] * (len(planes) - 1)
    enc_ac = [ac_y.encode_map()] + [ac_c.encode_map()] * (len(planes) - 1)

    writer = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (plane, (sh, sv)) in enumerate(zip(padded, samp)):
                for v in range(sv):
                    for hh in range(sh):
                        by = (my * sv + v) * 8
                        bx = (mx * sh + hh) * 8
                        block = plane[by : by + 8, bx : bx + 8]
                        coef = _DCT @ block @ _DCT.T
                        q = np.round(coef / comp_q[ci]).astype(np.int32)
                        zz = q.reshape(64)[_ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        nb, bits = _magnitude(diff)
                        ln, code = enc_dc[ci][nb]
                        writer.write(code, ln)
                        if nb:
                            writer.write(bits, nb)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            val = int(zz[k])
                            if val == 0:
                                if k > last_nz:
                                    ln, code = enc_ac[ci][0x00]  # EOB
                                    writer.write(code, ln)
                                    break
                                run += 1
                                if run == 16:
                                    ln, code = enc_ac[ci][0xF0]  # ZRL
                                    writer.write(code, ln)
                                    run = 0
                                continue
                            nb, bits = _magnitude(val)
                            ln, code = enc_ac[ci][(run << 4) | nb]
                            writer.write(code, ln)
                            writer.write(bits, nb)
                            run = 0
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
