"""TIFF codec exactness (functions/tiff.py — baseline strips, PackBits,
LZW with early-change) and the decode dispatch on genuine TIFF payloads
(SURVEY.md §2.1 S11; the reference's multi-format loader shape,
utils/image_util.py:23-107 accepts TIFF via PIL)."""

import struct

import numpy as np
import pytest

from imagededupx_ray.functions.tiff import (
    TIFF_SIGNATURES,
    _lzw_decode,
    _packbits_decode,
    decode_tiff,
    encode_tiff,
)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_tiff_roundtrip_exact(comp):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (41, 57, 3), dtype=np.uint8)
    data = encode_tiff(img, compression=comp)
    assert data[:4] in TIFF_SIGNATURES
    assert (decode_tiff(data) == img).all()


def test_tiff_runs_and_resets():
    """Constant runs stress PackBits; a large random image forces LZW width
    bumps up to 12 bits and a table reset."""
    a = np.zeros((50, 64, 3), np.uint8)
    a[10:30, 5:40] = 201
    a[:, ::5] = 17
    assert (decode_tiff(encode_tiff(a, "packbits")) == a).all()
    rng = np.random.default_rng(5)
    big = rng.integers(0, 256, (90, 120, 3), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(big, "lzw")) == big).all()


def test_tiff_grayscale_replicates():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (13, 19), dtype=np.uint8)
    out = decode_tiff(encode_tiff(g))
    assert out.shape == (13, 19, 3)
    assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()


def test_tiff_big_endian_and_white_is_zero():
    """Hand-built MM (big-endian) grayscale file with
    PhotometricInterpretation=0 (WhiteIsZero): values must invert."""
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    h, w = g.shape
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, 0),
        (273, 4, 1, 0),  # patched below
        (277, 3, 1, 1 << 16), (278, 4, 1, h), (279, 4, 1, h * w),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + len(entries) * 12 + 4
    entries[5] = (273, 4, 1, data_off)
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off)
    buf += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        # SHORT values sit in the HIGH half of the 4-byte field in MM files
        buf += struct.pack(">HHII", tag, typ, cnt, val)
    buf += struct.pack(">I", 0)
    buf += g.tobytes()
    out = decode_tiff(buf)
    assert (out[:, :, 0] == 255 - g).all()


def test_tiff_rejects_unsupported():
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_tiff(img))
    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff")
    # corrupt the compression tag to an unsupported scheme (JPEG-in-TIFF=7)
    i = data.find(struct.pack("<HHII", 259, 3, 1, 1))
    assert i > 0
    data[i : i + 12] = struct.pack("<HHII", 259, 3, 1, 7)
    with pytest.raises(ValueError):
        decode_tiff(bytes(data))


def test_packbits_lzw_kernels():
    assert _packbits_decode(bytes([2, 65, 66, 67, 254, 68]), 6) == b"ABCDDD"
    # lzw: encode_tiff's encoder is the generator; spot-check a tiny stream
    from imagededupx_ray.functions.tiff import _lzw_encode

    raw = b"TOBEORNOTTOBEORTOBEORNOT" * 20
    assert _lzw_decode(_lzw_encode(raw), len(raw)) == raw


def test_decode_stage_handles_tiff(ray_session):
    """The actor-pool decode stage resolves genuine TIFF payloads through
    the real codec (dimensions + mean match the raster)."""
    import ray.data as rd

    from imagededupx_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    stage = ImageDecodeStage()
    w, h, mean = stage._decode_one(encode_tiff(img, "lzw"))
    assert (w, h) == (31, 24)
    from imagededupx_ray.functions.imagehash import to_grayscale

    assert abs(mean - float(to_grayscale(img).astype(np.float32).mean())) < 1e-3
