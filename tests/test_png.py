"""Stdlib PNG codec exactness (functions/png.py) + the image near-dup
pipeline over genuine PNG files (SURVEY.md §2.1 S11 — the reference's
encoded-image input shape, utils/image_util.py:23-107)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from imagededupx_ray.functions.png import PNG_SIGNATURE, decode_png, encode_png


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_exact(filter_type, channels):
    rng = np.random.default_rng(filter_type * 10 + channels)
    shape = (23, 17) if channels == 1 else (23, 17, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(img, filter_type=filter_type)
    assert data[:8] == PNG_SIGNATURE
    out = decode_png(data)
    assert out.shape == img.shape
    assert (out == img).all()


def test_png_known_bytes_to_exact_pixels():
    """A fixed, hand-checkable vector: 2x2 RGB with filter 0."""
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    data = encode_png(img)
    # IHDR says 2x2, depth 8, color type 2
    assert data[16:24] == struct.pack(">II", 2, 2)
    assert data[24] == 8 and data[25] == 2
    out = decode_png(data)
    assert (out == img).all()


def test_png_palette_decode():
    """Hand-built color-type-3 (palette) PNG decodes through PLTE."""
    palette = np.array([[250, 10, 20], [0, 128, 255], [7, 7, 7]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    h, w = idx.shape

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + bytes(idx[y]) for y in range(h))
    data = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (h, w, 3)
    assert (out == palette[idx]).all()


def test_png_rejects_unsupported():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + bytes(16))


def test_phash_dup_pairs_on_planted_png_near_dups(ray_session):
    """End-to-end: PNG-encoded planted near-duplicates must surface as
    phash-band LSH pairs — the namesake image-dedup pipeline on genuine
    encoded files (no fake kernel anywhere on this path)."""
    import ray.data as rd

    from imagededupx_ray.stages.multimodal import (
        decode_raw_image,
        perceptual_hashes,
        synthetic_png_images,
        synthetic_raw_images,
    )
    from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

    n, dup_every = 100, 5
    pngs = synthetic_png_images(n, dup_every=dup_every)
    # PNG payloads decode to the same pixels as the RAW corpus they encode
    raws = synthetic_raw_images(n, dup_every=dup_every)
    a0 = decode_png(pngs["payload"][0].as_py())
    b0 = decode_raw_image(raws["payload"][0].as_py())
    assert (a0 == b0).all()

    hashes = perceptual_hashes(rd.from_arrow(pngs))
    pairs = hamming_band_pairs(
        hashes.select_columns(["image_id", "phash"]),
        id_col="image_id",
        code_col="phash",
        hamming_max=10,
    ).to_pandas()
    planted = {
        (i - 1, i) for i in range(n) if i % dup_every == dup_every - 1 and i > 0
    }
    got = {(int(r.a), int(r.b)) for _, r in pairs.iterrows()}
    hitrate = len(planted & got) / len(planted)
    assert hitrate >= 0.8, (hitrate, len(planted), len(got))
