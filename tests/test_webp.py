"""Lossless-WebP/VP8L codec exactness (functions/webp.py — prefix codes,
LZ77 with the 2D distance map, color cache, all four transforms) and the
decode dispatch on genuine WebP payloads (SURVEY.md §2.1 S11; the
reference's multi-format loader shape, utils/image_util.py:23-107 accepts
WebP via PIL)."""

import struct

import numpy as np
import pytest

from imagededupx_ray.functions.webp import (
    _BitReader,
    _BitWriter,
    _plane_code_to_distance,
    _prefix_encode_value,
    _read_prefix_coded_value,
    decode_webp,
    encode_webp_lossless,
    is_webp,
)


def test_webp_roundtrip_exact_random():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (23, 31), (64, 48)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_webp_lossless(img)
        assert is_webp(data)
        assert (decode_webp(data) == img).all()


def test_webp_lz77_and_color_cache():
    """Flat regions force length/distance prefix codes and cache hits; the
    stream must reproduce the raster exactly with and without the cache."""
    img = np.zeros((40, 60, 3), dtype=np.uint8)
    img[:, :30] = [200, 10, 50]
    img[10:20, 35:55] = [3, 250, 9]
    for cache_bits in (0, 4, 8):
        data = encode_webp_lossless(img, cache_bits=cache_bits)
        assert (decode_webp(data) == img).all()
    # the run-length stream must be far smaller than the literal stream
    assert len(encode_webp_lossless(img)) < len(
        encode_webp_lossless(img, use_lz77=False)
    )


@pytest.mark.parametrize("mode", range(14))
def test_webp_all_predictor_modes(mode):
    rng = np.random.default_rng(100 + mode)
    img = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
    data = encode_webp_lossless(img, predictor_mode=mode)
    assert (decode_webp(data) == img).all()


def test_webp_color_transform_and_subtract_green():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    for cte in [(0, 0, 0), (5, 250, 100), (127, 128, 255)]:
        data = encode_webp_lossless(img, color_transform=cte, subtract_green=True)
        assert (decode_webp(data) == img).all()


@pytest.mark.parametrize("ncolors", [2, 4, 13, 200])
def test_webp_palette_packed_widths(ncolors):
    """COLOR_INDEXING at every packed index width (8/4/2/1 px per byte)."""
    rng = np.random.default_rng(ncolors)
    pal = np.unique(
        rng.integers(0, 256, (ncolors, 3), dtype=np.uint8).reshape(-1, 3), axis=0
    )
    img = pal[rng.integers(0, len(pal), (25, 33))]
    data = encode_webp_lossless(img, palette=True)
    assert (decode_webp(data) == img).all()


def test_webp_stacked_transforms_on_gradient():
    yy, xx = np.mgrid[0:50, 0:70]
    img = np.stack(
        [(yy * 3 + xx) % 256, (yy + xx * 2) % 256, (yy * 2 + xx * 2) % 256], axis=2
    ).astype(np.uint8)
    for mode in (1, 2, 11, 12, 13):
        data = encode_webp_lossless(
            img, predictor_mode=mode, subtract_green=True, cache_bits=5
        )
        assert (decode_webp(data) == img).all()


def test_webp_grayscale_replicates():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (13, 19), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(g))
    assert out.shape == (13, 19, 3)
    assert (out == g[:, :, None]).all()


def test_webp_prefix_value_coding_exact():
    for value in range(1, 4097):
        code, extra, bits = _prefix_encode_value(value)
        bw = _BitWriter()
        bw.write(extra, bits)
        br = _BitReader(bw.bytes() + b"\x00" * 4)
        assert _read_prefix_coded_value(br, code) == value


def test_webp_distance_map():
    """Codes 1..120 map through the 2D neighborhood; >120 are linear."""
    assert _plane_code_to_distance(60, 1) == 60  # (0, 1): pixel above
    assert _plane_code_to_distance(60, 2) == 1  # (1, 0): pixel left
    assert _plane_code_to_distance(60, 121) == 1
    assert _plane_code_to_distance(60, 120 + 59) == 59
    # negative-x offsets clamp to at least 1
    assert _plane_code_to_distance(1, 4) >= 1


def test_webp_malformed_payloads_raise_cleanly():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = encode_webp_lossless(img)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")  # not WEBP
    with pytest.raises(ValueError):
        decode_webp(good[:20])  # truncated stream
    # lossy VP8 chunk is explicitly unsupported (falls to PIL/fake upstream)
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode_webp(lossy)


def test_webp_dispatch_in_decode_stage():
    """The multimodal decode stage routes WebP payloads through the real
    codec: mean intensity must match the raster exactly (lossless)."""
    from imagededupx_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    stage = ImageDecodeStage(allow_fake=True)
    w, h, mean = stage._decode_one(encode_webp_lossless(img, subtract_green=True))
    assert (w, h) == (48, 32)
    gray_mean = float(
        (
            0.299 * img[:, :, 0].astype(np.float64)
            + 0.587 * img[:, :, 1].astype(np.float64)
            + 0.114 * img[:, :, 2].astype(np.float64)
        ).mean()
    )
    assert abs(mean - gray_mean) < 1.0


def test_webp_planted_near_dup_survives_codec():
    """A noised near-duplicate encoded as WebP stays hamming-close under
    phash after a real decode round-trip (the dup-mining invariant)."""
    from imagededupx_ray.functions.imagehash import phash, to_grayscale

    rng = np.random.default_rng(9)
    base = rng.random((8, 8))
    from imagededupx_ray.functions.imagehash import resize_area

    img = (resize_area(base, 64, 64) * 255).astype(np.uint8)
    noised = np.clip(
        img.astype(np.int64) + rng.integers(-6, 7, size=img.shape), 0, 255
    ).astype(np.uint8)
    a = to_grayscale(decode_webp(encode_webp_lossless(img)))
    b = to_grayscale(decode_webp(encode_webp_lossless(noised, predictor_mode=2)))
    ham = bin(int(phash(a)) ^ int(phash(b))).count("1")
    assert ham <= 10


# ---------------------------------------------------------------------------
# system-libwebp interop (functions/webp_native.py) — lossy VP8 path plus
# bit-exact cross-validation of the from-scratch VP8L codec against the
# format's reference implementation
# ---------------------------------------------------------------------------

webp_native = pytest.importorskip("imagededupx_ray.functions.webp_native")
_needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="system libwebp not present"
)


def _structured(h, w, seed=5):
    rng = np.random.default_rng(seed)
    x = (np.linspace(0, 255, w)[None, :] + np.linspace(0, 128, h)[:, None]) % 256
    img = np.stack([x, x[::-1], (x / 2) + 7], axis=2).astype(np.uint8)
    img[h // 4 : h // 2, w // 4 : w // 2] = rng.integers(0, 256, 3)
    return img


@_needs_libwebp
def test_webp_lossy_vp8_decodes_through_dispatch():
    """Lossy VP8 payloads (libwebp encode) decode via decode_webp with high
    fidelity, including odd (non-multiple-of-16) dimensions and grayscale
    input."""
    for h, w in [(57, 83), (16, 16), (31, 47), (128, 96)]:
        img = _structured(h, w)
        payload = webp_native.encode_rgb(img, quality=92)
        assert is_webp(payload)
        out = decode_webp(payload)
        assert out.shape == (h, w, 3)
        mse = np.mean((out.astype(np.float64) - img) ** 2)
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 20, (h, w, mse)
    gray = _structured(40, 56)[:, :, 0]
    out = decode_webp(webp_native.encode_rgb(gray, quality=95))
    assert out.shape == (40, 56, 3)


@_needs_libwebp
def test_webp_vp8l_interop_ours_to_libwebp():
    """Our from-scratch VP8L encoder's output decodes BIT-EXACTLY in the
    reference libwebp decoder, across transform variants."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    grad = _structured(24, 40)
    variants = [
        encode_webp_lossless(img),
        encode_webp_lossless(img, subtract_green=True, cache_bits=5),
        encode_webp_lossless(grad, predictor_mode=11),
        encode_webp_lossless(grad, subtract_green=True),
    ]
    for i, (payload, want) in enumerate(
        zip(variants, [img, img, grad, grad])
    ):
        got = webp_native.decode_rgb(payload)
        assert np.array_equal(got, want), f"variant {i}"


@_needs_libwebp
def test_webp_vp8l_interop_libwebp_to_ours():
    """The reference libwebp lossless encoder's output decodes BIT-EXACTLY
    in our from-scratch VP8L decoder (real-world bitstreams: libwebp picks
    its own transforms, meta prefix codes and cache sizes)."""
    rng = np.random.default_rng(13)
    for img in [
        rng.integers(0, 256, (19, 27, 3), dtype=np.uint8),
        _structured(64, 96),
        np.tile(np.arange(8, dtype=np.uint8) * 31, (40, 5))[:, :, None].repeat(3, 2),
    ]:
        payload = webp_native.encode_lossless_rgb(img)
        got = decode_webp(payload)
        assert np.array_equal(got, img)


@_needs_libwebp
def test_webp_lossy_planted_near_dup_survives():
    """A near-dup pair split across lossy VP8 and lossless encodes keeps a
    small phash hamming distance (the dup-mining invariant for the mixed
    corpus rotation)."""
    from imagededupx_ray.functions.imagehash import phash

    img = _structured(64, 64, seed=21)
    dup = img.copy()
    dup[5:9, 5:9] = 255  # small local edit, near-dup by construction
    h_lossy = phash(decode_webp(webp_native.encode_rgb(img, quality=90)))
    h_lossless = phash(decode_webp(encode_webp_lossless(dup)))
    dist = bin(int(h_lossy) ^ int(h_lossless)).count("1")
    assert dist <= 10, dist
