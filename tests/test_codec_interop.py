"""Cross-implementation codec gates vs the SYSTEM libs (VERDICT r4 #10):
TIFF and progressive/multi-scan JPEG previously gated against self-encodes
only — a self-consistent-but-wrong codec would pass. These fuzz both
directions against libtiff / libjpeg (the VP8L↔libwebp both-ways model)
and skip cleanly when the lib/header/compiler is absent."""

import numpy as np
import pytest

from imagededupx_ray.functions import jpeg_native as JN
from imagededupx_ray.functions import tiff_native as TN
from imagededupx_ray.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_multiscan,
    encode_jpeg_progressive,
)
from imagededupx_ray.functions.tiff import decode_tiff, encode_tiff

needs_tiff = pytest.mark.skipif(not TN.available(), reason="system libtiff absent")
needs_jpeg = pytest.mark.skipif(
    not JN.available(), reason="system libjpeg/header/compiler absent"
)


def _fuzz_rasters(n: int, seed: int = 7):
    """Mixed fuzz corpus: pure noise, gradients+noise, flat runs (PackBits'
    best case), single-pixel and thin shapes."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        kind = i % 4
        if kind == 0:
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        elif kind == 1:
            y, x = np.mgrid[0:h, 0:w]
            base = ((x * int(rng.integers(1, 9)) + y * 3) % 256).astype(np.uint8)
            arr = np.stack([base, base[::-1], (base + 64) % 256], axis=2).astype(
                np.uint8
            )
        elif kind == 2:
            arr = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
            if h * w > 4:
                arr[h // 2, : w // 2] = 255 - arr[h // 2, : w // 2]
        else:
            arr = np.tile(
                rng.integers(0, 256, size=(1, w, 3), dtype=np.uint8), (h, 1, 1)
            )
        yield arr


@needs_tiff
@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
def test_tiff_ours_decoded_by_libtiff(compression):
    for arr in _fuzz_rasters(12, seed=11):
        got = TN.decode_rgb(encode_tiff(arr, compression=compression))
        assert np.array_equal(got, arr), (arr.shape, compression)


@needs_tiff
@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
def test_tiff_libtiff_decoded_by_ours(compression):
    for arr in _fuzz_rasters(12, seed=13):
        got = decode_tiff(TN.encode_rgb(arr, compression=compression))
        assert np.array_equal(got, arr), (arr.shape, compression)


@needs_jpeg
@pytest.mark.parametrize("quality", [40, 75, 92])
def test_jpeg_layouts_identical_through_libjpeg(quality):
    """Our progressive and multi-scan encodes carry the SAME quantized
    coefficients as our baseline encode — libjpeg must decode all three
    bit-identically (the reorder-only property, now against a reference
    decoder instead of a self-decode)."""
    for i, arr in enumerate(_fuzz_rasters(8, seed=17)):
        if arr.shape[0] < 2 or arr.shape[1] < 2:
            continue
        base = JN.decode_rgb(encode_jpeg(arr, quality=quality))
        prog = JN.decode_rgb(encode_jpeg_progressive(arr, quality=quality))
        multi = JN.decode_rgb(encode_jpeg_multiscan(arr, quality=quality))
        assert np.array_equal(base, prog), (i, arr.shape)
        assert np.array_equal(base, multi), (i, arr.shape)


@needs_jpeg
@pytest.mark.parametrize("quality", [40, 75, 92])
def test_jpeg_libjpeg_encodes_through_our_decoder(quality):
    """libjpeg's baseline and jpeg_simple_progression encodes of the same
    raster at the same settings are coefficient-identical — OUR decoder
    must produce bit-identical pixels for both (progressive decode path
    validated against reference-encoder output), and grayscale pixels must
    match libjpeg's own decode within IDCT rounding (|d| <= 2; RGB adds
    chroma-upsampling differences — libjpeg fancy vs our box filter — so
    the RGB cross check bounds the MEAN instead)."""
    for i, arr in enumerate(_fuzz_rasters(8, seed=19)):
        gray = arr[:, :, 0].copy()
        lb = JN.encode(gray, quality=quality, progressive=False)
        lp = JN.encode(gray, quality=quality, progressive=True)
        ours_b, ours_p = decode_jpeg(lb), decode_jpeg(lp)
        assert np.array_equal(ours_b, ours_p), (i, gray.shape)
        ref = JN.decode_rgb(lb)
        a = ours_b if ours_b.ndim == 2 else ours_b[:, :, 0]
        r = ref if ref.ndim == 2 else ref[:, :, 0]
        d = np.abs(a.astype(int) - r.astype(int))
        assert d.max() <= 2, (i, gray.shape, d.max())
        # RGB: bit-identity between libjpeg's two layouts through our
        # decoder still holds exactly; cross-decoder pixels bound the mean
        lb3 = JN.encode(arr, quality=quality, progressive=False)
        lp3 = JN.encode(arr, quality=quality, progressive=True)
        ours3_b, ours3_p = decode_jpeg(lb3), decode_jpeg(lp3)
        assert np.array_equal(ours3_b, ours3_p), (i, arr.shape)
        ref3 = JN.decode_rgb(lb3)
        d3 = np.abs(ours3_b.astype(int) - ref3.astype(int))
        # loose sanity bound only: libjpeg's fancy (triangular) chroma
        # upsampling vs our box replication legitimately diverges up to
        # mean ~13 on NOISE chroma (measured); the exact gates above carry
        # the correctness weight
        assert d3.mean() <= 16.0, (i, arr.shape, d3.mean(), d3.max())


@needs_jpeg
def test_jpeg_gray_roundtrip_parity_high_quality():
    """At quality 97 on a smooth ramp both decoders must reconstruct the
    source closely AND agree with each other (end-to-end sanity that the
    tolerance gates above aren't hiding a broken pipeline)."""
    y, x = np.mgrid[0:32, 0:32]
    arr = ((x + y) * 4 % 256).astype(np.uint8)
    payload = JN.encode(arr, quality=97)
    ours = decode_jpeg(payload)
    if ours.ndim == 3:
        ours = ours[:, :, 0]
    ref = JN.decode_rgb(payload)
    if ref.ndim == 3:
        ref = ref[:, :, 0]
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
