"""Baseline JPEG codec correctness (functions/jpeg.py) + the image near-dup
pipeline over genuine JPEG files (SURVEY.md §2.1 S11 — the reference's
dominant encoded-image input shape, utils/image_util.py:23-107).

The codec has no external oracle in this container (no PIL), so correctness
rests on: (a) an analytical single-block vector where the expected output is
exact, (b) encoder->decoder roundtrips whose error must stay within the
quantization-step bound across subsampling/restart/quality settings, and
(c) structure assertions on the emitted marker stream."""

import struct

import numpy as np
import pytest

from imagededupx_ray.functions.jpeg import (
    JPEG_SIGNATURE,
    decode_jpeg,
    encode_jpeg,
)


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1).astype(
        np.uint8
    )


def test_flat_gray_block_is_exact():
    """A flat 128-gray 8x8 block quantizes to all-zero coefficients: the
    decode must reproduce it EXACTLY at any quality (analytical vector —
    no oracle needed)."""
    img = np.full((8, 8), 128, dtype=np.uint8)
    for q in (50, 75, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == (8, 8)
        assert (out == img).all()


def test_dc_only_block_is_near_exact():
    """A flat non-128 block is a pure DC coefficient; the roundtrip error is
    at most half the DC quantization step (= 2 at quality 95)."""
    for level in (0, 37, 200, 255):
        img = np.full((16, 24), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(out.astype(int) - int(level)).max() <= 2


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("quality", [75, 90, 95])
def test_rgb_roundtrip_error_bounded(subsample, quality):
    img = _gradient_rgb(40, 56)
    data = encode_jpeg(img, quality=quality, subsample=subsample)
    assert data[:3] == JPEG_SIGNATURE
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth gradients survive quantization almost exactly; subsampled
    # chroma adds bounded edge error
    assert err.max() <= (8 if subsample else 4), err.max()
    assert err.mean() <= 2.0


def test_gray_roundtrip_and_odd_dimensions():
    """Non-multiple-of-8 (and of-16 when subsampled) dims pad+crop cleanly."""
    rng = np.random.default_rng(7)
    base = rng.random((5, 7))
    from imagededupx_ray.functions.imagehash import resize_area

    img = (resize_area(base, 33, 47) * 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6

    rgb = _gradient_rgb(35, 41)
    out2 = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    assert out2.shape == rgb.shape


@pytest.mark.parametrize("restart_interval", [1, 2, 5])
def test_restart_marker_resync(restart_interval):
    """DRI + RSTn markers reset the DC predictors; the decode must still
    match (exercises the segment-split + resync path)."""
    img = _gradient_rgb(48, 64)
    data = encode_jpeg(img, quality=90, restart_interval=restart_interval)
    assert b"\xff\xdd" in data  # DRI segment present
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_marker_stream_structure():
    """SOF0 carries the exact frame dims; quant/huffman segments present."""
    img = _gradient_rgb(21, 34)
    data = encode_jpeg(img, quality=90)
    sof = data.find(b"\xff\xc0")
    assert sof >= 0
    h, w = struct.unpack(">HH", data[sof + 5 : sof + 9])
    assert (h, w) == (21, 34)
    assert data.count(b"\xff\xdb") == 2  # luma + chroma quant tables
    assert data.count(b"\xff\xc4") == 4  # DC/AC x luma/chroma
    assert data[-2:] == b"\xff\xd9"


def test_rejects_arithmetic_and_garbage():
    img = _gradient_rgb(16, 16)
    data = bytearray(encode_jpeg(img))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")


def test_phash_dup_pairs_on_planted_jpeg_near_dups(ray_session):
    """End-to-end: JPEG-encoded planted near-duplicates must surface as
    phash-band LSH pairs — the namesake image-dedup pipeline on genuine
    encoded files in the web's dominant codec (no fake kernel on this
    path), robust to the codec's lossy quantization."""
    import ray.data as rd

    from imagededupx_ray.stages.multimodal import (
        decode_raw_image,
        perceptual_hashes,
        synthetic_jpeg_images,
        synthetic_raw_images,
    )
    from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

    n, dup_every = 100, 5
    jpegs = synthetic_jpeg_images(n, dup_every=dup_every)
    # lossy but close: JPEG payloads decode near the RAW pixels they encode
    raws = synthetic_raw_images(n, dup_every=dup_every)
    a0 = decode_jpeg(jpegs["payload"][0].as_py())
    b0 = decode_raw_image(raws["payload"][0].as_py())
    if b0.ndim == 2:
        b0 = np.repeat(b0[:, :, None], 3, axis=2)
    assert a0.shape == b0.shape
    assert np.abs(a0.astype(int) - b0.astype(int)).mean() <= 4.0

    hashes = perceptual_hashes(rd.from_arrow(jpegs))
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


def test_decode_stage_reads_jpeg_dimensions(ray_session):
    """ImageDecodeStage reports true (width, height, mean_luma) for JPEG
    payloads through the real codec (not the blake2b fake)."""
    import ray.data as rd

    from imagededupx_ray.stages.multimodal import decode_images, synthetic_jpeg_images

    tbl = synthetic_jpeg_images(12, dup_every=4)
    out = decode_images(rd.from_arrow(tbl), concurrency=1, batch_size=8).to_pandas()
    assert len(out) == 12
    for _, row in out.iterrows():
        arr = decode_jpeg(tbl["payload"][int(row.image_id)].as_py())
        assert (row.width, row.height) == (arr.shape[1], arr.shape[0])
        from imagededupx_ray.functions.imagehash import to_grayscale

        assert abs(row.mean_luma - float(to_grayscale(arr).mean())) < 1e-3


@pytest.mark.parametrize("sub", [False, True])
def test_multiscan_decodes_identical_to_baseline(sub):
    """Baseline NON-interleaved multi-scan (one SOS per component, each scan
    on the component's own ceil-grid) must decode bit-identically to the
    interleaved baseline encode of the same image (same quantized
    coefficients, different scan layout)."""
    from imagededupx_ray.functions.jpeg import encode_jpeg_multiscan

    img = _gradient_rgb(37, 53)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
    data = encode_jpeg_multiscan(img, quality=90, subsample=sub)
    assert data.count(b"\xff\xda") == 3  # one SOS per component
    assert (decode_jpeg(data) == base).all()


@pytest.mark.parametrize("sub,al", [(False, 1), (True, 1), (False, 0)])
def test_progressive_decodes_identical_to_baseline(sub, al):
    """Progressive (SOF2, spectral selection + successive approximation:
    DC first/refine, per-component AC first/refine with EOB runs) is a
    lossless reordering of the baseline coefficients — decode must be
    BIT-IDENTICAL to the baseline decode at the same quality."""
    from imagededupx_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    for img in [
        _gradient_rgb(48, 64),
        rng.integers(0, 256, (41, 57, 3), dtype=np.uint8),
        rng.integers(0, 256, (30, 22), dtype=np.uint8),  # grayscale
    ]:
        s = sub and img.ndim == 3
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=s))
        data = encode_jpeg_progressive(img, quality=85, subsample=s, al=al)
        assert b"\xff\xc2" in data  # SOF2
        assert (decode_jpeg(data) == base).all()
