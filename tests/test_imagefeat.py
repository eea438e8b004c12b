"""Classical image features (functions/imagefeat.py): densities, LBP
brightness-monotone invariance, near-dup similarity ordering, and the
decode-stage wiring (real features for decodable payloads, fake only for
undecodable bytes)."""

import numpy as np


def _img(rng, h=48, w=48):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_histograms_are_densities_and_deterministic():
    from imagededupx_ray.functions.imagefeat import (
        CLASSICAL_DIM,
        classical_features,
        color_hist64,
        lbp_hist64,
    )

    rng = np.random.default_rng(3)
    a = _img(rng)
    ch, lh = color_hist64(a), lbp_hist64(a)
    assert ch.shape == (64,) and lh.shape == (64,)
    assert abs(ch.sum() - 1.0) < 1e-9 and abs(lh.sum() - 1.0) < 1e-9
    f = classical_features(a)
    assert f.shape == (CLASSICAL_DIM,)
    assert abs(np.linalg.norm(f) - 1.0) < 1e-5
    assert np.array_equal(f, classical_features(a.copy()))
    # grayscale and RGBA inputs are accepted
    assert classical_features(a[..., 0]).shape == (CLASSICAL_DIM,)
    rgba = np.concatenate([a, np.full((48, 48, 1), 255, np.uint8)], axis=-1)
    assert np.allclose(classical_features(rgba), classical_features(a))


def test_lbp_invariant_to_monotone_brightness():
    from imagededupx_ray.functions.imagefeat import lbp_hist64

    rng = np.random.default_rng(5)
    g = rng.integers(0, 128, size=(40, 40), dtype=np.uint8)
    scaled = (g.astype(np.float64) * 1.5 + 10).astype(np.uint8)
    assert np.allclose(lbp_hist64(g), lbp_hist64(scaled))


def test_near_dup_images_closer_than_random():
    from imagededupx_ray.functions.imagefeat import classical_features

    rng = np.random.default_rng(7)
    a = _img(rng)
    noisy = np.clip(
        a.astype(np.int16) + rng.integers(-8, 9, size=a.shape), 0, 255
    ).astype(np.uint8)
    other = _img(rng)
    fa, fn, fo = (classical_features(x) for x in (a, noisy, other))
    assert float(fa @ fn) > float(fa @ fo)


def test_decode_stage_emits_real_features_for_decodable(ray_session):
    from imagededupx_ray.functions.imagefeat import classical_features
    from imagededupx_ray.functions.png import encode_png
    from imagededupx_ray.stages.multimodal import FEATURE_DIM, ImageDecodeStage

    rng = np.random.default_rng(9)
    a = _img(rng, 32, 32)
    stage = ImageDecodeStage()
    got = stage._features_one(encode_png(a))
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got, classical_features(a), atol=1e-6)
    # undecodable payload falls to the deterministic fake (still unit norm)
    fake = stage._features_one(b"not an image at all")
    assert fake.shape == (FEATURE_DIM,)
    assert abs(float(np.linalg.norm(fake)) - 1.0) < 1e-5
    assert not np.allclose(fake, got)


def test_image_feature_dup_pairs_recall_and_precision(ray_session):
    """The feature-cosine miner recovers every planted same-raster
    cross-codec pair (recall 1.0) and emits no cross-image pair at the
    0.99 threshold (measured non-dup max 0.845)."""
    from imagededupx_ray.queries import image_feature_dup_pairs

    out = image_feature_dup_pairs(None, n=60).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    expected = {(i - 1, i) for i in range(60) if i % 5 == 4}
    assert expected <= got, expected - got
    # every emitted pair is a planted pair or a chain through one raster
    assert got == expected, got - expected
    assert (out["cosine"] >= 0.99).all()
