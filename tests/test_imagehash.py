"""Perceptual image-hash kernels vs pure-python per-pixel oracles
(SURVEY.md §2.2 M5; reference utils/imagehash.py:159-347)."""

import numpy as np
import pytest

from imagededupx_ray.functions import imagehash as IH


def _resize_oracle(img, out_h, out_w):
    h, w = img.shape
    out = np.zeros((out_h, out_w))
    sh, sw = h / out_h, w / out_w
    for i in range(out_h):
        for j in range(out_w):
            lo_i, hi_i = i * sh, (i + 1) * sh
            lo_j, hi_j = j * sw, (j + 1) * sw
            acc = wsum = 0.0
            for y in range(int(np.floor(lo_i)), min(int(np.ceil(hi_i)), h)):
                wy = min(hi_i, y + 1) - max(lo_i, y)
                for x in range(int(np.floor(lo_j)), min(int(np.ceil(hi_j)), w)):
                    wx = min(hi_j, x + 1) - max(lo_j, x)
                    acc += wy * wx * img[y, x]
                    wsum += wy * wx
            out[i, j] = acc / wsum
    return out


def test_resize_area_matches_oracle():
    rng = np.random.default_rng(5)
    for h, w, oh, ow in [(17, 23, 8, 8), (8, 8, 8, 8), (50, 40, 8, 9), (6, 6, 8, 8)]:
        img = rng.random((h, w)) * 255
        assert np.allclose(IH.resize_area(img, oh, ow), _resize_oracle(img, oh, ow))


def test_dct2_matches_definition():
    rng = np.random.default_rng(6)
    x = rng.random((8, 8))
    # oracle: unnormalized DCT-II applied along axis 0 then axis 1
    def dct1(v):
        n = len(v)
        return np.array(
            [2 * sum(v[j] * np.cos(np.pi * k * (2 * j + 1) / (2 * n)) for j in range(n)) for k in range(n)]
        )

    step0 = np.stack([dct1(x[:, c]) for c in range(8)], axis=1)
    want = np.stack([dct1(step0[r, :]) for r in range(8)], axis=0)
    assert np.allclose(IH.dct2(x), want)


def _bits_to_int(bits):
    out = 0
    for b in np.asarray(bits).reshape(-1):
        out = (out << 1) | int(b)
    return out


def test_hashes_match_pure_python_oracle():
    rng = np.random.default_rng(7)
    img = rng.random((37, 41)) * 255

    p8 = _resize_oracle(img, 8, 8)
    assert IH.average_hash(img) == _bits_to_int(p8 > p8.mean())

    p89 = _resize_oracle(img, 8, 9)
    assert IH.dhash(img) == _bits_to_int(p89[:, 1:] > p89[:, :-1])

    p32 = _resize_oracle(img, 32, 32)
    d = IH.dct2(p32)[:8, :8]
    assert IH.phash(img) == _bits_to_int(d > np.median(d))

    p64 = _resize_oracle(img, 64, 64) / 255.0
    p64 = p64 - p64.mean()
    ll = p64.copy()
    for _ in range(3):  # 64 -> 8 is 3 haar levels
        ll = (ll[0::2, 0::2] + ll[0::2, 1::2] + ll[1::2, 0::2] + ll[1::2, 1::2]) / 2
    assert IH.whash(img) == _bits_to_int(ll > np.median(ll))

    p98 = _resize_oracle(img, 9, 8)
    assert IH.dhash_vertical(img) == _bits_to_int(p98[1:, :] > p98[:-1, :])

    def dct1(v):
        n = len(v)
        return np.array(
            [2 * sum(v[j] * np.cos(np.pi * k * (2 * j + 1) / (2 * n)) for j in range(n)) for k in range(n)]
        )

    d_rows = np.stack([dct1(p32[r, :]) for r in range(32)], axis=0)
    low = d_rows[:8, 1:9]
    assert IH.phash_simple(img) == _bits_to_int(low > low.mean())


def test_grayscale_and_rgb_paths():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    g = IH.to_grayscale(rgb)
    want = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    assert np.allclose(g, want)
    # colorhash: deterministic, distinguishes hue families
    red = np.zeros((16, 16, 3), dtype=np.uint8)
    red[..., 0] = 200
    blue = np.zeros((16, 16, 3), dtype=np.uint8)
    blue[..., 2] = 200
    assert IH.colorhash(red) != IH.colorhash(blue)
    assert IH.colorhash(red) == IH.colorhash(red)


def test_near_dup_hamming_separation():
    """A noised copy must be hamming-close; independent images far —
    the property that makes these hashes dedup operators."""
    rng = np.random.default_rng(9)
    base = IH.resize_area(rng.random((9, 9)), 64, 72) * 255
    noisy = np.clip(base + rng.integers(-5, 6, size=base.shape), 0, 255)
    other = IH.resize_area(rng.random((9, 9)), 64, 72) * 255
    for fn in (IH.average_hash, IH.phash, IH.dhash, IH.whash):
        near = IH.hamming64(fn(base), fn(noisy))
        far = IH.hamming64(fn(base), fn(other))
        assert near <= 8, (fn.__name__, near)
        assert far >= 12, (fn.__name__, far)


def test_perceptual_hash_stage(ray_session):
    """Ray-side plumbing: actor-pool stage over RAW rasters; planted
    near-dups land hamming-close on phash."""
    import ray.data as rd

    from imagededupx_ray.stages.multimodal import (
        perceptual_hashes,
        synthetic_raw_images,
    )

    tbl = synthetic_raw_images(60, seed=11, dup_every=5)
    out = perceptual_hashes(rd.from_arrow(tbl)).to_pandas().sort_values("image_id")
    assert len(out) == 60
    assert {"ahash", "phash", "dhash", "whash", "colorhash"} <= set(out.columns)
    ph = out.set_index("image_id")["phash"]
    near = [
        IH.hamming64(int(ph[i]) & (2**64 - 1), int(ph[i - 1]) & (2**64 - 1))
        for i in range(4, 60, 5)
    ]
    assert np.median(near) <= 10, near


def test_image_phash_dup_pairs_query(ray_session):
    """The phash-band LSH query equals brute-force popcount pairing over the
    same hash table AND recovers most planted near-dups."""
    from imagededupx_ray.queries import image_perceptual_hashes, image_phash_dup_pairs

    hashes = image_perceptual_hashes("unused").to_pandas().sort_values("image_id")
    got = image_phash_dup_pairs("unused", hamming_max=10).to_pandas()
    codes = hashes.set_index("image_id")["phash"].astype(np.uint64)
    ids = codes.index.to_numpy()
    vals = codes.to_numpy()
    ham = np.zeros((len(ids), len(ids)), dtype=np.int64)
    x = vals[:, None] ^ vals[None, :]
    for shift in range(64):
        ham += ((x >> np.uint64(shift)) & np.uint64(1)).astype(np.int64)
    ii, jj = np.nonzero(ham <= 10)
    keep = ids[ii] < ids[jj]
    want = {(int(a), int(b)) for a, b in zip(ids[ii[keep]], ids[jj[keep]])}
    assert {(int(r.a), int(r.b)) for _, r in got.iterrows()} == want
    # planted near-dups (i-1, i) for i = 4, 9, ... are mostly recovered
    planted = {(i - 1, i) for i in range(4, 200, 5)}
    found = {(int(r.a), int(r.b)) for _, r in got.iterrows()}
    assert len(planted & found) >= len(planted) * 0.6


def test_crop_resistant_hash_survives_cropping():
    """The multi-hash keeps matching after a 25% crop that flips the plain
    dhash well past any sane cutoff (the property the paper claims)."""
    rng = np.random.default_rng(21)
    # structured image: textured bright blobs on a dark field (uniform blobs
    # would make every region dhash identical and the test vacuous)
    img = np.zeros((240, 240))
    for _ in range(5):
        y, x = rng.integers(20, 180, size=2)
        tex = IH.resize_area(rng.random((6, 6)), 50, 50) * 90 + 160
        img[y : y + 50, x : x + 50] = tex
    crop = img[60:, 60:]  # 25% off each leading edge
    h_full = IH.crop_resistant_hash(img, min_segment_size=100)
    h_crop = IH.crop_resistant_hash(crop, min_segment_size=100)
    assert len(h_full) >= 2
    assert IH.multihash_matches(h_full, h_crop)
    # an unrelated textured image scores a worse (matches, -distance) pair
    other = IH.resize_area(rng.random((8, 8)), 240, 240) * 255
    h_other = IH.crop_resistant_hash(other, min_segment_size=100)
    m_same, d_same = IH.multihash_diff(h_full, h_crop)
    m_diff, d_diff = IH.multihash_diff(h_full, h_other)
    assert (m_same, -d_same) > (m_diff, -d_diff)


def test_find_segments_two_blobs():
    img = np.zeros((60, 60))
    img[5:25, 5:25] = 255
    img[35:55, 35:55] = 255
    segs = IH.find_segments(img, segment_threshold=128, min_segment_size=50)
    sizes = sorted(len(s) for s in segs)
    assert len(segs) == 3  # two hills + the dark background valley
    assert sizes[0] == sizes[1] == 400


def test_raw_codec_roundtrip():
    from imagededupx_ray.stages.multimodal import decode_raw_image, encode_raw_image

    rng = np.random.default_rng(12)
    g = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
    assert (decode_raw_image(encode_raw_image(g)) == g).all()
    c = rng.integers(0, 256, size=(10, 11, 3), dtype=np.uint8)
    assert (decode_raw_image(encode_raw_image(c)) == c).all()
