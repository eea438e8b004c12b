"""Video modality: MJV1 frame container, seek-past-unsampled-frames
sampling, the frame-hash fan-out stage, and video-level dup lifting
(stages/video.py — the reference's image dedup pipeline extended to frame
sequences)."""

import numpy as np
import pytest

from imagededupx_ray.stages.video import (
    encode_video,
    iter_video_frames,
    synthetic_video_clips,
)


def _frames(n=6, h=32, w=40, seed=0):
    rng = np.random.default_rng(seed)
    from imagededupx_ray.functions.imagehash import resize_area

    base = rng.random((h // 4, w // 4))
    return [
        np.clip((resize_area(base, h, w) * 255) + 3 * i, 0, 255).astype(np.uint8)
        for i in range(n)
    ]


def test_container_roundtrip_and_sampling():
    frames = _frames(7)
    payload = encode_video(frames, fps=4, quality=95)
    out = list(iter_video_frames(payload, every_k=1))
    assert [i for i, _ in out] == list(range(7))
    for (_, dec), orig in zip(out, frames):
        assert dec.shape == orig.shape
        assert np.abs(dec.astype(int) - orig.astype(int)).mean() < 3.0
    # every_k skips frames without decoding them
    sampled = [i for i, _ in iter_video_frames(payload, every_k=3)]
    assert sampled == [0, 3, 6]
    with pytest.raises(ValueError, match="MJV1"):
        next(iter_video_frames(b"garbage", 1))


def test_frame_hash_stage_fans_out(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.video import video_frame_hashes

    tbl = synthetic_video_clips(6, n_frames=10)
    out = video_frame_hashes(
        rd.from_arrow(tbl), every_k=2, concurrency=1, batch_size=4
    ).to_pandas()
    assert len(out) == 6 * 5  # 10 frames sampled every 2
    assert set(out["frame_idx"]) == {0, 2, 4, 6, 8}
    assert (out["width"] == 64).all() and (out["height"] == 48).all()
    # consecutive frames of one video are near but not identical
    assert out.groupby("video_id")["phash"].nunique().min() >= 2


def test_video_dup_pairs_end_to_end(ray_session):
    """Re-encoded-at-lower-quality copies (the classic re-upload dup) must
    surface as video pairs with full recall and no false positives."""
    import ray.data as rd

    from imagededupx_ray.stages.video import video_dup_pairs, video_frame_hashes

    n, dup_every = 30, 5
    fh = video_frame_hashes(
        rd.from_arrow(synthetic_video_clips(n, dup_every=dup_every)),
        every_k=2,
        concurrency=1,
    )
    pairs = video_dup_pairs(fh).to_pandas()
    planted = {
        (i - 1, i) for i in range(n) if i % dup_every == dup_every - 1 and i > 0
    }
    got = {(int(r.a), int(r.b)) for _, r in pairs.iterrows()}
    assert got == planted, (sorted(planted - got), sorted(got - planted))
    assert (pairs["match_frac"] >= 0.5).all()
