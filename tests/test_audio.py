"""Audio modality: WAV codec exactness, feature kernels vs analytical
signals, landmark fingerprint robustness, and the fingerprint-bucket dup
mining exchange (stages/audio.py — the multimodal generalization of the
reference's image feature pipeline, improved_faiss_detector.py:145-257)."""

import numpy as np
import pytest

from imagededupx_ray.functions import audiofeat as AF
from imagededupx_ray.functions.wav import decode_wav, encode_wav


def _tone(freq, dur=1.0, rate=8000, amp=0.5):
    t = np.arange(int(dur * rate)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_pcm16():
    x = _tone(440)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 1.0 / 32767 + 1e-9


def test_wav_stereo_and_8bit():
    import struct

    x = np.stack([_tone(300), _tone(600)], axis=1)
    y, rate = decode_wav(encode_wav(x, 44100))
    assert rate == 44100 and y.shape == x.shape
    # hand-built 8-bit mono file decodes through the u8 path
    pcm = np.array([0, 128, 255], dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    y8, _ = decode_wav(data)
    assert np.allclose(y8, [-1.0, 0.0, 127 / 128])


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_clip_features_analytical():
    """A pure 440 Hz tone: centroid == 440 (±1 bin), ZCR == 2*f."""
    rate = 8000
    f = AF.clip_features(_tone(440, rate=rate), rate)
    bin_hz = rate / 1024
    assert abs(f["centroid_hz"] - 440) < bin_hz
    assert abs(f["zcr_hz"] - 880) < 5
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(f["duration_sec"] - 1.0) < 1e-9
    # silence is all-zero, not NaN
    z = AF.clip_features(np.zeros(4000), rate)
    assert z["centroid_hz"] == 0.0 and z["rms"] == 0.0
    assert AF.clip_features(np.empty(0), rate)["duration_sec"] == 0.0


def test_fingerprints_match_under_noise_and_gain():
    """Landmarks survive gain change + light noise (the near-dup
    transformations) but differ across independent clips."""
    rate = 8000
    t = np.arange(rate) / rate
    x = 0.4 * np.sin(2 * np.pi * (500 * t + 400 * t**2)) + 0.3 * np.sin(
        2 * np.pi * (1500 * t - 300 * t**2)
    )
    rng = np.random.default_rng(1)
    dup = x * 0.85 + rng.normal(0, 0.004, len(x))
    other = 0.4 * np.sin(2 * np.pi * (900 * t + 100 * t**2))
    f1 = AF.landmark_fingerprints(x, rate)
    f2 = AF.landmark_fingerprints(dup, rate)
    f3 = AF.landmark_fingerprints(other, rate)
    assert len(f1) > 20
    overlap_dup = len(np.intersect1d(f1, f2)) / len(f1)
    overlap_other = len(np.intersect1d(f1, f3)) / len(f1)
    assert overlap_dup > 0.5, overlap_dup
    assert overlap_other < 0.2, overlap_other


def test_audio_dup_pairs_end_to_end(ray_session):
    """Planted near-duplicate clips surface as fingerprint-bucket pairs
    with full recall and no false positives on the synthetic corpus."""
    import ray.data as rd

    from imagededupx_ray.stages.audio import (
        audio_features,
        fingerprint_dup_pairs,
        synthetic_wav_clips,
    )

    n, dup_every = 50, 5
    feats = audio_features(
        rd.from_arrow(synthetic_wav_clips(n, dup_every=dup_every)), concurrency=1
    )
    pairs = fingerprint_dup_pairs(feats).to_pandas()
    planted = {
        (i - 1, i) for i in range(n) if i % dup_every == dup_every - 1 and i > 0
    }
    got = {(int(r.a), int(r.b)) for _, r in pairs.iterrows()}
    assert got == planted, (sorted(planted - got), sorted(got - planted))
    assert (pairs["match_frac"] >= 0.25).all()


def test_audio_features_schema(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.audio import audio_features, synthetic_wav_clips

    out = audio_features(
        rd.from_arrow(synthetic_wav_clips(12)), concurrency=1, batch_size=4
    ).to_pandas()
    assert len(out) == 12
    assert {
        "clip_id",
        "duration_sec",
        "rms",
        "zcr_hz",
        "centroid_hz",
        "bandwidth_hz",
        "rolloff_hz",
        "n_landmarks",
        "fingerprints",
    } <= set(out.columns)
    assert (out["duration_sec"] > 0).all()
    assert (out["n_landmarks"] == out["fingerprints"].map(len)).all()
