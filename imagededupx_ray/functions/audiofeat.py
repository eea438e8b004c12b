"""Audio feature + fingerprint kernels — pure numpy (vectorized FFT paths).

Extends the reference's multimodal feature extraction (image features,
improved_faiss_detector.py:145-257) to the audio modality a web-scale
training-data pipeline ingests. Two kernel families:

- clip_features: per-clip scalar descriptors (duration, RMS energy,
  zero-crossing rate, spectral centroid / bandwidth / rolloff) computed
  from one framed STFT pass — the audio analogue of the docs quality
  scorer (functions/textstats.py).
- landmark_fingerprints: constellation fingerprints after Wang's
  "An Industrial-Strength Audio Search Algorithm" (ISMIR 2003, public):
  per-frame spectral peaks per log-spaced band -> (anchor, target) peak
  pairs hashed as (f1, f2, dt) -> a set of 64-bit landmark hashes per
  clip. Near-duplicate clips (re-encoded / noised / gain-shifted copies)
  share many landmarks, so dup mining is an exact hash-bucket join — the
  same groupby shape as MinHash LSH banding, no O(n²) anywhere.
"""

from __future__ import annotations

import numpy as np


def frame_signal(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(n,) -> (n_frames, frame) view via stride tricks (zero-copy)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, frame),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )


def _to_mono(x: np.ndarray) -> np.ndarray:
    return x.mean(axis=1) if x.ndim == 2 else x


def spectrogram(
    x: np.ndarray, frame: int = 1024, hop: int = 512
) -> np.ndarray:
    """Hann-windowed magnitude STFT: (n_frames, frame // 2 + 1)."""
    frames = frame_signal(_to_mono(x), frame, hop)
    win = np.hanning(frame)
    return np.abs(np.fft.rfft(frames * win, axis=1))


def clip_features(x: np.ndarray, rate: int, frame: int = 1024, hop: int = 512) -> dict:
    """Scalar descriptors for one clip (all vectorized, one STFT pass)."""
    mono = _to_mono(x)
    n = len(mono)
    if n == 0:
        return {
            "duration_sec": 0.0,
            "rms": 0.0,
            "zcr_hz": 0.0,
            "centroid_hz": 0.0,
            "bandwidth_hz": 0.0,
            "rolloff_hz": 0.0,
        }
    mag = spectrogram(mono, frame, hop)
    power = mag**2
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    frame_power = power.sum(axis=1)
    total = frame_power.sum()
    if total > 0:
        centroid = float((power @ freqs).sum() / total)
        bandwidth = float(
            np.sqrt((power @ (freqs**2)).sum() / total - centroid**2)
        )
        cum = np.cumsum(power.sum(axis=0))
        rolloff = float(freqs[np.searchsorted(cum, 0.85 * cum[-1])])
    else:
        centroid = bandwidth = rolloff = 0.0
    zc = np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
    return {
        "duration_sec": float(n / rate),
        "rms": float(np.sqrt(np.mean(mono**2))),
        "zcr_hz": float(zc / (n / rate)),
        "centroid_hz": centroid,
        "bandwidth_hz": bandwidth,
        "rolloff_hz": rolloff,
    }


def _band_peaks(mag: np.ndarray, n_bands: int) -> np.ndarray:
    """Per frame, the argmax bin inside each of ``n_bands`` log-spaced bands
    (excluding DC); peaks below the frame's mean magnitude are dropped
    (bin 0 sentinel). Returns (n_frames, n_bands) int32 bin indices."""
    n_bins = mag.shape[1]
    edges = np.unique(
        np.round(np.geomspace(1, n_bins - 1, n_bands + 1)).astype(np.int64)
    )
    while len(edges) < n_bands + 1:  # tiny spectra: pad by extending the end
        edges = np.append(edges, edges[-1] + 1)
    peaks = np.zeros((mag.shape[0], n_bands), dtype=np.int32)
    frame_mean = mag.mean(axis=1, keepdims=True)
    for b in range(n_bands):
        lo, hi = int(edges[b]), int(min(edges[b + 1], n_bins))
        if hi <= lo:
            continue
        seg = mag[:, lo:hi]
        idx = seg.argmax(axis=1) + lo
        val = seg.max(axis=1)
        peaks[:, b] = np.where(val > frame_mean[:, 0], idx, 0)
    return peaks


def landmark_fingerprints(
    x: np.ndarray,
    rate: int,
    frame: int = 1024,
    hop: int = 512,
    n_bands: int = 6,
    max_dt: int = 4,
) -> np.ndarray:
    """Clip -> sorted unique int64 landmark hashes. Each hash packs
    (anchor bin, target bin, frame delta): anchors in frame t pair with
    targets in frames t+1..t+max_dt (vectorized over the whole clip via
    array shifts — no per-peak loop)."""
    mag = spectrogram(x, frame, hop)
    peaks = _band_peaks(mag, n_bands)  # (T, B)
    T = peaks.shape[0]
    hashes = []
    for dt in range(1, max_dt + 1):
        if T <= dt:
            break
        f1 = peaks[:-dt]  # (T-dt, B) anchors
        f2 = peaks[dt:]  # (T-dt, B) targets
        # all band x band combinations per frame offset
        a = np.repeat(f1[:, :, None], peaks.shape[1], axis=2)
        b = np.repeat(f2[:, None, :], peaks.shape[1], axis=1)
        valid = (a > 0) & (b > 0)
        h = (
            (a.astype(np.int64) << np.int64(32))
            | (b.astype(np.int64) << np.int64(8))
            | np.int64(dt)
        )
        hashes.append(h[valid])
    if not hashes:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(hashes))
