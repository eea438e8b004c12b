"""Real classical image features — the non-deep block of the reference's
combined extractor (color-histogram + LBP, improved_faiss_detector.py:208-229;
the ResNet/ViT blocks need torch and stay behind the declared actor-pool
seam). Pure numpy, fully vectorized.

Layout (FEATURE layout consumed by stages/multimodal.ImageDecodeStage):
  [0:64)    4x4x4 joint RGB histogram (density) — coarse color signature
  [64:128)  256-code 8-neighbor LBP histogram folded 4->1 (density) —
            brightness-monotone texture signature (LBP compares pixels to
            their neighborhood center, so any monotone luma rescale leaves
            the codes unchanged)
The concatenated vector is L2-normalized.
"""

from __future__ import annotations

import numpy as np

CLASSICAL_DIM = 128


def _as_rgb(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[-1] > 3:
        a = a[..., :3]
    return a.astype(np.uint8, copy=False)


def color_hist64(arr: np.ndarray) -> np.ndarray:
    """4x4x4 joint RGB histogram as a density vector (64,) float64."""
    rgb = _as_rgb(arr)
    q = rgb >> 6  # 4 levels per channel
    idx = (
        q[..., 0].astype(np.int64) * 16
        + q[..., 1].astype(np.int64) * 4
        + q[..., 2].astype(np.int64)
    )
    h = np.bincount(idx.ravel(), minlength=64).astype(np.float64)
    return h / max(h.sum(), 1.0)


def lbp_hist64(arr: np.ndarray) -> np.ndarray:
    """8-neighbor LBP code histogram (256 codes folded 4->1) as a density
    vector (64,) float64; images smaller than 3x3 return zeros."""
    from imagededupx_ray.functions.imagehash import to_grayscale

    g = to_grayscale(_as_rgb(arr)).astype(np.float64)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return np.zeros(64, dtype=np.float64)
    c = g[1:-1, 1:-1]
    shifts = [
        g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:],
        g[1:-1, 2:], g[2:, 2:], g[2:, 1:-1],
        g[2:, :-2], g[1:-1, :-2],
    ]
    code = np.zeros(c.shape, dtype=np.int64)
    for k, nb in enumerate(shifts):
        code |= (nb >= c).astype(np.int64) << k
    h = np.bincount(code.ravel(), minlength=256).astype(np.float64)
    h = h.reshape(64, 4).sum(axis=1)
    return h / max(h.sum(), 1.0)


def classical_features(arr: np.ndarray) -> np.ndarray:
    """L2-normalized (CLASSICAL_DIM,) float32 feature vector."""
    v = np.concatenate([color_hist64(arr), lbp_hist64(arr)])
    return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)
