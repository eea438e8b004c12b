"""Vectorized scalar distance/similarity kernels (SURVEY.md §2.8 —
the reference's utils/distance.py re-expressed over numpy arrays/matrices;
each cites its reference analogue file:line).

All operate on whole arrays (no per-row Python); intended for use inside
``map_batches`` kernels or driver-side re-ranking of small result sets.
"""

from __future__ import annotations

import numpy as np

from imagededupx_ray.functions.hashing import popcount64


def hamming_distance(a: np.ndarray, b: np.ndarray, normalize: bool = False):
    """Bitwise hamming distance of uint64 codes (distance.py:31-53)."""
    d = popcount64(np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return d / 64.0 if normalize else d


def euclidean_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise L2 (distance.py:56-60)."""
    return np.linalg.norm(np.asarray(a, float) - np.asarray(b, float), axis=-1)


def manhattan_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise L1 (distance.py:63-64)."""
    return np.abs(np.asarray(a, float) - np.asarray(b, float)).sum(axis=-1)


def chebyshev_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise L-inf (distance.py:67-68)."""
    return np.abs(np.asarray(a, float) - np.asarray(b, float)).max(axis=-1)


def minkowski_distance(a: np.ndarray, b: np.ndarray, p: float = 3.0) -> np.ndarray:
    """Row-wise Lp (distance.py:71-72)."""
    return (np.abs(np.asarray(a, float) - np.asarray(b, float)) ** p).sum(axis=-1) ** (
        1.0 / p
    )


def cos_sim(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Full cosine similarity matrix (utils/util.py:17-36 torch cos_sim)."""
    A = np.asarray(a, dtype=np.float64)
    B = np.asarray(b, dtype=np.float64)
    A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    return A @ B.T


def pairwise_cos_sim(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-aligned cosine (utils/util.py:59-84)."""
    A = np.asarray(a, dtype=np.float64)
    B = np.asarray(b, dtype=np.float64)
    num = (A * B).sum(axis=-1)
    den = np.linalg.norm(A, axis=-1) * np.linalg.norm(B, axis=-1)
    return num / np.maximum(den, 1e-12)


def jaccard_coef(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Jaccard of two id/hash sets (distance.py:129-134)."""
    inter = len(np.intersect1d(set_a, set_b, assume_unique=False))
    union = len(np.union1d(set_a, set_b))
    return inter / union if union else 1.0


def edit_distance(s1: str, s2: str) -> int:
    """Levenshtein distance, O(len1*len2) numpy rows (distance.py:81-90 —
    the reference falls back to difflib when Levenshtein is missing; ours is
    exact Levenshtein)."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = np.arange(len(s2) + 1, dtype=np.int64)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    for i, ch in enumerate(s1):
        cur = np.empty(len(s2) + 1, dtype=np.int64)
        cur[0] = i + 1
        cost = (b != ord(ch)).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=cur[1:])
        # carry the insertion chain (sequential dependency, but cheap)
        for j in range(1, len(cur)):
            if cur[j] > cur[j - 1] + 1:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[-1])


def euclidean_distance_standardized(a: np.ndarray, b: np.ndarray) -> float:
    """Standardized euclidean: per-component variance (ddof=1 over the two
    rows) scales each squared difference (distance.py:74-77)."""
    v1 = np.asarray(a, dtype=np.float64)
    v2 = np.asarray(b, dtype=np.float64)
    var = np.var(np.vstack([v1, v2]), axis=0, ddof=1)
    return float(np.sqrt(((v1 - v2) ** 2 / (var + 1e-9)).sum()))


def pearson_correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation coefficient of two vectors (distance.py:92-94)."""
    v1 = np.asarray(a, dtype=np.float64)
    v2 = np.asarray(b, dtype=np.float64)
    return float(np.corrcoef(np.vstack([v1, v2]))[0][1])


def edit_distance_normalized(s1: str, s2: str) -> float:
    """Levenshtein distance normalized by max length (the reference's
    edit_distance semantics, distance.py:80-89); 0.0 for two empty strings."""
    m = max(len(s1), len(s2))
    return edit_distance(s1, s2) / m if m else 0.0


def is_str_match(s1: str, s2: str, threshold: float = 1.0) -> bool:
    """Exact match at threshold 1.0, else normalized-edit-similarity >=
    threshold (distance.py:106-111)."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [0, 1]")
    if threshold == 1.0:
        return s1 == s2
    return (1.0 - edit_distance_normalized(s1, s2)) >= threshold


def num_of_common_sub_str(s1: str, s2: str) -> int:
    """Longest common substring length (distance.py:114-127 /
    longest_match_size :113-118) — DP rows vectorized over the inner axis."""
    if not s1 or not s2:
        return 0
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    best = 0
    for ch in s1:
        cur = np.zeros(len(b) + 1, dtype=np.int64)
        eq = b == ord(ch)
        cur[1:][eq] = prev[:-1][eq] + 1
        m = cur.max()
        if m > best:
            best = int(m)
        prev = cur
    return best


def longest_match_ratio(s1: str, s2: str) -> float:
    """Longest common substring / min length (distance.py:121-126)."""
    m = min(len(s1), len(s2))
    return num_of_common_sub_str(s1, s2) / m if m else 0.0


def max_min_normalize(x: np.ndarray) -> np.ndarray:
    """(x - min) / (max - min) (distance.py:175-181)."""
    x = np.asarray(x, dtype=np.float64)
    lo, hi = x.min(), x.max()
    return np.zeros_like(x) if hi == lo else (x - lo) / (hi - lo)


def z_score(x: np.ndarray) -> np.ndarray:
    """(x - mean) / std (distance.py:184-195)."""
    x = np.asarray(x, dtype=np.float64)
    sd = x.std()
    return np.zeros_like(x) if sd == 0 else (x - x.mean()) / sd
