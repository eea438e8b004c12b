"""Score calibration transforms (SURVEY.md §2.2 M12 — reference
updated_clip_test.py:136-226: sigmoid / power / linear-remap / log10 / mixed
blends of a raw similarity score). Vectorized over numpy arrays; the mixed
blend uses the reference's 0.3/0.2/0.2/0.3 weights."""

from __future__ import annotations

import numpy as np


def sigmoid_calibrate(s: np.ndarray, center: float = 0.975, scale: float = 80.0) -> np.ndarray:
    """Logistic remap centered near the dup threshold (reference 'sigmoid')."""
    return 1.0 / (1.0 + np.exp(-scale * (np.asarray(s, float) - center)))


def power_calibrate(s: np.ndarray, p: float = 3.0) -> np.ndarray:
    """s**p — suppresses mid-range scores (reference 'power', cube)."""
    return np.clip(np.asarray(s, float), 0.0, 1.0) ** p


def linear_calibrate(s: np.ndarray, lo: float = 0.95, hi: float = 1.0) -> np.ndarray:
    """Remap [lo, hi] -> [0, 1], clipped (reference 'linear' on [0.95, 1])."""
    return np.clip((np.asarray(s, float) - lo) / (hi - lo), 0.0, 1.0)


def log_calibrate(s: np.ndarray) -> np.ndarray:
    """log10 remap of (0, 1] scores (reference 'log10')."""
    s = np.clip(np.asarray(s, float), 1e-10, 1.0)
    return 1.0 + np.log10(s) / 10.0


def mixed_calibrate(s: np.ndarray) -> np.ndarray:
    """Reference blend: 0.3*sigmoid + 0.2*power + 0.2*linear + 0.3*log."""
    return (
        0.3 * sigmoid_calibrate(s)
        + 0.2 * power_calibrate(s)
        + 0.2 * linear_calibrate(s)
        + 0.3 * log_calibrate(s)
    )
