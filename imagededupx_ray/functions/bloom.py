"""Mergeable Bloom filter over uint64 hash values (numpy bitmap).

The scale twin of the exact broadcast-set membership the decontamination
pass uses (queries.docs_decontaminate): when the held-out benchmark's
distinct shingle set outgrows a comfortable broadcast (10^9+ shingles =
8+ GB of sorted u64), a fixed-size Bloom bitmap keeps the
build-partial → OR-merge → broadcast → scan shape with a configurable
false-positive rate and ZERO false negatives (Bloom 1970; standard
double-hashing construction, Kirsch & Mitzenmacher 2006).

Partial filters built per batch are merged with bitwise OR (associative,
commutative — rides the same fanout-bounded tree reduce the sketches use),
so the corpus-side pass never ships raw shingles to the driver.

Sizing: per-SHINGLE fpr ≈ (1 - exp(-k·n/m))^k. Doc-level flags amplify the
per-shingle fpr by the doc's shingle count, so decontamination wants
m/n ≥ 32 bits per element (fpr < 1e-6 at k=8) — cheap: 10^9 benchmark
shingles fit a 4 GB bitmap where the exact sorted set is 8 GB and growing
with n, and m is FIXED regardless of benchmark size.
"""

from __future__ import annotations

import numpy as np

from imagededupx_ray.functions.hashing import splitmix64

_WORD_BITS = 64


def bloom_empty(m_bits: int) -> np.ndarray:
    """Zeroed bitmap with m_bits capacity (rounded up to whole words)."""
    if m_bits < _WORD_BITS or m_bits & (m_bits - 1):
        raise ValueError("bloom: m_bits must be a power of two >= 64")
    return np.zeros(m_bits // _WORD_BITS, dtype=np.uint64)


def _positions(values: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, len(values)) bit positions via double hashing: pos_i =
    (h1 + i*h2) mod m — two independent splitmix64 streams derive h1/h2."""
    v = np.asarray(values, dtype=np.uint64)
    h1 = splitmix64(v)
    h2 = splitmix64(v ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)  # odd
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) & np.uint64(m_bits - 1)


def bloom_add(bloom: np.ndarray, values: np.ndarray, n_hashes: int = 8) -> np.ndarray:
    """Set the bits for ``values`` (uint64 hashes) in place; returns bloom."""
    if len(values) == 0:
        return bloom
    m_bits = len(bloom) * _WORD_BITS
    pos = _positions(values, m_bits, n_hashes).reshape(-1)
    words, bits = pos >> np.uint64(6), pos & np.uint64(63)
    np.bitwise_or.at(bloom, words, np.uint64(1) << bits)
    return bloom


def bloom_build(values: np.ndarray, m_bits: int, n_hashes: int = 8) -> np.ndarray:
    return bloom_add(bloom_empty(m_bits), values, n_hashes)


def bloom_merge(*blooms: np.ndarray) -> np.ndarray:
    """Bitwise-OR merge (associative/commutative — tree-reduce safe)."""
    out = blooms[0].copy()
    for b in blooms[1:]:
        if len(b) != len(out):
            raise ValueError("bloom: mismatched filter sizes")
        np.bitwise_or(out, b, out=out)
    return out


def bloom_contains(
    bloom: np.ndarray, values: np.ndarray, n_hashes: int = 8
) -> np.ndarray:
    """Vectorized membership: True where ALL k bits are set (never a false
    negative; false-positive rate set by the m/n sizing)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(bloom) * _WORD_BITS
    pos = _positions(values, m_bits, n_hashes)
    words, bits = pos >> np.uint64(6), pos & np.uint64(63)
    hit = (bloom[words] >> bits) & np.uint64(1)
    return hit.all(axis=0)
