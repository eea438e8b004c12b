"""ICWS weighted MinHash: consistent sampling for WEIGHTED jaccard.

Ioffe, "Improved Consistent Sampling, Weighted Minhash and L1 Sketching"
(ICDM 2010): for each of K independent samples, every element i with weight
w_i > 0 draws (r, c, beta) from hash-derived uniforms — r, c ~ Gamma(2,1),
beta ~ U(0,1), all deterministic functions of (element, sample index) so two
docs sharing an element share its draws — then

    t_i   = floor(log(w_i) / r_i + beta_i)
    ln a_i = ln c_i - r_i (t_i + 1 - beta_i)

and the sample is (i*, t_{i*}) for i* = argmin a_i. The collision
probability of two docs' samples equals their weighted jaccard
J_w(A, B) = sum_i min(a_i, b_i) / sum_i max(a_i, b_i) — the tf-weighted
generalization of the unweighted minhash estimate (exactness gates in
tests/test_wminhash.py, including J_w(A, 2A) = 1/2).

The reference's SimHash weights shingles by term frequency
(/root/reference/similarities/similarities/literal_similarity.py:88-117);
this operator brings the same tf-weighting to the jaccard/minhash tier.

Fully vectorized: per perm-chunk, 5 splitmix-derived uniforms per
(element, sample), segment argmin via masked minimum.reduceat — no Python
loop over docs or elements.
"""

from __future__ import annotations

import numpy as np

from imagededupx_ray.functions.hashing import (
    _EMPTY_SENTINEL,
    _MIX_C,
    U64,
    splitmix64,
)


def _uniforms(tok_h: np.ndarray, salts: np.ndarray) -> np.ndarray:
    """(n_elems, n_salts) uniforms in (0, 1]: top 53 bits of
    splitmix64(elem ^ salt), +1 so log() never sees 0."""
    with np.errstate(over="ignore"):
        bits = splitmix64(tok_h[:, None] ^ salts[None, :], copy=False)
    return ((bits >> U64(11)).astype(np.float64) + 1.0) * (2.0**-53)


def icws_matrix(
    tok_h: np.ndarray,
    weights: np.ndarray,
    counts: np.ndarray,
    num_samples: int,
    seed: int,
    perm_chunk: int = 8,
) -> np.ndarray:
    """(n_docs, num_samples) uint64 ICWS sample keys over flat per-doc
    (unique element hash, weight > 0) segments. Each key packs the sampled
    element AND its t level (both must match for a collision, per the
    paper); docs with no elements get the sentinel row."""
    n_docs = len(counts)
    out = np.full((n_docs, num_samples), _EMPTY_SENTINEL, dtype=np.uint64)
    nonempty = np.flatnonzero(counts > 0)
    if not len(nonempty):
        return out
    ne_counts = counts[nonempty].astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(ne_counts)))[:-1]
    N = int(ne_counts.sum())
    if len(tok_h) != N:
        raise ValueError("tok_h length must equal sum(counts)")
    rng = np.random.default_rng(seed ^ 0x1C5)
    salts = rng.integers(0, 1 << 64, size=(5, num_samples), dtype=np.uint64)
    logw = np.log(weights.astype(np.float64))
    pos = np.arange(N, dtype=np.int64)
    for c0 in range(0, num_samples, perm_chunk):
        c1 = min(c0 + perm_chunk, num_samples)
        u1 = _uniforms(tok_h, salts[0, c0:c1])
        u2 = _uniforms(tok_h, salts[1, c0:c1])
        r = -(np.log(u1) + np.log(u2))
        u1 = _uniforms(tok_h, salts[2, c0:c1])
        u2 = _uniforms(tok_h, salts[3, c0:c1])
        ln_c = np.log(-(np.log(u1) + np.log(u2)))
        beta = _uniforms(tok_h, salts[4, c0:c1])
        t = np.floor(logw[:, None] / r + beta)
        ln_a = ln_c - r * (t + 1.0 - beta)
        seg_min = np.minimum.reduceat(ln_a, starts, axis=0)
        masked = np.where(
            ln_a <= np.repeat(seg_min, ne_counts, axis=0), pos[:, None], N
        )
        arg = np.minimum.reduceat(masked, starts, axis=0)  # (n_seg, chunk)
        cols = np.arange(c1 - c0)[None, :]
        elem = tok_h[arg]
        t_sel = t[arg, cols]
        # pack (element, t): both must agree for a sample collision
        t_u64 = t_sel.astype(np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = splitmix64(elem ^ splitmix64(t_u64 * _MIX_C))
        out[nonempty, c0:c1] = key
    return out


def doc_token_tf(tok_h: np.ndarray, offsets: np.ndarray):
    """Per-doc (unique token hash, tf) from a flat token-hash array with doc
    offsets: one lexsort over (doc, token), boundary diff for counts.
    Returns (flat unique tok uint64, flat tf int64, per-doc counts int64)."""
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    if len(tok_h) == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.int64),
            np.zeros(n_docs, dtype=np.int64),
        )
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    o = np.lexsort((tok_h, doc_idx))
    d_s, t_s = doc_idx[o], tok_h[o]
    new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])))
    starts = np.flatnonzero(new)
    uniq_tok = t_s[starts]
    tf = np.diff(np.concatenate((starts, [len(t_s)]))).astype(np.int64)
    counts = np.bincount(d_s[starts], minlength=n_docs).astype(np.int64)
    return uniq_tok, tf, counts
