"""Mergeable distributed sketches: HyperLogLog, Misra-Gries heavy hitters,
and a two-level equi-rank quantile compression.

Why sketches at all: the exact twins of these queries
(`docs_top_ngrams`'s distinct-ngram exchange, `docs_length_quantiles`'s
counting histogram, exact `unique`) all shuffle a table bounded by the KEY
DOMAIN, which at 100 TB of web text is itself enormous (billions of distinct
ngrams / tokens). A sketch bounds the exchange by a CONSTANT: every block
emits a fixed-size summary, one small reduce merges them, and the error is
either provably bounded (MG, equi-rank) or tightly concentrated (HLL).

All three follow the same Ray dataflow — ``map_batches`` partials that emit
one fixed-size summary row per block, then an associative TREE reduce
(fanout-bounded ``map_batches`` merge levels, ``queries._sketch_tree_reduce``)
down to a handful of rows merged on the driver, so driver traffic never
scales with block count (classic "mergeable summaries", Agarwal et al.,
PODS 2012). Nothing here is adapted from the reference repo (it has no
sketching; its analogues are exact dict/Counter passes, e.g.
/root/reference/similarities/similarities/utils/tfidf.py:27-47 IDF dict).

Public algorithms implemented from their papers:
- HyperLogLog (Flajolet et al. 2007) with linear-counting small-range
  correction; dense uint8 registers, vectorized rho via binary-search
  bit-length (no float log2 — exact at word boundaries).
- Misra-Gries (1982) in its mergeable-summary form: per-block exact counts
  truncated to k counters by subtracting the (k+1)-th largest; merging sums
  counters then truncates the same way. The summary undercounts any item by
  at most the cumulative subtracted offset, which we RETURN (``deficit``) so
  callers can certify results: after an exact recount of the candidates,
  ``count_k > deficit`` proves the true top-k is contained in the candidate
  set — turning the sketch into an EXACT top-k with bounded exchange.
- Equi-rank quantile compression: each block sorts its values and collapses
  runs of g = ceil(n_block / buckets) consecutive ranks into (mean, weight)
  centroids. One merge level means the global rank error is at most
  sum_blocks(g_b) / 2 — a deterministic worst-case bound computed and
  returned alongside the estimate (the t-digest is the same idea with
  quantile-dependent bucket widths).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- HyperLogLog

HLL_P = 14  # 16384 registers, standard error 1.04/sqrt(m) = 0.81%
_HLL_M = 1 << HLL_P


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) + 1 per element (0 for x == 0) — exact, no floats."""
    x = x.astype(np.uint64, copy=True)
    n = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        n[big] += s
        x[big] >>= np.uint64(s)
    n[x > 0] += 1
    return n


def hll_partial(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint64 hashes -> uint8 register array of size 2^p (one block's HLL)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = (h << np.uint64(p)).astype(np.uint64)  # low 64-p bits at the top
    # rho = leading zeros of rem within 64 bits, + 1
    rho = (64 - _bit_length_u64(rem) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(regs_list: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_HLL_M, dtype=np.uint8)
    for r in regs_list:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


# --------------------------------------------------------------- Misra-Gries


def mg_truncate(keys: np.ndarray, counts: np.ndarray, k: int):
    """Keep at most k counters by subtracting the (k+1)-th largest count
    from every counter and dropping the non-positive ones. Returns
    (keys, counts, subtracted_offset) — the offset is this step's
    contribution to the summary's maximum undercount."""
    if len(keys) <= k:
        return keys, counts, 0
    # threshold = (k+1)-th largest count
    thresh = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    counts = counts - thresh
    keep = counts > 0
    return keys[keep], counts[keep], int(thresh)


def mg_merge(
    summaries: list[tuple[np.ndarray, np.ndarray, int]], k: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge MG summaries: concat, sum by key (vectorized sort+reduceat),
    truncate to k. Total deficit adds each input's deficit plus this
    truncation's offset (mergeable-summaries bound)."""
    if not summaries:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64), 0
    keys = np.concatenate([s[0] for s in summaries])
    counts = np.concatenate([s[1] for s in summaries])
    deficit = sum(int(s[2]) for s in summaries)
    if len(keys):
        order = np.argsort(keys, kind="stable")
        keys, counts = keys[order], counts[order]
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        keys = keys[starts]
        counts = np.add.reduceat(counts, starts)
    keys, counts, off = mg_truncate(keys, counts, k)
    return keys, counts, deficit + off


# ------------------------------------------------- equi-rank quantile sketch


def rank_compress(values: np.ndarray, buckets: int = 512):
    """Sort and collapse runs of g = ceil(n / buckets) consecutive ranks into
    (mean, weight) centroids. Max rank error introduced: g / 2."""
    n = len(values)
    if n == 0:
        return (
            np.array([], dtype=np.float64),
            np.array([], dtype=np.int64),
            0.0,
        )
    v = np.sort(values.astype(np.float64, copy=False))
    g = max(1, int(np.ceil(n / buckets)))
    edges = np.arange(0, n, g)
    sums = np.add.reduceat(v, edges)
    weights = np.diff(np.r_[edges, n])
    return sums / weights, weights.astype(np.int64), g / 2.0


def rank_recompress(
    means: np.ndarray, weights: np.ndarray, buckets: int = 512
) -> tuple[np.ndarray, np.ndarray, float]:
    """Collapse an already-weighted centroid set back down to <= ``buckets``
    centroids so sketch merges can TREE-reduce instead of concatenating
    forever. Sort by mean, walk prefix weight, and group runs of total
    weight ~ g = ceil(W / buckets) into weighted means. Collapsing a run of
    total weight w can displace a rank query by at most w / 2, so the added
    worst-case rank error is max_run_weight / 2 — computed and returned so
    every merge level keeps the deterministic bound additive."""
    if len(means) == 0:
        return means, weights, 0.0
    order = np.argsort(means, kind="stable")
    means = means[order].astype(np.float64, copy=False)
    weights = weights[order].astype(np.int64, copy=False)
    total = int(weights.sum())
    g = max(1, int(np.ceil(total / buckets)))
    # bucket id from the EXCLUSIVE prefix weight: runs hold ~g weight each
    excl = np.cumsum(weights) - weights
    bucket = excl // g
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    w_out = np.add.reduceat(weights, starts)
    m_out = np.add.reduceat(means * weights, starts) / w_out
    return m_out, w_out.astype(np.int64), float(w_out.max()) / 2.0


def rank_quantiles(
    means_list: list[np.ndarray],
    weights_list: list[np.ndarray],
    errs: list[float],
    qs: list[float],
) -> tuple[np.ndarray, float]:
    """Weighted quantiles over the union of per-block centroids. Returns the
    estimates and the worst-case rank error (sum of per-block g_b / 2)."""
    means = np.concatenate(means_list) if means_list else np.empty(0)
    weights = (
        np.concatenate(weights_list) if weights_list else np.empty(0, np.int64)
    )
    if len(means) == 0:
        return np.full(len(qs), np.nan), 0.0
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights)
    n = cum[-1]
    out = np.empty(len(qs))
    for i, q in enumerate(qs):
        target = q * (n - 1) + 1
        pos = int(np.searchsorted(cum, target, side="left"))
        out[i] = means[min(pos, len(means) - 1)]
    return out, float(sum(errs))
