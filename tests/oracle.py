"""Pure-Python single-process reference pipeline (SURVEY.md §5.2 item 2).

An INDEPENDENT reimplementation of the dedup semantics — plain python ints and
sets, no numpy vector kernels — playing the role the reference implementation's
brute-force all-pairs mining plays
(/root/reference/similarities/similarities/utils/util.py:170-234, threshold
clustering :237-305). The Ray pipeline must reproduce its signatures
bit-for-bit and its >=threshold dup pairs with recall >= 0.99 at identical
config (BASELINE.json north_rule).
"""

from __future__ import annotations

import hashlib
import re
from itertools import combinations

import numpy as np

from imagededupx_ray.config import DedupConfig

_M64 = (1 << 64) - 1
_C = 0x9E3779B97F4A7C15
_WS = re.compile(r"\s+")


def _mix(z: int) -> int:
    z &= _M64
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & _M64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return z


def tokenize(text: str) -> list[str]:
    t = _WS.sub(" ", text.lower()).strip()
    return [w for w in t.split(" ") if w] if t else []


def shingle_hash_set(text: str, k: int) -> list[int]:
    toks = tokenize(text)
    hs = [
        int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        for w in toks
    ]
    out = []
    if len(hs) >= k:
        for i in range(len(hs) - k + 1):
            h = 0
            for t in hs[i : i + k]:
                h = (h * _C + t) & _M64
            out.append(_mix(h))
    elif hs:
        h = 0
        for t in hs:
            h = (h * _C + t) & _M64
        out.append(_mix(h))
    return out


def minhash(text: str, cfg: DedupConfig, _pure: bool = False) -> list[int]:
    """Shingling is pure python (independent of the numpy kernels); the
    per-permutation min uses numpy for speed unless ``_pure`` — the fully
    pure path is exercised on small inputs in test_kernels."""
    rng = np.random.default_rng(cfg.perm_seed)
    salts = rng.integers(0, 1 << 64, size=cfg.num_perms, dtype=np.uint64)
    sh = shingle_hash_set(text, cfg.shingle_k)
    if not sh:
        return [(1 << 64) - 1] * cfg.num_perms
    if _pure:
        return [min(_mix(h ^ int(salts[i])) for h in sh) for i in range(cfg.num_perms)]
    arr = np.array(sh, dtype=np.uint64)
    out = []
    for i in range(cfg.num_perms):
        z = arr ^ salts[i]
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        out.append(int(z.min()))
    return out


def simhash(text: str, cfg: DedupConfig) -> int:
    sh = shingle_hash_set(text, cfg.shingle_k)
    if not sh:
        return 0
    sums = [0] * 64
    for h in sh:
        for bit in range(64):
            sums[63 - bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for i in range(64):  # MSB-first, tie -> 0
        out = (out << 1) | (1 if sums[i] > 0 else 0)
    return out


def jaccard(text_a: str, text_b: str, k: int) -> float:
    sa, sb = set(shingle_hash_set(text_a, k)), set(shingle_hash_set(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def brute_force_pairs(
    docs: dict[int, str], cfg: DedupConfig, threshold: float | None = None
) -> list[tuple[int, int, float]]:
    """All-pairs true shingle jaccard >= threshold (the oracle's candidate-free
    equivalent of paraphrase_mining_embeddings)."""
    thr = cfg.jaccard_threshold if threshold is None else threshold
    shing = {i: set(shingle_hash_set(t, cfg.shingle_k)) for i, t in docs.items()}
    out = []
    for i, j in combinations(sorted(docs), 2):
        si, sj = shing[i], shing[j]
        if not si and not sj:
            jac = 1.0
        elif not si or not sj:
            jac = 0.0
        else:
            jac = len(si & sj) / len(si | sj)
        if jac >= thr:
            out.append((i, j, jac))
    return out


def cluster(pairs: list[tuple[int, int]], all_ids: list[int]) -> dict[int, int]:
    """Union-find; canonical = min id per component (deterministic tie-break,
    unlike the reference's insertion-order clusters, utils/util.py:237-305)."""
    parent: dict[int, int] = {i: i for i in all_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in all_ids}
