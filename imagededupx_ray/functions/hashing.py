"""Vectorized fingerprint kernels: token/shingle hashing, MinHash, SimHash, LSH.

These re-express the reference's fingerprint operators as numpy kernels over
whole Arrow batches (SURVEY.md §2.2 M1/M2/M5/M8):

- ``string_hash`` polynomial token hash
  (/root/reference/similarities/similarities/utils/distance.py:158-172)
  becomes a blake2b-8 token hash + splitmix64-mixed polynomial shingle hash.
- SimHash (/root/reference/similarities/similarities/literal_similarity.py:88-117):
  the reference sums ±weight per bit of per-token 64-bit hashes and takes sign
  bits; ours does the same over 5-gram shingle hashes with weight = term
  frequency, fully vectorized via unpackbits + add.reduceat.
- MinHash (new, the sketch the reference lacks): 128 permutations
  h_i(x) = splitmix64(x XOR c_i) with seeded 64-bit salts c_i — each h_i is a
  bijection on the uint64 domain (genuinely min-wise independent; see
  ``make_permutations`` for why a linear (a*x+b) mod p family was rejected) —
  and the pure-Python oracle in tests reproduces it bit-for-bit.

All functions are deterministic across processes and parallelism levels
(content-derived hashes only; no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MIX_C = U64(0x9E3779B97F4A7C15)  # golden-ratio odd constant for polynomial combine
_EMPTY_SENTINEL = U64(0xFFFFFFFFFFFFFFFF)  # minhash row for docs with no shingles


def splitmix64(x: np.ndarray, copy: bool = True) -> np.ndarray:
    """SplitMix64 finalizer (public domain algorithm), vectorized, wraps mod 2^64.
    ``copy=False`` mutates ``x`` in place (pass freshly-allocated temporaries)."""
    z = x.astype(np.uint64, copy=copy)
    z ^= z >> U64(30)
    z *= U64(0xBF58476D1CE4E5B9)
    z ^= z >> U64(27)
    z *= U64(0x94D049BB133111EB)
    z ^= z >> U64(31)
    return z


MASK63 = (1 << 63) - 1


def hash64_bytes(data: bytes) -> int:
    """Stable 64-bit content hash (blake2b-8, big-endian) — token/shingle domain."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def doc_id_of(url: str) -> int:
    """Content-derived doc id: 63-bit blake2b hash of the url, stored as int64.

    63 bits (not 64) so the id is a non-negative int64 — Ray Data's native
    aggregates (Min/Count) and hash joins handle int64 zero-copy, while uint64
    falls back to pickled python objects. At true 10^12-doc scale a 128-bit id
    would be needed (64-bit birthday collisions ~1e5 at 1e12 rows); the id
    width is isolated here so that swap is one function.
    """
    return hash64_bytes(url.encode("utf-8")) & MASK63


def id_hash_array(strings) -> np.ndarray:
    """int64 63-bit id per string (python loop over the batch; blake2b is fast)."""
    out = np.empty(len(strings), dtype=np.int64)
    for i, s in enumerate(strings):
        out[i] = hash64_bytes(s.encode("utf-8")) & MASK63
    return out


def token_hash_flat(flat_tokens, unique_cache: dict | None = None) -> np.ndarray:
    """Hash a flat list of tokens to uint64 via blake2b-8, hashing each distinct
    token once per batch (dictionary-encode then take)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(flat_tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = flat_tokens if isinstance(flat_tokens, pa.Array) else pa.array(flat_tokens, type=pa.string())
    dict_arr = pc.dictionary_encode(arr)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniques = dict_arr.dictionary.to_pylist()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    table = np.empty(len(uniques), dtype=np.uint64)
    cache = unique_cache if unique_cache is not None else {}
    for i, tok in enumerate(uniques):
        h = cache.get(tok)
        if h is None:
            h = hash64_bytes(tok.encode("utf-8"))
            if unique_cache is not None:
                cache[tok] = h
        table[i] = h
    return table[codes]


def shingle_hashes(
    token_h: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle hashes over a flat token-hash array with doc offsets.

    Returns (flat shingle uint64 hashes, per-doc shingle counts).
    Docs with 0 < m < k tokens get ONE shingle over all their tokens; docs with
    m == 0 get zero shingles.
    """
    n_docs = len(offsets) - 1
    m = np.diff(offsets)
    counts = np.where(m >= k, m - (k - 1), np.where(m > 0, 1, 0)).astype(np.int64)

    with np.errstate(over="ignore"):  # uint64 wrap is the intended semantics
        if len(token_h) >= k:
            powers = np.empty(k, dtype=np.uint64)
            p = U64(1)
            for j in range(k - 1, -1, -1):
                powers[j] = p
                p = p * _MIX_C
            win = np.lib.stride_tricks.sliding_window_view(token_h, k)
            s_global = (win * powers).sum(axis=1, dtype=np.uint64)  # wraps mod 2^64
        else:
            s_global = np.empty(0, dtype=np.uint64)

    total = int(counts.sum())
    out = np.empty(total, dtype=np.uint64)
    cum = np.concatenate(([0], np.cumsum(counts)))
    # full-length docs: gather from the global sliding hash
    full = np.flatnonzero(m >= k)
    if len(full):
        reps = counts[full]
        starts = np.repeat(offsets[:-1][full], reps)
        local = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)))[:-1], reps
        )
        dest = np.repeat(cum[full], reps) + local
        out[dest] = s_global[starts + local]
    # short docs: one polynomial hash over all m tokens
    short = np.flatnonzero((m > 0) & (m < k))
    with np.errstate(over="ignore"):
        for d in short:
            h = U64(0)
            for t in token_h[offsets[d] : offsets[d + 1]]:
                h = h * _MIX_C + t
            out[cum[d]] = h
    return splitmix64(out), counts


def make_permutations(num_perms: int, seed: int) -> np.ndarray:
    """Per-permutation 64-bit XOR salts for the family
    h_i(x) = splitmix64(x XOR c_i).

    Each h_i is a bijection on the 64-bit domain (XOR and splitmix64 are both
    bijective) — a genuine random permutation family, exact in uint64 with no
    modulo. A linear (a*x+b) mod p family over folded 32-bit inputs was tried
    first and found NOT min-wise independent: elements with small x never wrap
    mod p, so one tiny-x shingle wins the min for every permutation and the
    jaccard estimate collapses when it sits in the symmetric difference.
    """
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=num_perms, dtype=np.uint64)


def minhash_matrix(
    shingles: np.ndarray,
    counts: np.ndarray,
    salts: np.ndarray,
    perm_chunk: int = 32,
    shingle_block: int = 1024,
) -> np.ndarray:
    """(n_docs, num_perms) uint64 minhash matrix from flat shingle hashes.

    Cache-blocked: the (shingle_block x perm_chunk) temporaries (~1 MiB) stay
    L2/L3-resident, so the 6-pass splitmix pipeline costs cache traffic, not
    DRAM — an unblocked (len(shingles) x perm_chunk) version was measured
    memory-bandwidth-bound (~2.6 s per 1024-doc batch vs ~0.4 s blocked).
    Per-doc mins accumulate across blocks via np.minimum on the output rows.
    Empty docs get the sentinel row 0xFFFF... (they never enter LSH; exact
    dedup handles them).
    """
    n_docs = len(counts)
    num_perms = len(salts)
    out = np.full((n_docs, num_perms), _EMPTY_SENTINEL, dtype=np.uint64)
    nonempty = np.flatnonzero(counts > 0)
    if len(nonempty) == 0:
        return out
    # squeeze out empty docs: nonempty docs' shingle segments are contiguous,
    # so segment boundaries in the flat array are cumsum of nonempty counts
    ne_counts = counts[nonempty].astype(np.int64)
    bounds = np.concatenate(([0], np.cumsum(ne_counts)))  # len = n_nonempty + 1
    total = int(bounds[-1])
    acc = np.full((len(nonempty), num_perms), _EMPTY_SENTINEL, dtype=np.uint64)
    for s0 in range(0, total, shingle_block):
        s1 = min(s0 + shingle_block, total)
        # nonempty-doc index range [d0, d1) overlapping this shingle block
        d0 = int(np.searchsorted(bounds, s0, side="right")) - 1
        d1 = int(np.searchsorted(bounds, s1, side="left"))
        starts_local = np.clip(bounds[d0:d1] - s0, 0, s1 - s0)
        sh_blk = shingles[s0:s1, None]
        for c0 in range(0, num_perms, perm_chunk):
            c1 = min(c0 + perm_chunk, num_perms)
            vals = splitmix64(sh_blk ^ salts[None, c0:c1], copy=False)
            blk_min = np.minimum.reduceat(vals, starts_local, axis=0)
            np.minimum(acc[d0:d1, c0:c1], blk_min, out=acc[d0:d1, c0:c1])
    out[nonempty] = acc
    return out


def simhash_vector(
    shingles: np.ndarray, counts: np.ndarray, shingle_chunk: int = 2048
) -> np.ndarray:
    """64-bit SimHash per doc: sign of per-bit sum of (2*bit-1) over shingle
    occurrences (duplicate shingles naturally contribute their term frequency,
    matching the reference's weight-by-tf semantics,
    literal_similarity.py:88-117). Tie (sum == 0) -> bit 0. Empty doc -> 0.

    shingle_chunk sizes the (chunk, 64) unpacked-bit int64 temporary (~4 MiB)
    to stay cache-resident — at 262144 it streamed ~130 MiB of DRAM per chunk
    and throttled all workers under parallel contention."""
    n_docs = len(counts)
    ones = np.zeros((n_docs, 64), dtype=np.int64)
    nonempty = np.flatnonzero(counts > 0)
    if len(nonempty):
        # nonempty docs' shingle segments are contiguous; chunk over GROUPS of
        # nonempty docs so the (chunk, 64) bit matrix stays bounded
        ne_counts = counts[nonempty].astype(np.int64)
        ne_cum = np.concatenate(([0], np.cumsum(ne_counts)))
        g0 = 0
        while g0 < len(nonempty):
            g1 = g0 + 1
            while g1 < len(nonempty) and ne_cum[g1 + 1] - ne_cum[g0] <= shingle_chunk:
                g1 += 1
            s0, s1 = int(ne_cum[g0]), int(ne_cum[g1])
            # int16 accumulators: segment sums are bounded by the chunk span
            # (normally <= shingle_chunk = 8192 < 2^15; a single mega-doc can
            # exceed the chunk, so widen when the span does), and the
            # 4x-narrower temporaries cut DRAM traffic
            acc_dt = np.int16 if (s1 - s0) <= 32767 else np.int64
            bits = np.unpackbits(
                shingles[s0:s1].astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
            ).astype(acc_dt)  # (seg, 64) MSB-first
            local_starts = (ne_cum[g0:g1] - s0).astype(np.int64)
            ones[nonempty[g0:g1]] = np.add.reduceat(bits, local_starts, axis=0)
            g0 = g1
    return _pack_simhash(ones, counts)


def _pack_simhash(ones: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(n_docs, 64) MSB-first per-bit counts -> packed uint64 simhash values.
    Tie (2*ones == m) -> bit 0; empty docs -> 0."""
    m = counts.astype(np.int64)[:, None]
    sign_bits = (2 * ones > m).astype(np.uint8)  # strictly-more-ones -> 1
    packed = np.packbits(sign_bits, axis=1)  # MSB-first
    out = packed.reshape(-1, 8).copy().view(">u8").reshape(-1).astype(np.uint64)
    out[counts == 0] = 0
    return out


def minhash_simhash(
    shingles: np.ndarray, counts: np.ndarray, salts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Fused (minhash matrix, simhash vector) over one flat shingle pass.

    Uses the native C kernel (functions/native.py, compiled once per node)
    when a C compiler is present — measured ~6.7x faster than the two numpy
    kernels on the bench corpus — and falls back to ``minhash_matrix`` +
    ``simhash_vector`` otherwise. Both paths are bit-identical
    (tests/test_functions.py::test_native_signature_kernel_parity)."""
    from imagededupx_ray.functions import native

    n_docs = len(counts)
    num_perms = len(salts)
    nonempty = np.flatnonzero(counts > 0).astype(np.int64)
    if len(nonempty) and native.available():
        mh = np.full((n_docs, num_perms), _EMPTY_SENTINEL, dtype=np.uint64)
        ones = np.zeros((n_docs, 64), dtype=np.int64)
        ne_counts = counts[nonempty].astype(np.int64)
        bounds = np.concatenate(([0], np.cumsum(ne_counts)))
        if native.signature_kernel(shingles, bounds, nonempty, salts, mh, ones):
            return mh, _pack_simhash(ones, counts)
    return minhash_matrix(shingles, counts, salts), simhash_vector(shingles, counts)


def oph_salt(seed: int) -> int:
    """The single 64-bit OPH salt for a given perm seed (distinct stream from
    make_permutations so kperm and oph signatures are uncorrelated)."""
    rng = np.random.default_rng(seed ^ 0x0B1)
    return int(rng.integers(0, 1 << 64, dtype=np.uint64))


def _oph_densify(orig: np.ndarray, counts: np.ndarray, seed: int, probe_rounds: int = 16) -> np.ndarray:
    """Fill empty bins of an OPH binned-min matrix (sentinel entries).

    Phase 1 — optimal densification (Shrivastava, ICML 2017): empty bin i
    copies from bin probe_t(i), a universal hash of (bin, attempt) SHARED
    across docs (the paper's h_i(attempt) depends only on the bin and the
    attempt number), for ``probe_rounds`` vectorized rounds over the rows
    that still need filling. Phase 2 — rotation densification (Shrivastava
    & Li, ICML 2014) for rows still sparse after phase 1 (ultra-short docs):
    each remaining empty bin copies the value of the nearest non-empty bin
    to its circular LEFT, remixed with the distance — exact and loop-free
    via a row-wise running maximum. Both fills are deterministic functions
    of the doc's own non-empty sketch, so identical shingle sets yield
    identical densified signatures. Empty docs (counts == 0) keep their
    all-sentinel row (they never enter LSH)."""
    n_docs, K = orig.shape
    logk = int(K).bit_length() - 1
    salt = U64(oph_salt(seed))
    filled = orig.copy()
    nonempty = np.flatnonzero(counts > 0)
    if not len(nonempty):
        return filled
    empty_mask = orig == _EMPTY_SENTINEL
    empty_mask[counts == 0] = False
    er, eb = np.nonzero(empty_mask)  # flat (row, bin) cells needing a fill
    if not len(er):
        return filled
    # phase 1 over FLAT cells: each probe round touches only the cells still
    # unfilled (the set shrinks geometrically — a cell resolves with
    # probability = its row's non-empty fraction), not the whole matrix
    i_arr = np.arange(K, dtype=np.uint64)
    fill_vals = np.full(len(er), _EMPTY_SENTINEL, dtype=np.uint64)
    remaining = np.arange(len(er), dtype=np.int64)
    with np.errstate(over="ignore"):
        for t in range(probe_rounds):
            probe = (
                splitmix64(i_arr * _MIX_C ^ U64(t + 1) * _MIX_C ^ salt)
                >> U64(64 - logk)
            ).astype(np.int64)
            src = orig[er[remaining], probe[eb[remaining]]]
            ok = src != _EMPTY_SENTINEL
            fill_vals[remaining[ok]] = src[ok]
            remaining = remaining[~ok]
            if not len(remaining):
                break
    done = fill_vals != _EMPTY_SENTINEL
    filled[er[done], eb[done]] = fill_vals[done]
    rows2 = np.unique(er[remaining]) if len(remaining) else np.empty(0, dtype=np.int64)
    if len(rows2):
        o2 = orig[rows2]
        has = o2 != _EMPTY_SENTINEL
        pos = np.arange(K, dtype=np.int64)
        idx = np.where(has, pos[None, :], -1)
        left = np.maximum.accumulate(idx, axis=1)
        wrap = left[:, -1]  # rightmost non-empty bin (>= 0: rows are nonempty docs)
        src_idx = np.where(left < 0, wrap[:, None], left)
        dist = (pos[None, :] - src_idx) % K
        vals = np.take_along_axis(o2, src_idx, axis=1)
        with np.errstate(over="ignore"):
            fill = splitmix64(vals ^ dist.astype(np.uint64) * _MIX_C)
        row_map = np.full(orig.shape[0], -1, dtype=np.int64)
        row_map[rows2] = np.arange(len(rows2), dtype=np.int64)
        rr, bb = er[remaining], eb[remaining]
        filled[rr, bb] = fill[row_map[rr], bb]
    return filled


def oph_minhash_matrix(
    shingles: np.ndarray, counts: np.ndarray, num_perms: int, seed: int
) -> np.ndarray:
    """(n_docs, num_perms) uint64 one-permutation-hashing minhash matrix
    (Li, Owen & Zhang, NIPS 2012): ONE hash v = splitmix64(x ^ salt) per
    shingle, binned by its top log2(num_perms) bits, per-bin running min,
    then densification (see ``_oph_densify``). Same signature shape, LSH
    banding, and 32-bit-equality verify semantics as ``minhash_matrix`` at
    ~1/num_perms of the hashing compute — the scale path for 10^12-doc
    signing. Per-bin collision probability between two docs is their
    jaccard, so component agreement remains an unbiased estimate."""
    K = num_perms
    if K & (K - 1):
        raise ValueError("oph requires num_perms to be a power of 2")
    logk = int(K).bit_length() - 1
    n_docs = len(counts)
    out = np.full((n_docs, K), _EMPTY_SENTINEL, dtype=np.uint64)
    nonempty = np.flatnonzero(counts > 0)
    if not len(nonempty):
        return out
    v = splitmix64(shingles ^ U64(oph_salt(seed)))
    bins = (v >> U64(64 - logk)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    acc = np.full(n_docs * K, _EMPTY_SENTINEL, dtype=np.uint64)
    np.minimum.at(acc, doc_idx * K + bins, v)
    return _oph_densify(acc.reshape(n_docs, K), counts, seed)


def oph_minhash_simhash(
    shingles: np.ndarray, counts: np.ndarray, num_perms: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Fused (OPH minhash matrix, simhash vector): native C binned-min +
    simhash-bit-count kernel when available (functions/native.py), numpy
    otherwise — bit-identical either way (tests/test_oph.py). The simhash
    half counts bits of the RAW shingle hashes, so it is bit-identical to
    the kperm signer's simhash regardless of signer choice."""
    from imagededupx_ray.functions import native

    K = num_perms
    logk = int(K).bit_length() - 1
    n_docs = len(counts)
    nonempty = np.flatnonzero(counts > 0).astype(np.int64)
    if len(nonempty) and native.available():
        mh = np.full((n_docs, K), _EMPTY_SENTINEL, dtype=np.uint64)
        ones = np.zeros((n_docs, 64), dtype=np.int64)
        ne_counts = counts[nonempty].astype(np.int64)
        bounds = np.concatenate(([0], np.cumsum(ne_counts)))
        if native.oph_kernel(shingles, bounds, nonempty, oph_salt(seed), logk, mh, ones):
            return _oph_densify(mh, counts, seed), _pack_simhash(ones, counts)
    return (
        oph_minhash_matrix(shingles, counts, num_perms, seed),
        simhash_vector(shingles, counts),
    )


def band_buckets(mh: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, bands) int64 63-bit bucket hashes: polynomial combine of each
    band's ``rows`` minhash values, mixed with the band index (SURVEY.md §4.2
    item 1). int64 so the LSH groupby key is native for Ray aggregates."""
    n = mh.shape[0]
    banded = mh.reshape(n, bands, rows)
    acc = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            acc = acc * _MIX_C + banded[:, :, r]
    band_salt = splitmix64(np.arange(bands, dtype=np.uint64) + U64(0x5851F42D4C957F2D))
    return (splitmix64(acc ^ band_salt[None, :]) & U64(MASK63)).astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (hamming distance helper;
    reference analogue utils/distance.py:31-53)."""
    v = x.copy()
    v = v - ((v >> U64(1)) & U64(0x5555555555555555))
    v = (v & U64(0x3333333333333333)) + ((v >> U64(2)) & U64(0x3333333333333333))
    v = (v + (v >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    return (v * U64(0x0101010101010101)) >> U64(56)


def sha256_array(strings) -> list[bytes]:
    """Per-string sha256 digest bytes (exact-dedup key; reference analogue
    MD5 file hashing, improved_faiss_detector.py:41-50)."""
    return [hashlib.sha256(s.encode("utf-8")).digest() for s in strings]
