"""Frozen dedup configuration (FIXTURES.md F4).

"Identical shingle/signature config" between the Ray pipeline and the
pure-Python oracle is defined by an instance of :class:`DedupConfig`; its
``config_hash`` is stamped into every checkpoint manifest so resuming across a
config change refuses (SURVEY.md §7.4).

Reference analogues: SimHash fingerprint semantics
(/root/reference/similarities/similarities/literal_similarity.py:88-117),
threshold presets (/root/reference/README.md:206-209), min substring span
length (/root/reference/similarities/similarities/literal_similarity.py:1023).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, asdict, field


@dataclass(frozen=True)
class DedupConfig:
    # shingling: word-level k-grams over lowercased, whitespace-collapsed text
    shingle_k: int = 5
    # minhash: num_perms true 64-bit permutations h_i(x) = splitmix64(x ^ c_i)
    # with c_i drawn from a seeded PRNG (bijective — genuinely min-wise
    # independent, exact in uint64; see functions/hashing.make_permutations)
    num_perms: int = 128
    perm_seed: int = 42
    # signer scheme for the minhash matrix:
    #   "kperm" (default, the north-star config): num_perms independent
    #     permutations — 128 hash evaluations per shingle.
    #   "oph": one-permutation hashing (Li, Owen & Zhang, NIPS 2012) with
    #     optimal densification (Shrivastava, ICML 2017; rotation fallback
    #     per Shrivastava & Li, ICML 2014 for ultra-sparse sketches) — ONE
    #     hash evaluation per shingle binned into num_perms partitions.
    #     Same (n_docs, num_perms) signature shape, same LSH banding and
    #     32-bit verify semantics; per-component collision probability is
    #     still the jaccard, so est_jaccard stays an unbiased estimate.
    #     At 10^12 docs this removes ~99% of signing compute; gated to
    #     recall >= 0.99 on planted truth pairs (tests/test_oph.py).
    signer: str = "kperm"
    # simhash: 64-bit over the same k-gram shingles, weight = term frequency
    simhash_bits: int = 64
    # LSH banding: bands * rows_per_band == num_perms
    lsh_bands: int = 32
    lsh_rows: int = 4
    # skew control for the LSH bucket groupby: buckets larger than
    # max_bucket_size switch from all-pairs to sorted sliding-window emission
    # (window pairs preserve connectivity for union-find clustering)
    max_bucket_size: int = 64
    bucket_window: int = 8
    # salting (SURVEY.md §4.2 item 1): buckets with more than salt_threshold
    # rows are re-keyed to salt_k sub-partitions so no single shuffle
    # partition must hold a mega-bucket (boilerplate pages at web scale);
    # connectivity across sub-buckets is restored by chaining the per-salt
    # minima. None disables the extra counting pass.
    salt_threshold: int | None = 100_000
    salt_k: int = 32
    # verify thresholds (reference presets README.md:206-209 re-targeted to
    # jaccard; exact-ish tier via simhash hamming)
    jaccard_threshold: float = 0.7
    simhash_hamming_max: int = 6
    # suffix-array substring spans (literal_similarity.py:1023 min_same_len=70)
    span_min_len: int = 70

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError("lsh_bands * lsh_rows must equal num_perms")
        if self.signer not in ("kperm", "oph"):
            raise ValueError(f"unknown signer {self.signer!r}")
        if self.signer == "oph" and self.num_perms & (self.num_perms - 1):
            raise ValueError("oph signer requires num_perms to be a power of 2")

    @property
    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = DedupConfig()


def lsh_candidate_probability(jaccard: float, bands: int, rows: int) -> float:
    """P(some band collides) = 1 - (1 - j^r)^b — the MinHash-LSH S-curve
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3)."""
    return 1.0 - (1.0 - jaccard**rows) ** bands


def lsh_plan(
    threshold: float,
    target_recall: float = 0.99,
    num_perms: int = 128,
    max_fp_jaccard: float | None = None,
) -> tuple[DedupConfig, dict]:
    """Choose (bands, rows) for ``num_perms`` so that a pair at
    ``threshold`` jaccard becomes an LSH candidate with probability >=
    ``target_recall``, preferring the LARGEST rows (fewest false-positive
    candidates — candidate mass drives the verify stage's cost) that still
    meets the recall bar. ``max_fp_jaccard`` optionally reports-only: no
    (b, r) can make the S-curve sharp past what num_perms allows, so the
    chosen plan is returned with its measured recall/fp rates in
    the returned stats dict for callers to log. Returns (config, stats).
    Raises when even rows=1 cannot reach the target (never happens for
    target < 1 since b >= 1 and j > 0)."""
    best = None
    for rows in range(num_perms, 0, -1):
        if num_perms % rows:
            continue
        bands = num_perms // rows
        p = lsh_candidate_probability(threshold, bands, rows)
        if p >= target_recall:
            best = (bands, rows, p)
            break
    if best is None:
        raise ValueError(
            f"no (bands, rows) split of {num_perms} perms reaches "
            f"recall {target_recall} at jaccard {threshold}"
        )
    bands, rows, p = best
    cfg = DedupConfig(
        num_perms=num_perms,
        lsh_bands=bands,
        lsh_rows=rows,
        jaccard_threshold=threshold,
    )
    stats = {"candidate_recall_at_threshold": p}
    if max_fp_jaccard is not None:
        stats["candidate_rate_at_fp_jaccard"] = lsh_candidate_probability(
            max_fp_jaccard, bands, rows
        )
    return cfg, stats
