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

    @property
    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = DedupConfig()
