"""Mergeable Bloom filter gates (functions/bloom.py): zero false negatives
by construction, sizing-bounded false-positive rate, OR-merge == single
build (tree-reduce safety), and parity of the bloom decontamination scan
with the exact broadcast-set path at decontamination sizing."""

import numpy as np
import pytest

from imagededupx_ray.functions.bloom import (
    bloom_add,
    bloom_build,
    bloom_contains,
    bloom_empty,
    bloom_merge,
)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(1)
    members = rng.integers(0, 2**63, 50_000, dtype=np.uint64)
    bf = bloom_build(members, m_bits=1 << 20)
    assert bloom_contains(bf, members).all()


def test_bloom_fpr_bounded_by_sizing():
    """m/n = 21 bits/element at k=8 → per-element fpr < 1e-4; measure on
    disjoint non-members."""
    rng = np.random.default_rng(2)
    members = rng.integers(0, 2**62, 50_000, dtype=np.uint64)
    bf = bloom_build(members, m_bits=1 << 20)
    non = rng.integers(2**62, 2**63, 200_000, dtype=np.uint64)
    fpr = bloom_contains(bf, non).mean()
    assert fpr < 1e-3, fpr


def test_bloom_merge_equals_single_build():
    rng = np.random.default_rng(3)
    chunks = [rng.integers(0, 2**63, 5_000, dtype=np.uint64) for _ in range(7)]
    merged = bloom_merge(*[bloom_build(c, m_bits=1 << 18) for c in chunks])
    single = bloom_build(np.concatenate(chunks), m_bits=1 << 18)
    assert np.array_equal(merged, single)
    # associativity: tree order doesn't matter
    left = bloom_merge(
        bloom_merge(*[bloom_build(c, m_bits=1 << 18) for c in chunks[:3]]),
        bloom_merge(*[bloom_build(c, m_bits=1 << 18) for c in chunks[3:]]),
    )
    assert np.array_equal(left, single)


def test_bloom_rejects_bad_sizes():
    with pytest.raises(ValueError):
        bloom_empty(1000)  # not a power of two
    with pytest.raises(ValueError):
        bloom_merge(bloom_empty(1 << 10), bloom_empty(1 << 12))


def test_bloom_empty_sets():
    bf = bloom_empty(1 << 10)
    assert bloom_contains(bf, np.arange(100, dtype=np.uint64)).sum() == 0
    assert len(bloom_contains(bf, np.empty(0, dtype=np.uint64))) == 0
    bloom_add(bf, np.empty(0, dtype=np.uint64))
    assert bf.sum() == 0


def test_bloom_decontaminate_matches_exact(ray_session):
    """The bloom scan flags EXACTLY the docs the exact broadcast-set path
    flags at decontamination sizing (>= 32 bits/element keeps the doc-level
    false-positive probability negligible on this corpus)."""
    from imagededupx_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    exact = (
        Q.docs_decontaminate(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloom = (
        Q.docs_decontaminate_bloom(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bloom.columns.tolist() == ["doc_id", "contaminated"]
    assert (bloom.doc_id == exact.doc_id).all()
    # no false negatives ever; no false positives at this sizing
    assert (bloom.contaminated == exact.contaminated).all()
