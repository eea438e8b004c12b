"""Distributed spherical k-means (stages/kmeans.py): single-process Lloyd
parity across blockings, planted-topic recovery, assignment correctness,
edge cases, and the end-to-end topic-cluster query."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_ds(ids, X, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in X], type=pa.list_(pa.float64())
                ),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _norm(M):
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _ref_fit(ids, X, k, n_iter):
    """Single-process twin of kmeans_fit_distributed: same init (k smallest
    splitmix64(vec_id)), same spherical Lloyd updates, empty clusters hold."""
    from imagededupx_ray.functions.hashing import splitmix64

    h = splitmix64(np.asarray(ids, dtype=np.int64).view(np.uint64))
    C = _norm(np.asarray(X, dtype=np.float64)[np.argsort(h, kind="stable")[:k]])
    Xn = _norm(np.asarray(X, dtype=np.float64))
    hist = []
    for _ in range(n_iter):
        sims = Xn @ C.T
        a = np.argmax(sims, axis=1)
        hist.append(float((1.0 - sims[np.arange(len(Xn)), a]).sum()) / len(Xn))
        C_new = C.copy()
        for c in range(k):
            m = Xn[a == c]
            if len(m):
                C_new[c] = m.mean(axis=0)
        C = _norm(C_new)
    return C, hist


def _planted(rng, n_per=40, d=16, k=3, spread=0.05):
    centers = _norm(rng.normal(size=(k, d)))
    X = np.vstack(
        [centers[c] + spread * rng.normal(size=(n_per, d)) for c in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(X))
    return X[perm], labels[perm]


def test_kmeans_matches_single_process_reference(ray_session):
    from imagededupx_ray.stages.kmeans import kmeans_fit_distributed

    rng = np.random.default_rng(21)
    X, _ = _planted(rng)
    ids = np.arange(len(X), dtype=np.int64)
    want_C, want_hist = _ref_fit(ids, X, k=3, n_iter=8)
    for blocks in (1, 6):
        C, hist = kmeans_fit_distributed(
            _emb_ds(ids, X, blocks), n_clusters=3, n_iter=8
        )
        assert np.allclose(C, want_C, atol=1e-9), blocks
        assert np.allclose(hist, want_hist, atol=1e-9), blocks


def test_kmeans_recovers_planted_topics(ray_session):
    from imagededupx_ray.stages.kmeans import kmeans_assign, kmeans_fit_distributed

    rng = np.random.default_rng(22)
    X, labels = _planted(rng, n_per=50, k=4, spread=0.03)
    ids = np.arange(len(X), dtype=np.int64)
    ds = _emb_ds(ids, X, blocks=4)
    C, hist = kmeans_fit_distributed(ds, n_clusters=4, n_iter=12)
    assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:])), hist
    out = (
        kmeans_assign(ds, C).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # every planted topic maps to exactly one cluster and vice versa
    import pandas as pd

    df = pd.DataFrame({"label": labels[np.argsort(ids)], "cluster": out["cluster"]})
    grp = df.groupby("label")["cluster"].nunique()
    assert (grp == 1).all(), df.groupby(["label", "cluster"]).size()
    assert df["cluster"].nunique() == 4
    assert (out["sim"] > 0.9).all()


def test_kmeans_assign_matches_manual(ray_session):
    from imagededupx_ray.stages.kmeans import kmeans_assign

    rng = np.random.default_rng(23)
    X = rng.normal(size=(30, 8))
    C = _norm(rng.normal(size=(5, 8)))
    ids = np.arange(30, dtype=np.int64)
    out = (
        kmeans_assign(_emb_ds(ids, X), C)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sims = _norm(X) @ C.T
    want = np.argmax(sims, axis=1)
    assert out["cluster"].tolist() == want.tolist()
    assert np.allclose(
        out["sim"], np.round(sims[np.arange(30), want], 6), atol=1e-9
    )


def test_kmeans_edges(ray_session):
    from imagededupx_ray.stages.kmeans import kmeans_fit_distributed

    rng = np.random.default_rng(24)
    X = _norm(rng.normal(size=(3, 4)))
    ids = np.arange(3, dtype=np.int64)
    # k > n: reduced to n centroids
    C, _ = kmeans_fit_distributed(_emb_ds(ids, X), n_clusters=10, n_iter=3)
    assert C.shape == (3, 4)
    with pytest.raises(ValueError):
        kmeans_fit_distributed(_emb_ds(ids, X), n_clusters=0)
    empty = _emb_ds(np.empty(0, np.int64), np.empty((0, 4)))
    with pytest.raises(ValueError):
        kmeans_fit_distributed(empty, n_clusters=2)


def test_docs_topic_clusters_query(ray_session):
    from imagededupx_ray.queries import docs_topic_clusters

    rep = docs_topic_clusters("/root/testdata/sf0.001", k=6, n_iter=6)
    assert list(rep.columns) == ["cluster_rank", "n_members", "mean_sim"]
    assert rep["n_members"].sum() > 0 and len(rep) <= 6
    assert rep["n_members"].is_monotonic_decreasing or len(rep) == 1
    assert ((rep["mean_sim"] >= -1.001) & (rep["mean_sim"] <= 1.001)).all()
