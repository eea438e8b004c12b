"""Product quantization (stages/pq.py): codebook determinism, code
validity, self-hit + recall vs exact brute force, IVFADC recall, and
blocking invariance — the from-scratch stand-in for the reference's
autofaiss IVF*,PQ* factory (faiss_bert_similarity.py:98-130)."""

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


def _unit(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _clustered(n=2000, d=64, n_clusters=25, seed=5, spread=0.25):
    rng = np.random.default_rng(seed)
    centers = _unit(rng.normal(size=(n_clusters, d)))
    X = _unit(
        centers[rng.integers(0, n_clusters, size=n)]
        + spread * rng.normal(size=(n, d))
    )
    return np.arange(100, 100 + n, dtype=np.int64), X


def test_pq_fit_shape_and_determinism(ray_session):
    from imagededupx_ray.stages.pq import pq_fit

    ids, X = _clustered(n=600)
    ds = _emb_ds(ids, X, blocks=3)
    cb1 = pq_fit(ds, m=8, sample=600)
    cb2 = pq_fit(ds, m=8, sample=600)
    assert cb1.shape == (8, 256, 8)
    assert np.array_equal(cb1, cb2)


def test_pq_fit_rejects_bad_dims(ray_session):
    from imagededupx_ray.stages.pq import pq_fit

    ids, X = _clustered(n=100, d=60)  # 60 not divisible by 8
    with pytest.raises(ValueError):
        pq_fit(_emb_ds(ids, X), m=8, sample=100)
    ids, X = _clustered(n=100, d=64)
    with pytest.raises(ValueError):
        pq_fit(_emb_ds(ids, X), m=8, k=512, sample=100)


def test_pq_encode_codes_and_blocking_invariance(ray_session):
    from imagededupx_ray.stages.pq import pq_encode, pq_fit

    ids, X = _clustered(n=500)
    ds1 = _emb_ds(ids, X, blocks=1)
    ds4 = _emb_ds(ids, X, blocks=4)
    cb = pq_fit(ds1, m=8, sample=500)
    c1 = pq_encode(ds1, cb).to_pandas().sort_values("vec_id").reset_index(drop=True)
    c4 = pq_encode(ds4, cb).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(c1) == 500
    assert all(len(c) == 8 for c in c1["code"])
    assert c1.equals(c4)


def test_pq_search_self_hit_and_recall(ray_session):
    """Corpus-drawn queries on deliberately hard data (neighbor cosines
    barely above the noise floor): PQ's top-1 is the query itself for
    nearly all queries, raw ADC recall@10 >= 0.55 at 16x compression
    (m=16 over d=64), and the ADC-shortlist + exact-rerank path
    (the faiss refine discipline) recovers recall >= 0.9."""
    from imagededupx_ray.stages.ann import brute_force_topk
    from imagededupx_ray.stages.pq import (
        pq_encode,
        pq_fit,
        pq_search,
        pq_search_rerank,
    )

    ids, X = _clustered(n=2000)
    ds = _emb_ds(ids, X, blocks=4)
    cb = pq_fit(ds, m=16, sample=2000)
    codes = pq_encode(ds, cb).materialize()

    qn = 40
    Q, q_ids = X[:qn], ids[:qn]
    got = pq_search(codes, cb, Q, q_ids, k=11)  # +1: exact baseline drops self
    exact = brute_force_topk(ds, Q, q_ids, k=10)

    self_hits = sum(
        int(g.iloc[0]["vec_id"] == qid)
        for qid, g in got.groupby("query_id", sort=False)
    )
    assert self_hits >= int(0.9 * qn), f"self-hit {self_hits}/{qn}"

    def recall(frame, id_col="vec_id"):
        hits = total = 0
        for qid in q_ids:
            g = set(
                frame[(frame.query_id == qid) & (frame[id_col] != qid)][id_col]
            )
            e = set(exact[exact.query_id == qid]["neighbor_id"])
            hits += len(g & e)
            total += len(e)
        return hits / total

    assert recall(got) >= 0.55, f"raw ADC recall {recall(got)}"

    rer = pq_search_rerank(codes, ds, cb, Q, q_ids, k=11, factor=6)
    assert recall(rer) >= 0.9, f"reranked recall {recall(rer)}"
    # reranked scores are TRUE cosines: top-1 self-hit is exact 1.0
    top1 = rer[rer["rank"] == 1]
    self_rows = top1[top1.query_id == top1.vec_id]
    assert (np.abs(self_rows["score"].to_numpy() - 1.0) < 1e-6).all()

    # raw ADC scores are implied cosines in [-1, 1], descending per query
    for _, g in got.groupby("query_id", sort=False):
        s = g.sort_values("rank")["score"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()
        assert (np.abs(s) <= 1.0 + 1e-9).all()


def test_pq_search_determinism(ray_session):
    from imagededupx_ray.stages.pq import pq_encode, pq_fit, pq_search

    ids, X = _clustered(n=800, seed=9)
    ds = _emb_ds(ids, X, blocks=3)
    cb = pq_fit(ds, m=8, sample=800)
    codes = pq_encode(ds, cb).materialize()
    a = pq_search(codes, cb, X[:10], ids[:10], k=5)
    b = pq_search(codes, cb, X[:10], ids[:10], k=5)
    assert a.equals(b)


def test_ivfpq_recall_vs_exact(ray_session):
    """IVFADC (prune + compress): recall@10 vs exact >= 0.6 with
    nprobe=4/16 on clustered vectors; every returned row's cluster was
    probed (implied by recall plus the self-hit rate)."""
    from imagededupx_ray.stages.ann import brute_force_topk
    from imagededupx_ray.stages.pq import ivfpq_search

    ids, X = _clustered(n=2000, seed=17)
    ds = _emb_ds(ids, X, blocks=4)
    qn = 30
    got = ivfpq_search(ds, X[:qn], ids[:qn], k=11, m=16, n_clusters=16, nprobe=4)
    exact = brute_force_topk(ds, X[:qn], ids[:qn], k=10)
    hits = total = 0
    for qid in ids[:qn]:
        g = set(got[(got.query_id == qid) & (got.vec_id != qid)]["vec_id"])
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        hits += len(g & e)
        total += len(e)
    assert hits / total >= 0.6, f"IVFPQ recall {hits}/{total}"
