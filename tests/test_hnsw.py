"""HNSW graph-ANN tier: kernel exactness on small inputs, sharded recall vs
brute force, determinism across runs (SURVEY.md §2.3 A4 — the reference's
Hnswlib role)."""

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _unit(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def test_hnsw_graph_exact_small():
    """With ef >= n, layer-0 search is exhaustive over the connected graph —
    top-k must equal brute force on a small set."""
    from imagededupx_ray.stages.hnsw import HNSWGraph

    rng = np.random.default_rng(3)
    n, d = 200, 24
    V = _unit(rng.normal(size=(n, d)))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    g = HNSWGraph(d, M=8, ef_construction=64)
    g.add_batch(ids, V)
    for qi in [0, 7, 42]:
        q = V[qi]
        nid, sim = g.search(q, k=5, ef=n)
        exact = np.argsort(V @ q)[::-1][:5]
        assert set(nid.tolist()) == set(ids[exact].tolist())
        # scores are true cosines
        want = np.sort((V @ q)[exact])[::-1]
        assert np.allclose(np.sort(sim)[::-1], want, atol=1e-12)


def test_hnsw_graph_recall_default_ef():
    """Realistic ef: recall@10 >= 0.9 on clustered vectors (single shard)."""
    from imagededupx_ray.stages.hnsw import HNSWGraph

    rng = np.random.default_rng(11)
    n, d, n_clusters = 3000, 32, 30
    centers = _unit(rng.normal(size=(n_clusters, d)))
    V = _unit(
        centers[rng.integers(0, n_clusters, size=n)]
        + 0.3 * rng.normal(size=(n, d))
    )
    ids = np.arange(n, dtype=np.int64)
    g = HNSWGraph(d, M=16, ef_construction=100)
    g.add_batch(ids, V)
    hits = total = 0
    for qi in range(0, 50):
        q = V[qi]
        nid, _ = g.search(q, k=10, ef=64)
        exact = set(np.argsort(V @ q)[::-1][:10].tolist())
        hits += len(exact & set(nid.tolist()))
        total += 10
    assert hits / total >= 0.9, f"HNSW recall {hits}/{total}"


def test_hnsw_topk_sharded_recall(ray_session):
    """Sharded hnsw_topk vs brute_force_topk on the embeddings table."""
    import ray.data as rd

    from imagededupx_ray.stages.ann import brute_force_topk
    from imagededupx_ray.stages.hnsw import hnsw_topk

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(expr="vec_id < 20").to_pandas()
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    q_ids = q["vec_id"].to_numpy()

    exact = brute_force_topk(emb, Q, q_ids, k=10)
    approx = hnsw_topk(emb, Q, q_ids, k=10, num_shards=4, ef_search=96)

    hits = total = 0
    for qid in q_ids:
        want = set(exact[exact.query_id == qid].neighbor_id)
        got = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.85, f"HNSW recall {hits}/{total}"
    # cosines are exact where ids overlap
    m = exact.merge(approx, on=["query_id", "neighbor_id"], suffixes=("_e", "_a"))
    assert np.allclose(m.cosine_e, m.cosine_a, atol=1e-9)


def test_hnsw_deterministic(ray_session):
    """Same input → identical output at any shard count ordering (levels come
    from vec_id hashes; inserts sort by vec_id)."""
    import ray.data as rd

    from imagededupx_ray.stages.hnsw import hnsw_topk

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(expr="vec_id < 5").to_pandas()
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    q_ids = q["vec_id"].to_numpy()
    a = hnsw_topk(emb, Q, q_ids, k=10, num_shards=4)
    b = hnsw_topk(emb, Q, q_ids, k=10, num_shards=4)
    assert a.equals(b)


def test_hnsw_empty_and_tiny(ray_session):
    """0-row and 1-row shards must not crash."""
    import ray.data as rd

    from imagededupx_ray.stages.hnsw import HNSWGraph, hnsw_topk

    g = HNSWGraph(4)
    nid, sim = g.search(np.ones(4) / 2.0, k=3)
    assert len(nid) == 0

    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array([1.0, 0.0, 0.0, 1.0], type=pa.float64()), 2
            ),
        }
    )
    out = hnsw_topk(
        rd.from_arrow(tbl), np.array([[1.0, 0.0]]), np.array([9]), k=2, num_shards=2
    )
    assert set(out.neighbor_id) <= {1, 2}
    assert len(out) == 2
