"""Approximate nearest-neighbor search over an embedding column
(SURVEY.md §2.3 A4 — the reference's FAISS/Annoy/Hnswlib role, rebuilt as
Ray Data stages; IVF algorithm per the public FAISS/IVF literature).

- ``brute_force_topk``: exact cosine top-k — broadcast query matrix, blocked
  float64 matmul per batch, tiny global reduce. The correctness baseline.
- ``IVFIndex``: k-means coarse quantizer (numpy Lloyd iterations, seeded,
  fitted on a driver-side sample) + cluster assignment as a map_batches
  column; search probes the ``nprobe`` nearest centroids only. The scale
  path: assignment is distributed, each search touches ~nprobe/nlist of the
  corpus, and the assigned dataset can be written partitioned by cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _norm_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def kmeans_fit(
    X: np.ndarray, n_clusters: int, seed: int = 42, n_iter: int = 12
) -> np.ndarray:
    """Plain Lloyd k-means on unit vectors (cosine ≡ dot). Deterministic."""
    rng = np.random.default_rng(seed)
    X = _norm_rows(X)
    centroids = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _norm_rows(centroids)
    return centroids


class IVFIndex:
    """IVF over a Ray Dataset of (vec_id, embedding).

    build(): fit centroids on a sample, add a ``cluster`` column distributed.
    search(): probe the nprobe nearest centroids per query; exact cosine
    within probed clusters."""

    def __init__(self, n_clusters: int = 16, nprobe: int = 4, seed: int = 42):
        self.n_clusters = n_clusters
        self.nprobe = nprobe
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.assigned = None  # Dataset with cluster column

    def build(self, emb_ds, sample_size: int = 20000):
        sample = emb_ds.limit(sample_size).to_pandas()
        X = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
        self.centroids = kmeans_fit(X, self.n_clusters, self.seed)
        cent_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            C = ray.get(cent_ref)
            M = _norm_rows(_emb_matrix(batch))
            cl = np.argmax(M @ C.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cl, type=pa.int32()))

        self.assigned = emb_ds.map_batches(assign, batch_format="pyarrow").materialize()
        return self

    def search(self, Q: np.ndarray, q_ids: np.ndarray, k: int = 10) -> pd.DataFrame:
        """Top-k cosine neighbors per query among probed clusters.
        Returns columns (query_id, neighbor_id, cosine)."""
        assert self.assigned is not None, "build() first"
        Qn = _norm_rows(Q.astype(np.float64))
        probes = np.argsort(Qn @ self.centroids.T, axis=1)[:, ::-1][:, : self.nprobe]
        state_ref = ray.put((q_ids.astype(np.int64), Qn, probes.astype(np.int32)))

        def partial(batch: pa.Table) -> pa.Table:
            ids_q, Qm, probe_sets = ray.get(state_ref)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cl = batch["cluster"].to_numpy(zero_copy_only=False).astype(np.int32)
            M = _norm_rows(_emb_matrix(batch))
            S = Qm @ M.T
            oq, on, os_ = [], [], []
            for qi in range(len(ids_q)):
                mask = np.isin(cl, probe_sets[qi]) & (ids != ids_q[qi])
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                row = S[qi]
                top = cand[np.argsort(row[cand])[::-1][:k]]
                oq.append(np.full(len(top), ids_q[qi], dtype=np.int64))
                on.append(ids[top])
                os_.append(row[top])
            if not oq:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "cosine": pa.array([], type=pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(oq), type=pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(on), type=pa.int64()),
                    "cosine": pa.array(np.concatenate(os_), type=pa.float64()),
                }
            )

        parts = self.assigned.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        ).to_pandas()
        return (
            parts.sort_values(["query_id", "cosine"], ascending=[True, False])
            .groupby("query_id")
            .head(k)
            .reset_index(drop=True)
        )


def fit_centroids(
    emb_ds, n_clusters: int | None = None, seed: int = 42
) -> np.ndarray:
    """Seeded driver-side k-means fit over a bounded sample. ``n_clusters``
    defaults to ~sqrt(n) so mean bucket size stays ~sqrt(n) instead of n/16
    at web scale, capped so the fit (sample x centroids per iteration) stays
    tractable; at true web scale pass an explicit n_clusters and a
    pre-trained / hierarchical centroid set instead — the driver fit is the
    oracle-scale path, the bucketed shuffles that consume the centroids are
    the part that scales."""
    if n_clusters is None:
        n_clusters = min(65536, max(16, int(np.sqrt(max(emb_ds.count(), 1)))))
    sample = emb_ds.limit(min(1_000_000, max(20000, 8 * n_clusters))).to_pandas()
    X = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    return kmeans_fit(X, n_clusters, seed)


def ivf_dup_pairs(
    emb_ds,
    threshold: float,
    n_clusters: int | None = None,
    n_assign: int = 4,
    seed: int = 42,
    num_partitions: int | None = None,
    max_bucket_size: int = 4096,
    bucket_window: int = 64,
    centroids: "np.ndarray | None" = None,
):
    """Embedding-cosine near-dup pairs via IVF bucketing — the 10^12-vector
    scale path of the exact blocked matmul: each vector is assigned to its
    ``n_assign`` nearest centroids (multi-assignment recovers boundary
    pairs), vectors co-locate by centroid through ONE coarse-partition
    groupby shuffle, and each bucket mines its pairs with an exact
    within-bucket matmul. Pairs whose members share no probed centroid are
    missed (recall-gated vs the exact miner in tests); every emitted pair is
    exact (precision 1 by construction). Returns distinct (a, b, cosine).

    Scale controls (the same skew discipline as stages/lsh.py):
    - ``n_clusters`` defaults to ~sqrt(n) so mean bucket size stays ~sqrt(n)
      instead of n/16 at web scale.
    - buckets larger than ``max_bucket_size`` switch from the O(g²) matmul
      to banded emission: members sort by vec_id and only offsets 1..window
      are scored (O(g·window·d)) — bounded pair emission and FLOPs even if a
      dense centroid region collects millions of vectors. A mega-bucket's
      recall then degrades gracefully instead of the task OOMing/stalling
      (multi-assignment still recovers many of its pairs in sibling
      buckets)."""
    from imagededupx_ray.stages.lsh import _pow2, decorate_pair_part
    from imagededupx_ray.functions.hashing import splitmix64
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    if centroids is None:
        centroids = fit_centroids(emb_ds, n_clusters, seed)
    cent_ref = ray.put(centroids)

    def explode_assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _norm_rows(_emb_matrix(batch))
        na = min(n_assign, len(C))
        top = np.argsort(M @ C.T, axis=1)[:, ::-1][:, :na].astype(np.int64)
        n, d = M.shape
        flat_vec = np.repeat(M, na, axis=0).reshape(-1)
        cl = top.reshape(-1)
        part = (splitmix64(cl.view(np.uint64)) & np.uint64(p - 1)).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(part, type=pa.int32()),
                "cluster": pa.array(cl.astype(np.int32), type=pa.int32()),
                "vec_id": pa.array(np.repeat(ids, na), type=pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat_vec, type=pa.float64()), d
                ),
            }
        )

    def mine(t: pa.Table) -> pa.Table:
        """All clusters of one coarse partition, arrow-native: vectors come
        straight off the FixedSizeList buffer (no per-row python), small
        buckets do the exact matmul, oversized buckets the banded fallback."""
        ids_all = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl_all = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int32)
        M_all = _emb_matrix(t, "vec")
        order = np.argsort(cl_all, kind="stable")
        cl_s = cl_all[order]
        bounds = np.flatnonzero(np.diff(cl_s)) + 1
        out_a, out_b, out_c = [], [], []
        for seg in np.split(order, bounds):
            g = len(seg)
            if g < 2:
                continue
            ids = ids_all[seg]
            M = M_all[seg]
            if g <= max_bucket_size:
                S = M @ M.T
                ii, jj = np.nonzero(S >= threshold)
                keep = ids[ii] < ids[jj]
                out_a.append(ids[ii[keep]])
                out_b.append(ids[jj[keep]])
                out_c.append(S[ii[keep], jj[keep]])
            else:
                o2 = np.argsort(ids)
                ids = ids[o2]
                M = M[o2]
                for w in range(1, min(bucket_window, g - 1) + 1):
                    s = np.einsum("ij,ij->i", M[:-w], M[w:])
                    hit = s >= threshold
                    if hit.any():
                        out_a.append(ids[:-w][hit])
                        out_b.append(ids[w:][hit])
                        out_c.append(s[hit])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        c = np.concatenate(out_c) if out_c else np.empty(0, np.float64)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "cosine": pa.array(c, type=pa.float64()),
            }
        )

    raw = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(explode_assign, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(mine, batch_format="pyarrow")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    # distinct across multi-assignment duplicates: pair-hash coarse groupby
    def decorate_keep(t: pa.Table) -> pa.Table:
        d = decorate_pair_part(p)(t.select(["a", "b"]))
        return d.append_column("cosine", t["cosine"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"]).drop(columns=["_part"])

    return (
        raw.map_batches(decorate_keep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dedup, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def brute_force_topk(emb_ds, Q: np.ndarray, q_ids: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k (the ANN recall baseline)."""
    Qn = _norm_rows(Q.astype(np.float64))
    ref = ray.put((q_ids.astype(np.int64), Qn))

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, Qm = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _norm_rows(_emb_matrix(batch))
        S = Qm @ M.T
        oq, on, os_ = [], [], []
        for qi in range(len(ids_q)):
            mask = ids != ids_q[qi]
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            row = S[qi]
            top = cand[np.argsort(row[cand])[::-1][:k]]
            oq.append(np.full(len(top), ids_q[qi], dtype=np.int64))
            on.append(ids[top])
            os_.append(row[top])
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(oq) if oq else np.empty(0, np.int64), type=pa.int64()
                ),
                "neighbor_id": pa.array(
                    np.concatenate(on) if on else np.empty(0, np.int64), type=pa.int64()
                ),
                "cosine": pa.array(
                    np.concatenate(os_) if os_ else np.empty(0, np.float64),
                    type=pa.float64(),
                ),
            }
        )

    parts = emb_ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    return (
        parts.sort_values(["query_id", "cosine"], ascending=[True, False])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
