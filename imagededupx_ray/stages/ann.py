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
