"""SemDeDup-style semantic deduplication over an embedding column.

Public method (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): k-means-cluster the
embeddings, call two items semantic duplicates when their cosine similarity
within a cluster exceeds ``eps``, and keep exactly one representative per
duplicate group — the member with the LOWEST cosine similarity to its
cluster centroid (the most "marginal" example carries the most training
signal; min-id breaks ties deterministically).

Ray-Data shape (reference parity target: the reference dedups media by
embedding cosine in `improved_faiss_detector.py`; this is its corpus-level
prune counterpart):
- pair mining rides the existing IVF bucket exchange (`stages/ann.py
  ivf_dup_pairs`) — ONE centroid-bucketed shuffle, exact within-bucket
  matmuls, multi-assignment for boundary recall (a strict superset of the
  paper's single-cluster pairing, so no true duplicate group is split by an
  unlucky cluster boundary);
- duplicate groups = connected components over the mined pairs (driver DSU,
  pair-member-bounded, same crossover discipline as the text tier);
- the keep rule needs centroid similarity only for PAIR MEMBERS — one
  narrow broadcast-filtered scan, never a corpus-wide collect;
- the final verdict is a stateless narrow map with a members-bounded
  broadcast (root map + drop set), streaming over the full corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.stages.ann import _emb_matrix, _norm_rows, fit_centroids


def semdedup_verdicts(
    emb_ds,
    eps: float = 0.4,
    n_clusters: int | None = None,
    n_assign: int = 4,
    seed: int = 42,
    max_bucket_size: int = 4096,
):
    """Per-vector SemDeDup verdicts: Dataset of (vec_id, semdup_id, keep)
    where semdup_id = min vec_id of the vector's semantic-duplicate
    component (its own id when it has no duplicate) and keep marks the one
    retained representative per component (lowest centroid cosine, min-id
    tie-break). Non-members keep trivially.
    """
    from imagededupx_ray.stages.ann import ivf_dup_pairs
    from imagededupx_ray.stages.cluster import dsu_components

    centroids = fit_centroids(emb_ds, n_clusters, seed)
    pairs = ivf_dup_pairs(
        emb_ds,
        threshold=eps,
        n_assign=n_assign,
        seed=seed,
        max_bucket_size=max_bucket_size,
        centroids=centroids,
    )

    # components over mined pairs; members/roots are pair-bounded (dup docs
    # only), the same driver-DSU-with-crossover discipline as the text tier
    root_map = dsu_components(pairs)
    members = np.unique(
        np.concatenate(
            [
                np.fromiter(root_map.keys(), dtype=np.int64, count=len(root_map)),
                np.fromiter(root_map.values(), dtype=np.int64, count=len(root_map)),
            ]
        )
        if root_map
        else np.empty(0, dtype=np.int64)
    )

    # centroid similarity for pair members only: one narrow filtered scan
    cent_ref = ray.put(_norm_rows(centroids.astype(np.float64)))
    members_ref = ray.put(members)

    def member_sims(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mem = ray.get(members_ref)
        pos = np.searchsorted(mem, ids)
        hit = (pos < len(mem)) & (mem[np.minimum(pos, len(mem) - 1)] == ids)
        if not hit.any():
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "csim": pa.array([], type=pa.float64()),
                }
            )
        M = _norm_rows(_emb_matrix(batch))[hit]
        # nearest centroid by cosine == max dot for normalized rows; round so
        # the argmin below is stable across BLAS reduction orderings
        sims = np.round((M @ ray.get(cent_ref).T).max(axis=1), 9)
        return pa.table(
            {
                "vec_id": pa.array(ids[hit], type=pa.int64()),
                "csim": pa.array(sims, type=pa.float64()),
            }
        )

    drop: np.ndarray = np.empty(0, dtype=np.int64)
    if len(members):
        sim_df = (
            emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(member_sims, batch_format="pyarrow")
            .to_pandas()
        )
        mids = sim_df["vec_id"].to_numpy().astype(np.int64)
        csim = sim_df["csim"].to_numpy()
        roots = np.array([root_map.get(int(i), int(i)) for i in mids], dtype=np.int64)
        # keeper per component: lowest centroid sim, then min vec_id — one
        # lexsort over the members-bounded arrays, no per-group Python
        order = np.lexsort((mids, csim, roots))
        r_sorted = roots[order]
        first = np.ones(len(r_sorted), dtype=bool)
        first[1:] = r_sorted[1:] != r_sorted[:-1]
        drop = np.sort(mids[order][~first])

    root_items = np.array(sorted(root_map.items()), dtype=np.int64).reshape(-1, 2)
    bcast = ray.put((root_items[:, 0], root_items[:, 1], drop))

    def verdict(batch: pa.Table) -> pa.Table:
        keys, vals, dropped = ray.get(bcast)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        semdup = ids.copy()
        if len(keys):
            pos = np.searchsorted(keys, ids)
            hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == ids)
            semdup[hit] = vals[pos[hit]]
        keep = np.ones(len(ids), dtype=bool)
        if len(dropped):
            pos = np.searchsorted(dropped, ids)
            keep &= ~(
                (pos < len(dropped))
                & (dropped[np.minimum(pos, len(dropped) - 1)] == ids)
            )
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "semdup_id": pa.array(semdup, type=pa.int64()),
                "keep": pa.array(keep, type=pa.bool_()),
            }
        )

    return emb_ds.select_columns(["vec_id"]).map_batches(
        verdict, batch_format="pyarrow"
    )
