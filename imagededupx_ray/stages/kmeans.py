"""Distributed k-means over an embedding Dataset — corpus topic clustering
for training-mix analysis/balancing (the corpus-level twin of the IVF
coarse quantizer, stages/ann.kmeans_fit, which fits on a driver sample;
reference analogue: community clustering over embeddings,
/root/reference/similarities/similarities/utils/util.py:237-305).

Spherical Lloyd's on unit vectors (cosine ≡ dot), Ray-Data-first:

- init: the k sample-hash-smallest vectors (splitmix64(vec_id)) — a seeded,
  blocking-independent reservoir: each block group emits its k smallest
  (hash, vector) pairs, a fanout-bounded tree merge keeps the global k.
- per iteration: ONE streaming scan; each block group emits the FIXED-SIZE
  partial (k×d centroid sums, k counts, inertia) against the broadcast
  centroids; partials tree-sum; the driver update is O(k·d). No iteration
  ever shuffles or materializes the corpus — the only global state is
  k×d floats, corpus-independent (the LSA Gram discipline).
- empty clusters keep their previous centroid (deterministic).
- assignment: one final scan emitting (vec_id, cluster, sim).

Determinism: the init is order-independent (global k smallest hashes; ties
impossible while vec_ids are unique), partial sums are float64 adds of
bounded unit-vector entries grouped identically per blocking, and every
iteration count is fixed — so the fitted centroids are deterministic per
blocking, and bit-identical across cluster SIZES for the same blocking
(the tree shape depends only on block-group count). Cross-blocking drift
is float-summation-order only and the planted-topic gates stay far from
decision boundaries (tests/test_kmeans.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.functions.hashing import splitmix64
from imagededupx_ray.stages.ann import _emb_matrix, _norm_rows


@ray.remote
def _init_partial(k: int, col: str, *tables: pa.Table):
    import numpy as _np

    hs, vs = [], []
    for t in tables:
        if t.num_rows == 0:
            continue
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        X = _emb_matrix(t, col)
        h = splitmix64(ids.view(_np.uint64))
        hs.append(h)
        vs.append(X)
    if not hs:
        return _np.empty(0, _np.uint64), _np.empty((0, 0))
    h = _np.concatenate(hs)
    X = _np.vstack(vs)
    order = _np.argsort(h, kind="stable")[:k]
    return h[order], X[order]


@ray.remote
def _init_merge(k: int, *parts):
    import numpy as _np

    hs = [p[0] for p in parts if len(p[0])]
    if not hs:
        return _np.empty(0, _np.uint64), _np.empty((0, 0))
    h = _np.concatenate(hs)
    X = _np.vstack([p[1] for p in parts if len(p[0])])
    order = _np.argsort(h, kind="stable")[:k]
    return h[order], X[order]


@ray.remote
def _iter_partial(cent_ref, col: str, *tables: pa.Table):
    import numpy as _np

    C = ray.get(cent_ref) if not isinstance(cent_ref, _np.ndarray) else cent_ref
    k, d = C.shape
    sums = _np.zeros((k, d), dtype=_np.float64)
    counts = _np.zeros(k, dtype=_np.int64)
    inertia = 0.0
    for t in tables:
        if t.num_rows == 0:
            continue
        X = _norm_rows(_emb_matrix(t, col))
        sims = X @ C.T
        assign = _np.argmax(sims, axis=1)
        inertia += float((1.0 - sims[_np.arange(len(X)), assign]).sum())
        # segment-sum via sort + reduceat (np.add.at scatters element-wise
        # and is ~10x slower on wide rows)
        order = _np.argsort(assign, kind="stable")
        a_s = assign[order]
        starts = _np.flatnonzero(_np.r_[True, a_s[1:] != a_s[:-1]])
        seg_sums = _np.add.reduceat(X[order], starts, axis=0)
        sums[a_s[starts]] += seg_sums
        counts += _np.bincount(assign, minlength=k)
    return sums, counts, inertia


@ray.remote
def _sum_partials(*parts):
    s = parts[0][0].copy()
    c = parts[0][1].copy()
    i = parts[0][2]
    for ps, pc, pi in parts[1:]:
        s += ps
        c += pc
        i += pi
    return s, c, i


def _tree(refs, remote_fn, lead_args: tuple = (), fanout: int = 8):
    while len(refs) > 1:
        refs = [
            remote_fn.remote(*lead_args, *refs[i : i + fanout])
            for i in range(0, len(refs), fanout)
        ]
    return refs[0]


def kmeans_fit_distributed(
    emb_ds,
    n_clusters: int,
    vec_col: str = "embedding",
    n_iter: int = 10,
    id_col: str = "vec_id",
):
    """Fit spherical k-means over (vec_id, embedding) rows. Returns
    (centroids (k, d) unit rows, inertia history list — mean 1-cos per
    iteration). ``n_iter`` is fixed (no data-dependent early stop) so runs
    are reproducible."""
    from imagededupx_ray.util import block_group_size

    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    sel = emb_ds.select_columns([id_col, vec_col])
    if id_col != "vec_id":
        sel = sel.map_batches(
            lambda t: t.rename_columns(["vec_id", vec_col]), batch_format="pyarrow"
        )
    blocks = sel.materialize().to_arrow_refs()
    group = block_group_size(len(blocks))
    groups = [blocks[i : i + group] for i in range(0, len(blocks), group)]

    init_parts = [_init_partial.remote(n_clusters, vec_col, *g) for g in groups]
    _, C = ray.get(_tree(init_parts, _init_merge, lead_args=(n_clusters,)))
    if len(C) == 0:
        raise ValueError("empty embedding dataset")
    k = min(n_clusters, len(C))
    C = _norm_rows(np.asarray(C[:k], dtype=np.float64))

    n_total = 0
    history = []
    for it in range(n_iter):
        cent_ref = ray.put(C)
        parts = [_iter_partial.remote(cent_ref, vec_col, *g) for g in groups]
        sums, counts, inertia = ray.get(_tree(parts, _sum_partials))
        if it == 0:
            n_total = int(counts.sum())
        nz = counts > 0
        C_new = C.copy()
        C_new[nz] = sums[nz] / counts[nz][:, None]
        C = _norm_rows(C_new)
        history.append(inertia / max(n_total, 1))
    return C, history


def kmeans_assign(emb_ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """One scan → Dataset(vec_id, cluster, sim): nearest centroid per
    vector by cosine. Centroids broadcast once via ray.put."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int32()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        X = _norm_rows(_emb_matrix(t, vec_col))
        sims = X @ C.T
        a = np.argmax(sims, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(a.astype(np.int32), type=pa.int32()),
                "sim": pa.array(
                    np.round(sims[np.arange(len(X)), a], 6), type=pa.float64()
                ),
            }
        )

    return emb_ds.map_batches(assign, batch_format="pyarrow")
