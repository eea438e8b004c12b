"""Product-quantization (PQ) compressed vector search — the memory answer
for embedding search at 100-TB corpus scale (Jégou, Douze & Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Replaces the reference's autofaiss index factory, which picks IVF*,PQ*
layouts as the corpus grows (faiss_bert_similarity.py:98-130,
faiss_clip_similarity.py:147-160), with a from-scratch numpy/Ray Data
implementation:

- ``pq_fit``: per-subspace 256-word codebooks (Lloyd k-means, L2) fit on a
  deterministic corpus sample — faiss's own train-on-sample discipline.
  The model is FIXED-size state (m, 256, d/m) independent of corpus size.
- ``pq_encode``: one stateless ``map_batches`` scan emitting
  ``fixed_size_binary(m)`` codes — m bytes per vector retained instead of
  4·d (32× at d=64/m=8). The full-precision embedding column never needs
  to be read again for search.
- ``pq_search``: asymmetric distance computation (ADC). Codebooks + the
  per-query (m, 256) partial-distance look-up tables broadcast once
  (``ray.put``); every code block turns into distances by table gather
  (no float reconstruction), takes a per-block partial top-k, and the
  driver merges k·n_blocks candidates — identical scale shape to
  ``ann.brute_force_topk`` but over 1/32nd the bytes.
- ``ivfpq_search``: IVFADC — an IVF coarse quantizer (stages/ann.py
  centroids) restricts the ADC scan to the ``nprobe`` probed clusters per
  query, composing the two standard scale levers (prune + compress).

Vectors are L2-normalized first, so ADC's squared-L2 ordering equals
cosine ordering (||a-b||² = 2-2·cos on unit vectors); reported scores are
``1 - adist/2`` — the cosine the codes imply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.stages.ann import _emb_matrix, _norm_rows


def _subspace_kmeans(X: np.ndarray, k: int, seed: int, n_iter: int) -> np.ndarray:
    """Plain Lloyd k-means (L2) on one subspace. Deterministic: seeded init,
    fixed iteration count, empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(X))
    C = X[rng.choice(len(X), size=k_eff, replace=False)].astype(np.float64)
    for _ in range(n_iter):
        # (n, k) squared distances via the expansion trick
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=len(C)).astype(np.float64)
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz][:, None]
    if k_eff < k:  # pad so codes are always valid uint8 indexes
        C = np.concatenate([C, np.repeat(C[-1:], k - k_eff, axis=0)])
    return C


def pq_fit(
    emb_ds,
    m: int = 8,
    k: int = 256,
    sample: int = 20000,
    n_iter: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit (m, k, d/m) codebooks on a deterministic sample (``limit`` — the
    first blocks of the dataset; faiss trains on a sample the same way).
    d must be divisible by m. Codebook fitting is corpus-size-independent:
    the sample is bounded and each subspace fits locally."""
    if k > 256:
        raise ValueError("k must be <= 256 (codes are uint8)")
    S = _norm_rows(
        np.concatenate(
            [
                _emb_matrix(b, vec_col)
                for b in emb_ds.limit(sample).iter_batches(
                    batch_size=8192, batch_format="pyarrow"
                )
                if b.num_rows
            ]
        )
    )
    d = S.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [
            _subspace_kmeans(
                np.ascontiguousarray(S[:, j * dsub : (j + 1) * dsub]),
                k,
                seed + j,
                n_iter,
            )
            for j in range(m)
        ]
    )


def pq_encode(emb_ds, codebooks: np.ndarray, vec_col: str = "embedding"):
    """One scan → Dataset(vec_id, code: fixed_size_binary(m)). Codebooks
    broadcast once via ``ray.put``; per batch the nearest codeword per
    subspace is an (n, k) argmin — vectorized, no per-row python."""
    m, k, dsub = codebooks.shape
    cb_ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "code": pa.array([], type=pa.binary(m)),
                }
            )
        CB = ray.get(cb_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _norm_rows(_emb_matrix(t, vec_col))
        codes = np.empty((len(X), m), dtype=np.uint8)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            C = CB[j]
            d2 = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        buf = codes.tobytes(order="C")
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "code": pa.array(
                    [buf[i * m : (i + 1) * m] for i in range(len(X))],
                    type=pa.binary(m),
                ),
            }
        )

    return emb_ds.map_batches(encode, batch_format="pyarrow")


def _codes_matrix(t: pa.Table, m: int) -> np.ndarray:
    """Zero-copy-ish view of a fixed_size_binary(m) code column as (n, m)
    uint8."""
    arr = t["code"].combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, m), np.uint8)
    return np.frombuffer(
        arr.buffers()[-1], dtype=np.uint8, count=n * m, offset=arr.offset * m
    ).reshape(n, m)


def _query_luts(Q: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(nq, m, k) ADC look-up tables: LUT[q, j, c] = ||Q[q]_j - CB[j, c]||²."""
    nq = len(Q)
    m, k, dsub = codebooks.shape
    luts = np.empty((nq, m, k), dtype=np.float64)
    for j in range(m):
        sub = Q[:, j * dsub : (j + 1) * dsub]
        C = codebooks[j]
        luts[:, j, :] = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
    return luts


def pq_search(
    codes_ds,
    codebooks: np.ndarray,
    Q: np.ndarray,
    q_ids: np.ndarray,
    k: int = 10,
) -> pd.DataFrame:
    """ADC top-k of every query over the coded corpus: per block, gather
    distances from the broadcast LUTs (one (nq, n) accumulation in m table
    lookups — never a float reconstruction), partial top-k per block, merge
    on the driver (k·n_blocks candidates). Returns (query_id, vec_id,
    score=implied cosine, rank), ties broken by vec_id for determinism."""
    m, _, dsub = codebooks.shape
    Qn = _norm_rows(np.asarray(Q, dtype=np.float64))
    lut_ref = ray.put(_query_luts(Qn, codebooks))

    def partial(t: pa.Table) -> pa.Table:
        codes = _codes_matrix(t, m)
        n = len(codes)
        empty = pa.table(
            {
                "qi": pa.array([], type=pa.int32()),
                "vec_id": pa.array([], type=pa.int64()),
                "adist": pa.array([], type=pa.float64()),
            }
        )
        if n == 0:
            return empty
        luts = ray.get(lut_ref)
        nq = len(luts)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dist = np.zeros((nq, n), dtype=np.float64)
        for j in range(m):
            dist += luts[:, j, codes[:, j]]
        kk = min(k, n)
        top = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(np.arange(nq, dtype=np.int32), kk)
        vi = top.ravel()
        return pa.table(
            {
                "qi": pa.array(qi, type=pa.int32()),
                "vec_id": pa.array(ids[vi], type=pa.int64()),
                "adist": pa.array(dist[np.arange(nq)[:, None], top].ravel(), type=pa.float64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in codes_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return pd.DataFrame(columns=["query_id", "vec_id", "score", "rank"])
    df = pd.concat(parts, ignore_index=True)
    df = df.sort_values(["qi", "adist", "vec_id"], kind="stable").groupby("qi").head(k)
    df["rank"] = df.groupby("qi").cumcount() + 1
    out = pd.DataFrame(
        {
            "query_id": np.asarray(q_ids, dtype=np.int64)[df["qi"].to_numpy()],
            "vec_id": df["vec_id"].to_numpy(),
            "score": np.round(1.0 - df["adist"].to_numpy() / 2.0, 6),
            "rank": df["rank"].to_numpy().astype(np.int32),
        }
    )
    return out.reset_index(drop=True)


def pq_search_rerank(
    codes_ds,
    emb_ds,
    codebooks: np.ndarray,
    Q: np.ndarray,
    q_ids: np.ndarray,
    k: int = 10,
    factor: int = 4,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """ADC shortlist + exact rerank (the faiss ``refine`` discipline, and
    what production PQ deployments run): the codes-only scan shortlists
    ``k·factor`` candidates per query, then ONE membership-filtered scan of
    the full-precision embeddings gathers just the shortlist's vectors
    (bounded by nq·k·factor rows, never the corpus) and exact cosine
    reranks on the driver. Quantization error caps the shortlist's
    ordering, not the final ranking — recall approaches exact while the
    corpus-sized scan still reads 1/32nd the bytes."""
    short = pq_search(codes_ds, codebooks, Q, q_ids, k=k * factor)
    if short.empty:
        return pd.DataFrame(columns=["query_id", "vec_id", "score", "rank"])
    cand = np.unique(short["vec_id"].to_numpy())
    cand_ref = ray.put(np.ascontiguousarray(np.sort(cand), dtype=np.int64))

    def gather(t: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(want, ids)
        pos[pos >= len(want)] = 0
        return t.filter(pa.array(want[pos] == ids))

    picked = [
        b
        for b in emb_ds.select_columns(["vec_id", vec_col])
        .map_batches(gather, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 18, batch_format="pyarrow")
        if b.num_rows
    ]
    if not picked:
        return pd.DataFrame(columns=["query_id", "vec_id", "score", "rank"])
    tbl = pa.concat_tables(picked)
    g_ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    V = _norm_rows(_emb_matrix(tbl, vec_col))
    order = np.argsort(g_ids, kind="stable")
    g_ids, V = g_ids[order], V[order]
    Qn = _norm_rows(np.asarray(Q, dtype=np.float64))

    rows_q, rows_v, rows_s = [], [], []
    q_arr = np.asarray(q_ids, dtype=np.int64)
    for qi, qid in enumerate(q_arr):
        mine = short[short.query_id == qid]["vec_id"].to_numpy()
        pos = np.minimum(np.searchsorted(g_ids, mine), len(g_ids) - 1)
        idx = pos[g_ids[pos] == mine]
        if not len(idx):
            continue
        sims = V[idx] @ Qn[qi]
        o = np.lexsort((g_ids[idx], -sims))[:k]
        rows_q.append(np.full(len(o), qid, dtype=np.int64))
        rows_v.append(g_ids[idx][o])
        rows_s.append(np.round(sims[o], 6))
    if not rows_q:
        return pd.DataFrame(columns=["query_id", "vec_id", "score", "rank"])
    out = pd.DataFrame(
        {
            "query_id": np.concatenate(rows_q),
            "vec_id": np.concatenate(rows_v),
            "score": np.concatenate(rows_s),
        }
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def ivfpq_search(
    emb_ds,
    Q: np.ndarray,
    q_ids: np.ndarray,
    k: int = 10,
    m: int = 8,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample: int = 20000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVFADC: coarse IVF centroids (cosine k-means on a sample) restrict
    the ADC scan to each query's ``nprobe`` nearest clusters. One encode
    scan attaches (cluster, code); the search scan drops non-probed rows
    per query before the LUT gather — the standard prune+compress
    composition autofaiss picks at scale."""
    from imagededupx_ray.stages.ann import fit_centroids

    cents = fit_centroids(emb_ds, n_clusters, seed=seed)
    codebooks = pq_fit(emb_ds, m=m, sample=sample, seed=seed, vec_col=vec_col)
    m_, _, dsub = codebooks.shape
    cent_ref = ray.put(cents)
    cb_ref = ray.put(codebooks)

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int32()),
                    "code": pa.array([], type=pa.binary(m_)),
                }
            )
        C0 = ray.get(cent_ref)
        CB = ray.get(cb_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _norm_rows(_emb_matrix(t, vec_col))
        cl = np.argmax(X @ C0.T, axis=1).astype(np.int32)
        codes = np.empty((len(X), m_), dtype=np.uint8)
        for j in range(m_):
            sub = X[:, j * dsub : (j + 1) * dsub]
            C = CB[j]
            d2 = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        buf = codes.tobytes(order="C")
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(cl, type=pa.int32()),
                "code": pa.array(
                    [buf[i * m_ : (i + 1) * m_] for i in range(len(X))],
                    type=pa.binary(m_),
                ),
            }
        )

    coded = emb_ds.map_batches(encode, batch_format="pyarrow")

    Qn = _norm_rows(np.asarray(Q, dtype=np.float64))
    nprobe_eff = min(nprobe, len(cents))
    probes = np.argsort(-(Qn @ cents.T), axis=1)[:, :nprobe_eff].astype(np.int32)
    lut_ref = ray.put(_query_luts(Qn, codebooks))
    probe_ref = ray.put(probes)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "qi": pa.array([], type=pa.int32()),
                "vec_id": pa.array([], type=pa.int64()),
                "adist": pa.array([], type=pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        luts = ray.get(lut_ref)
        prb = ray.get(probe_ref)
        nq = len(luts)
        codes = _codes_matrix(t, m_)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int32)
        out_q, out_v, out_d = [], [], []
        kk = min(k, len(ids))
        for q in range(nq):
            mask = np.isin(cl, prb[q])
            if not mask.any():
                continue
            sub_codes = codes[mask]
            dist = np.zeros(len(sub_codes), dtype=np.float64)
            for j in range(m_):
                dist += luts[q, j, sub_codes[:, j]]
            kq = min(kk, len(dist))
            top = np.argpartition(dist, kq - 1)[:kq] if kq < len(dist) else np.arange(len(dist))
            out_q.append(np.full(len(top), q, dtype=np.int32))
            out_v.append(ids[mask][top])
            out_d.append(dist[top])
        if not out_q:
            return empty
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q), type=pa.int32()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "adist": pa.array(np.concatenate(out_d), type=pa.float64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in coded.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return pd.DataFrame(columns=["query_id", "vec_id", "score", "rank"])
    df = pd.concat(parts, ignore_index=True)
    df = df.sort_values(["qi", "adist", "vec_id"], kind="stable").groupby("qi").head(k)
    df["rank"] = df.groupby("qi").cumcount() + 1
    return pd.DataFrame(
        {
            "query_id": np.asarray(q_ids, dtype=np.int64)[df["qi"].to_numpy()],
            "vec_id": df["vec_id"].to_numpy(),
            "score": np.round(1.0 - df["adist"].to_numpy() / 2.0, 6),
            "rank": df["rank"].to_numpy().astype(np.int32),
        }
    ).reset_index(drop=True)
