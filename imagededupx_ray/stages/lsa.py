"""Distributed LSA text embeddings — a REAL learned encoder, numpy-only.

The reference's deep text encoder (SBERT,
/root/reference/similarities/similarities/faiss_bert_similarity.py:25-62)
needs torch, which this image does not ship; the actor-pool seam in
stages/multimodal.py stays the swap point for a real transformer. This
stage provides a genuinely LEARNED dense embedding with nothing beyond
numpy: Latent Semantic Analysis (Deerwester et al. 1990) over a
feature-hashed TF-IDF matrix, factored at corpus scale without ever
materializing the n×V matrix or an n×k orthogonalization:

1. pass 1 (one narrow scan): per-block partial document-frequency vectors
   over V hashed token buckets — fixed-size (V uint32) mergeable partials.
2. pass 2 (manual block-group task exchange, the repo's standard shape):
   each task builds its docs' L2-normalized tf-idf rows and emits the V×V
   Gram partial G_b = A_bᵀA_b; partials tree-reduce (fanout-bounded).
   G is FIXED-SIZE (V², independent of corpus size) — the only global
   state, so the factorization cost does not grow with the corpus.
3. driver: eigendecomposition of G (V×V, V defaults to 2048) → top-k
   right singular vectors W with a deterministic sign convention.
4. pass 3 (one streaming scan): every doc projects x → xW (row-normalized
   tf-idf times W), L2-normalized — the LSA embedding.

Scale notes: V and k are config constants, so passes 1/3 are pure
read-bandwidth scans and pass 2's partials are V² floats per block GROUP
(grouped via util.block_group_size exactly like the dedup exchanges —
per-block emission would ship thousands of 32 MiB partials). The driver
eigh is O(V³) once, corpus-independent."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.functions.hashing import token_hash_flat
from imagededupx_ray.functions.text import tokenize_batch


def _doc_rows(batch: pa.Table, V: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, dense (n, V) float64 log-tf rows over hashed buckets)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offsets = tokenize_batch(batch["text"])
    th = token_hash_flat(flat)
    bucket = (th & np.uint64(V - 1)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids)), np.diff(offsets))
    A = np.zeros((len(ids), V), dtype=np.float64)
    if len(bucket):
        np.add.at(A, (doc_idx, bucket), 1.0)
        np.log1p(A, out=A)  # tf = log(1 + count)
    return ids, A


def _tfidf_rows(batch: pa.Table, V: int, idf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids, A = _doc_rows(batch, V)
    A *= idf[None, :]
    norms = np.linalg.norm(A, axis=1, keepdims=True)
    A /= np.maximum(norms, 1e-12)
    return ids, A


@ray.remote
def _df_partial(V: int, *tables: pa.Table):
    import numpy as _np

    df = _np.zeros(V, dtype=_np.int64)
    n_docs = 0
    for t in tables:
        if t.num_rows == 0 or "text" not in t.column_names:
            continue
        ids, A = _doc_rows(t, V)
        df += (A > 0).sum(axis=0)
        n_docs += len(ids)
    return df, n_docs


# Fit-pass row quantum (ADVICE r4 determinism fix): tf-idf rows are
# L2-normalized (entries in [0,1]), so rounding them to multiples of
# 2^-16 makes every per-doc Gram contribution an exact multiple of 2^-32
# bounded by 1 — float64 sums of such terms are EXACT (no rounding) while
# n_docs·2^32 ≤ 2^53, i.e. up to ~2.1M docs. Exact sums are
# order-independent, so the fitted model is bit-identical across block
# groupings, cluster sizes and BLAS scheduling up to that bound; beyond
# it determinism degrades gracefully to per-blocking only (documented in
# lsa_fit). The ≤2^-17 per-entry perturbation is noise next to the
# hashed-vocab collisions LSA already absorbs (gated: topic separation
# and planted-margin tests unchanged).
_GRAM_QUANTUM = float(2**16)


@ray.remote
def _gram_partial(V: int, idf_ref, *tables: pa.Table):
    import numpy as _np

    G = _np.zeros((V, V), dtype=_np.float64)
    idf = ray.get(idf_ref) if not isinstance(idf_ref, _np.ndarray) else idf_ref
    for t in tables:
        if t.num_rows == 0 or "text" not in t.column_names:
            continue
        _, A = _tfidf_rows(t, V, idf)
        _np.round(A * _GRAM_QUANTUM, out=A)
        A /= _GRAM_QUANTUM
        G += A.T @ A
    return G


@ray.remote
def _row_partial(V: int, idf_ref, *tables: pa.Table):
    """Quantized tf-idf rows of a block group — the DUAL fit path's gather
    (only taken when the whole corpus is smaller than the hashed vocab)."""
    import numpy as _np

    idf = ray.get(idf_ref) if not isinstance(idf_ref, _np.ndarray) else idf_ref
    ids_l, rows_l = [], []
    for t in tables:
        if t.num_rows == 0 or "text" not in t.column_names:
            continue
        ids, A = _tfidf_rows(t, V, idf)
        _np.round(A * _GRAM_QUANTUM, out=A)
        A /= _GRAM_QUANTUM
        ids_l.append(ids)
        rows_l.append(A)
    if not ids_l:
        return _np.empty(0, _np.int64), _np.empty((0, V), _np.float64)
    return _np.concatenate(ids_l), _np.vstack(rows_l)


# dual-path budget: gathering the n×V quantized row matrix to the driver
# costs n·V·8 bytes — tiny corpora only by construction (n ≤ V/2)
_DUAL_MAX_BYTES = 256 << 20


@ray.remote
def _sum_arrays(*arrs):
    out = arrs[0].copy()
    for a in arrs[1:]:
        out += a
    return out


def _tree_sum(refs: list, fanout: int = 8):
    while len(refs) > 1:
        refs = [
            _sum_arrays.remote(*refs[i : i + fanout])
            for i in range(0, len(refs), fanout)
        ]
    return refs[0]


def lsa_fit(docs_ds, dim: int = 64, vocab: int = 2048) -> dict:
    """Learn the LSA model over docs(doc_id, text): returns
    {"idf": (V,), "W": (V, dim), "sv": (dim,)} — fixed-size, broadcastable.
    Deterministic ACROSS cluster sizes and block groupings (ADVICE r4): the
    df pass sums integers, the Gram pass sums 2^-16-quantized rows whose
    float64 partial sums are exact up to ~2.1M docs (see _GRAM_QUANTUM),
    and the eigenvector sign convention pins each column — so the fitted
    model is bit-identical regardless of parallelism below that bound;
    above it, bit-identity holds per input blocking only.

    Corpora smaller than the hashed vocab (n ≤ V/2, e.g. eval benchmark
    corpora) fit through the DUAL n×n eigenproblem instead of the V×V
    primal — same factors (parity-gated), O(n³) instead of O(V³), rows
    doc_id-sorted so the bit-identity guarantees carry over."""
    from imagededupx_ray.util import block_group_size

    V = int(vocab)
    assert V & (V - 1) == 0, "vocab must be a power of two (hash mask)"
    blocks = docs_ds.select_columns(["doc_id", "text"]).materialize().to_arrow_refs()
    group = block_group_size(len(blocks))
    df_parts = [
        _df_partial.remote(V, *blocks[i : i + group])
        for i in range(0, len(blocks), group)
    ]
    df = np.zeros(V, dtype=np.int64)
    n_docs = 0
    for d, n in ray.get(df_parts):
        df += d
        n_docs += n
    idf = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
    idf_ref = ray.put(idf)
    k = min(dim, V)

    if 0 < n_docs <= V // 2 and n_docs * V * 8 <= _DUAL_MAX_BYTES:
        # DUAL eigenproblem: when the corpus is smaller than the hashed
        # vocab, G = AᵀA has rank ≤ n, so the top-k factors come from the
        # n×n matrix D = AAᵀ at O(n³) instead of O(V³) — eigenvectors of G
        # for eigenvalue λ>0 are w = Aᵀu/√λ with (λ,u) from D. Same
        # quantized rows as the Gram pass; rows sort by doc_id so D (hence
        # the fit) stays bit-identical across blockings and cluster sizes.
        # Exact for well-separated positive eigenvalues (parity vs the
        # primal eigh gated in tests/test_lsa.py at ~1e-13); corpora whose
        # rank can't fill k columns fall through to the primal path, whose
        # nullspace convention the dual cannot reproduce.
        parts = [
            _row_partial.remote(V, idf_ref, *blocks[i : i + group])
            for i in range(0, len(blocks), group)
        ]
        got = ray.get(parts)
        ids = np.concatenate([g[0] for g in got])
        Aq = np.vstack([g[1] for g in got])
        Aq = Aq[np.argsort(ids, kind="stable")]
        D = Aq @ Aq.T
        evals_d, U = np.linalg.eigh(D)  # ascending
        pos = evals_d[::-1]
        U = U[:, ::-1]
        floor = max(pos[0], 0.0) * 1e-10
        if len(pos) >= k and (pos[:k] > floor).all():
            lam = pos[:k]
            W = Aq.T @ (U[:, :k] / np.sqrt(lam)[None, :])
            am = np.argmax(np.abs(W), axis=0)
            sign = np.sign(W[am, np.arange(k)])
            sign[sign == 0] = 1.0
            W = W * sign[None, :]
            return {
                "idf": idf,
                "W": np.ascontiguousarray(W),
                "sv": np.sqrt(lam),
                "vocab": V,
            }

    gram_parts = [
        _gram_partial.remote(V, idf_ref, *blocks[i : i + group])
        for i in range(0, len(blocks), group)
    ]
    G = ray.get(_tree_sum(gram_parts))

    evals, evecs = np.linalg.eigh(G)  # ascending
    top = evals[::-1][:k]
    W = evecs[:, ::-1][:, :k]
    # deterministic sign: the largest-|component| entry of each column > 0
    am = np.argmax(np.abs(W), axis=0)
    sign = np.sign(W[am, np.arange(k)])
    sign[sign == 0] = 1.0
    W = W * sign[None, :]
    sv = np.sqrt(np.maximum(top, 0.0))
    return {"idf": idf, "W": np.ascontiguousarray(W), "sv": sv, "vocab": V}


def lsa_project_texts(texts: list[str], model: dict) -> np.ndarray:
    """Project a small list of raw strings (query texts) through a fitted
    model driver-side: (n, dim) L2-normalized rows, the same transform
    ``lsa_embed`` applies per batch (empty strings project to zeros)."""
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    _, A = _tfidf_rows(t, model["vocab"], model["idf"])
    E = A @ model["W"]
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    return np.where(norms > 1e-12, E / np.maximum(norms, 1e-12), 0.0)


def lsa_embed(docs_ds, model: dict):
    """Project docs through a fitted LSA model: one streaming scan emitting
    (doc_id, embedding fixed_size_list<double>[dim]), rows L2-normalized
    (empty docs embed as zeros)."""
    V = model["vocab"]
    ref = ray.put((model["idf"], model["W"]))
    dim = model["W"].shape[1]

    def project(batch: pa.Table) -> pa.Table:
        idf, W = ray.get(ref)
        ids, A = _tfidf_rows(batch, V, idf)
        E = A @ W
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        E = np.where(norms > 1e-12, E / np.maximum(norms, 1e-12), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(E.reshape(-1), type=pa.float64()), dim
                ),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        project, batch_format="pyarrow"
    )


def lsa_topk(docs_ds, queries: list[str], k: int = 10, dim: int = 64,
             vocab: int = 2048, model: dict | None = None):
    """Top-k LSA-cosine retrieval per query string — the learned-encoder
    counterpart of stages/bm25.bm25_topk with the identical output contract
    (query_id, doc_id, score, rank; ties by doc_id ascending), so the BEIR
    eval harness can swap retrievers. Fit + one streaming projection scan +
    per-batch partial top-k (block-count-bounded collect, never
    corpus-bounded)."""
    import pandas as pd

    if model is None:
        model = lsa_fit(docs_ds, dim=dim, vocab=vocab)
    Q = lsa_project_texts(queries, model)
    q_ref = ray.put(Q)

    def score_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        S = E @ q.T  # (n, nq)
        n, nq = S.shape
        kk = min(k, n)
        top = np.argpartition(-S, kk - 1, axis=0)[:kk]
        qs = np.repeat(np.arange(nq, dtype=np.int64), kk)
        di = ids[top.T.reshape(-1)]
        cs = S[top.T.reshape(-1), qs]
        return pa.table(
            {
                "query_id": pa.array(qs),
                "doc_id": pa.array(di, type=pa.int64()),
                "score": pa.array(cs, type=pa.float64()),
            }
        )

    df = (
        lsa_embed(docs_ds, model)
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["score"] = df["score"].round(6)
    return df[["query_id", "doc_id", "score", "rank"]]
