"""DSIR-style importance resampling weights (Xie et al. 2023,
arXiv:2302.03169): score every raw doc by how target-domain-like its
hashed n-gram distribution is, log w(x) = Σ_f c_f(x) · (log p_target[f] −
log p_raw[f]) over V hashed unigram+bigram buckets — the data-SELECTION
operator of pre-training pipelines (pick raw docs that look like the
high-quality target domain).

Scale shape (all bounded):
- two count passes emit ONE int64 V-vector per block group
  (util.block_group_size, the repo's manual-exchange discipline) and
  tree-sum with a bounded fanout; integer partials make the reduce
  order-independent, so fitted models are bit-identical at any
  parallelism.
- the weight pass is one streaming map_batches with the two V-vectors
  broadcast once (ray.put) — per-doc log-weights are sums in flat token
  order, deterministic.
V defaults to 4096 buckets (the paper uses hashed n-grams for exactly
this fixed-memory property).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.functions.hashing import splitmix64, token_hash_flat
from imagededupx_ray.functions.text import tokenize_batch


def _feature_buckets(texts: pa.Array, V: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids of unigram+bigram features, doc offsets into them).
    Bigram feature = splitmix64(h_i ^ rotl(h_{i+1}, 17)); both feature
    kinds share the V-bucket space (hashed n-grams, DSIR §2)."""
    flat, offsets = tokenize_batch(texts)
    th = token_hash_flat(flat)
    n_tok = np.diff(offsets)
    uni = th & np.uint64(V - 1)
    # bigrams within each doc: pairs (i, i+1) where i+1 stays in-doc
    last = (offsets[1:] - 1).astype(np.int64)  # last token index per doc
    keep = np.ones(len(th), dtype=bool)
    if len(th):
        keep[last[n_tok > 0]] = False  # drop per-doc last position
    a = th[:-1][keep[:-1]] if len(th) > 1 else th[:0]
    b = th[1:][keep[:-1]] if len(th) > 1 else th[:0]
    big = splitmix64(a ^ ((b << np.uint64(17)) | (b >> np.uint64(47)))) & np.uint64(
        V - 1
    )
    n_big = np.maximum(n_tok - 1, 0)
    feat_per_doc = n_tok + n_big
    out_offsets = np.concatenate([[0], np.cumsum(feat_per_doc)]).astype(np.int64)
    flat_feats = np.empty(int(feat_per_doc.sum()), dtype=np.int64)
    # interleave per doc: unigrams then bigrams (order irrelevant to counts)
    uni_starts = offsets[:-1].astype(np.int64)
    big_starts = np.concatenate([[0], np.cumsum(n_big)[:-1]]).astype(np.int64)
    for_uni = out_offsets[:-1]
    # vectorized scatter of the two ranges per doc
    idx_uni = np.repeat(for_uni, n_tok) + (
        np.arange(int(n_tok.sum())) - np.repeat(uni_starts, n_tok)
    )
    flat_feats[idx_uni] = uni.astype(np.int64)
    idx_big = np.repeat(for_uni + n_tok, n_big) + (
        np.arange(int(n_big.sum())) - np.repeat(big_starts, n_big)
    )
    flat_feats[idx_big] = big.astype(np.int64)
    return flat_feats, out_offsets


@ray.remote
def _count_partial(V: int, *tables: pa.Table) -> np.ndarray:
    import numpy as _np

    counts = _np.zeros(V, dtype=_np.int64)
    for t in tables:
        if t.num_rows == 0 or "text" not in t.column_names:
            continue
        feats, _ = _feature_buckets(t["text"], V)
        counts += _np.bincount(feats, minlength=V)
    return counts


@ray.remote
def _sum_i64(*arrs: np.ndarray) -> np.ndarray:
    out = arrs[0].copy()
    for a in arrs[1:]:
        out += a
    return out


def dsir_counts(docs_ds, V: int = 4096) -> np.ndarray:
    """Corpus hashed-ngram count vector (V int64) — block-group partials,
    fanout-bounded integer tree sum (order-independent)."""
    from imagededupx_ray.util import block_group_size

    blocks = docs_ds.select_columns(["text"]).materialize().to_arrow_refs()
    if not blocks:
        return np.zeros(V, dtype=np.int64)
    group = block_group_size(len(blocks))
    parts = [
        _count_partial.remote(V, *blocks[i : i + group])
        for i in range(0, len(blocks), group)
    ]
    while len(parts) > 1:
        parts = [_sum_i64.remote(*parts[i : i + 8]) for i in range(0, len(parts), 8)]
    return ray.get(parts[0])


def dsir_weights(docs_ds, target_counts: np.ndarray, raw_counts: np.ndarray):
    """(doc_id, logw, logw_sum) Dataset over the doc's hashed features:

    - ``logw_sum`` = Σ_f c_f(x)·(log p_target[f] − log p_raw[f]) — the
      paper's DSIR log-importance weight (log of a product over features,
      Xie et al. 2023 §2); feed THIS to an importance resampler.
    - ``logw`` = the per-feature MEAN of the same ratio — a
      length-normalized domain-likeness score (comparable across doc
      lengths; NOT the paper's weight — resampling with it removes the
      preference for longer target-like docs).

    +1 Laplace smoothing both sides; both columns rounded to 6 decimals."""
    V = len(target_counts)
    lt = np.log(target_counts + 1.0) - np.log(target_counts.sum() + V)
    lr = np.log(raw_counts + 1.0) - np.log(raw_counts.sum() + V)
    ref = ray.put(lt - lr)

    def fn(batch: pa.Table) -> pa.Table:
        llr = ray.get(ref)
        feats, offsets = _feature_buckets(batch["text"], V)
        per_feat = llr[feats]
        n_feat = np.diff(offsets)
        doc_idx = np.repeat(np.arange(batch.num_rows), n_feat)
        sums = np.bincount(doc_idx, weights=per_feat, minlength=batch.num_rows)
        logw = np.where(n_feat == 0, 0.0, sums / np.maximum(n_feat, 1))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "logw": pa.array(np.round(logw, 6), type=pa.float64()),
                "logw_sum": pa.array(np.round(sums, 6), type=pa.float64()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
