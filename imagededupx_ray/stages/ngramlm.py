"""CCNet-style n-gram language-model perplexity filter (Wenzek et al.
2019, arXiv:1911.00359 §4.3): score every doc by its perplexity under a
bigram LM, split the corpus into head / middle / tail perplexity tertiles,
and (optionally) drop the tail — the quality gate every CommonCrawl
curation pipeline runs between dedup and release. CCNet scores with a
pretrained KenLM; here the LM is fit on the corpus itself with HASHED
n-gram buckets (the DSIR fixed-memory trick, stages/dsir.py) so the whole
fit is two fixed-size integer vectors and the pure-python oracle can gate
scoring bit-for-bit. A pretrained LM drops into the same broadcast seam
(pass its count vectors instead of the self-fit).

Reference parity: the reference's quality gating is per-file threshold
filters (improved_faiss_detector.py's score cutoffs); the corpus-level LM
tertile is the webtext analogue.

Scale shape (all bounded):
- ONE count pass emits three int64 vectors per block group — unigram
  buckets ``c1[V1]``, context-position buckets ``cctx[V1]`` and bigram
  buckets ``c2[V2]`` — summed through a fanout-bounded integer tree, so
  the fitted LM is bit-identical at any parallelism / blocking.
- scoring is one streaming map_batches against the broadcast vectors
  (``ray.put`` once); per-doc means via ``reduceat`` in flat token order.
- tertile cutoffs come from an EXACT histogram over scores quantized to
  ``quant`` decimals: the distinct-key domain is range-bounded (webtext
  logppl spans a few units -> thousands of keys at 3 dp), so
  ``util.partial_groupby`` folds it without an all-to-all sort and the
  driver sees only the histogram. Deterministic — no sketch, no sample.

Interpolated scoring (first token of a doc is unigram-only):

    p_uni(w)   = (c1[u(w)] + 1) / (T + V1)
    p_big(w|v) = (c2[b(v,w)] + 1) / (cctx[u(v)] + V2)
    nll_i      = -log(lam * p_big + (1 - lam) * p_uni)
    logppl     = mean_i nll_i          (natural log, rounded to 6 dp)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.functions.hashing import splitmix64, token_hash_flat
from imagededupx_ray.functions.text import tokenize_batch

V1_DEFAULT = 1 << 18
V2_DEFAULT = 1 << 20


def _uni_big_buckets(
    texts: pa.Array, V1: int, V2: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(unigram bucket per token, bigram bucket per in-doc adjacent pair,
    int64 token offsets). Bigram bucket = splitmix64(h_v ^ rotl(h_w, 17))
    masked to V2 — the DSIR mixing (stages/dsir.py), so a left/right swap
    changes the bucket."""
    flat, offsets = tokenize_batch(texts)
    th = token_hash_flat(flat)
    uni = (th & np.uint64(V1 - 1)).astype(np.int64)
    n_tok = np.diff(offsets)
    # adjacent pairs (i, i+1) that stay inside one doc: drop each doc's
    # last token position from the left side
    keep = np.ones(len(th), dtype=bool)
    if len(th):
        last = (offsets[1:] - 1).astype(np.int64)
        keep[last[n_tok > 0]] = False
    a = th[:-1][keep[:-1]] if len(th) > 1 else th[:0]
    b = th[1:][keep[:-1]] if len(th) > 1 else th[:0]
    big = (
        splitmix64(a ^ ((b << np.uint64(17)) | (b >> np.uint64(47))))
        & np.uint64(V2 - 1)
    ).astype(np.int64)
    return uni, big, offsets


@ray.remote
def _lm_count_partial(V1: int, V2: int, *tables: pa.Table) -> tuple:
    import numpy as _np

    c1 = _np.zeros(V1, dtype=_np.int64)
    cctx = _np.zeros(V1, dtype=_np.int64)
    c2 = _np.zeros(V2, dtype=_np.int64)
    for t in tables:
        if t.num_rows == 0 or "text" not in t.column_names:
            continue
        uni, big, offsets = _uni_big_buckets(t["text"], V1, V2)
        c1 += _np.bincount(uni, minlength=V1)
        c2 += _np.bincount(big, minlength=V2)
        # context positions = all but each doc's last token — recompute the
        # keep mask cheaply from the offsets
        n_tok = _np.diff(offsets)
        keep = _np.ones(len(uni), dtype=bool)
        if len(uni):
            last = (offsets[1:] - 1).astype(_np.int64)
            keep[last[n_tok > 0]] = False
        cctx += _np.bincount(uni[keep], minlength=V1)
    return c1, cctx, c2


@ray.remote
def _sum3(*parts: tuple) -> tuple:
    c1, cctx, c2 = (p.copy() for p in parts[0])
    for p in parts[1:]:
        c1 += p[0]
        cctx += p[1]
        c2 += p[2]
    return c1, cctx, c2


def bigram_lm_counts(
    docs_ds, V1: int = V1_DEFAULT, V2: int = V2_DEFAULT
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit the hashed bigram LM: (c1, cctx, c2) int64 count vectors via
    block-group partials + fanout-bounded integer tree sum
    (order-independent -> bit-identical fits at any parallelism)."""
    from imagededupx_ray.util import block_group_size

    blocks = docs_ds.select_columns(["text"]).materialize().to_arrow_refs()
    if not blocks:
        z = np.zeros(V1, dtype=np.int64)
        return z, z.copy(), np.zeros(V2, dtype=np.int64)
    group = block_group_size(len(blocks))
    parts = [
        _lm_count_partial.remote(V1, V2, *blocks[i : i + group])
        for i in range(0, len(blocks), group)
    ]
    while len(parts) > 1:
        parts = [_sum3.remote(*parts[i : i + 8]) for i in range(0, len(parts), 8)]
    return ray.get(parts[0])


def _broadcast_lm(counts: tuple[np.ndarray, np.ndarray, np.ndarray]):
    """``ray.put`` the scoring-ready LM once: (log p_uni per unigram
    bucket, log bigram denominator per context bucket, raw bigram counts)."""
    c1, cctx, c2 = counts
    V1, V2 = len(c1), len(c2)
    T = float(c1.sum())
    return ray.put(
        (
            np.log(c1 + 1.0) - np.log(T + V1),
            np.log(np.maximum(cctx, 0) + float(V2)),
            c2,
        )
    )


def _batch_logppl(
    texts: pa.Array, lm: tuple, V1: int, V2: int, lam: float
) -> tuple[np.ndarray, np.ndarray]:
    """(nonempty-row mask, logppl per nonempty row rounded to 6 dp) for one
    Arrow text column under the broadcast LM — the shared scoring kernel of
    ``bigram_logppl`` and ``ppl_tail_filter``."""
    lp_uni_b, log_den_b, c2_b = lm
    uni, big, offsets = _uni_big_buckets(texts, V1, V2)
    n_tok = np.diff(offsets)
    keep = n_tok > 0
    p_uni = np.exp(lp_uni_b[uni])
    nll = np.empty(len(uni), dtype=np.float64)
    if len(uni):
        # per-token position: is it a doc's first token?
        first = np.zeros(len(uni), dtype=bool)
        first[offsets[:-1][keep]] = True
        # bigram term aligns with the NON-first positions; its CONTEXT
        # is the non-LAST positions — both enumerate the in-doc
        # (i-1, i) pairs in the same flat order as ``big``
        nonlast = np.ones(len(uni), dtype=bool)
        nonlast[(offsets[1:] - 1)[keep]] = False
        p_big = (c2_b[big] + 1.0) / np.exp(log_den_b[uni[nonlast]])
        nll[first] = -np.log(p_uni[first])
        nll[~first] = -np.log(lam * p_big + (1.0 - lam) * p_uni[~first])
    sums = (
        np.add.reduceat(nll, offsets[:-1][keep]) if keep.any() else np.empty(0)
    )
    return keep, np.round(sums / n_tok[keep].astype(np.float64), 6)


def bigram_logppl(
    docs_ds,
    counts: tuple[np.ndarray, np.ndarray, np.ndarray],
    lam: float = 0.8,
):
    """(doc_id, logppl) Dataset: per-doc mean token NLL under the
    interpolated hashed bigram LM (module docstring formula). Empty docs
    are dropped (no tokens to score). One streaming scan against the
    broadcast count vectors."""
    V1, V2 = len(counts[0]), len(counts[2])
    ref = _broadcast_lm(counts)
    lam = float(lam)

    def score(batch: pa.Table) -> pa.Table:
        keep, scores = _batch_logppl(batch["text"], ray.get(ref), V1, V2, lam)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "logppl": pa.array(scores, type=pa.float64()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def ppl_tail_filter(
    docs_ds,
    counts: tuple[np.ndarray, np.ndarray, np.ndarray],
    cutoff: float,
    lam: float = 0.8,
    quant: int = 3,
):
    """Drop the perplexity TAIL: keep rows whose quantized logppl <=
    ``cutoff`` (the 2/3 tertile boundary from ``ppl_cutoffs`` -> CCNet's
    head+middle). Re-scores each batch against the broadcast LM instead of
    joining the scores Dataset back — a second streaming scan beats a
    corpus-sized doc_id join/broadcast at scale. Token-less docs pass
    through (no LM evidence; upstream quality gates own the empty-doc
    rule). Keeps every input column."""
    V1, V2 = len(counts[0]), len(counts[2])
    ref = _broadcast_lm(counts)
    lam, cutoff = float(lam), float(cutoff)

    def fn(batch: pa.Table) -> pa.Table:
        keep, scores = _batch_logppl(batch["text"], ray.get(ref), V1, V2, lam)
        mask = np.ones(batch.num_rows, dtype=bool)
        mask[keep] = np.round(scores, quant) <= cutoff
        return batch.filter(pa.array(mask))

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def ppl_cutoffs(
    scores_ds, fracs: tuple[float, ...] = (1 / 3, 2 / 3), quant: int = 3
) -> list[float]:
    """Exact quantile cutoffs over ``round(logppl, quant)`` — the CCNet
    head/middle/tail tertile boundaries. The histogram rides
    ``util.partial_groupby`` (key domain is range-bounded: thousands of
    distinct quantized values), driver work is one cumsum over it. Cutoff
    for fraction f = smallest quantized value with cumulative count
    >= ceil(f * N) — docs <= cutoff fill the lower buckets."""
    import pyarrow.compute as pc

    from imagededupx_ray.util import partial_groupby

    hist = (
        partial_groupby(
            scores_ds.map_batches(
                lambda t: pa.table({"q": pc.round(t["logppl"], quant)}),
                batch_format="pyarrow",
            ),
            ["q"],
            [("count", "q", "n")],
        )
        .to_pandas()
        .sort_values("q")
    )
    if not len(hist):
        return [float("nan")] * len(fracs)
    q = hist["q"].to_numpy(dtype=np.float64)
    cum = hist["n"].to_numpy(dtype=np.int64).cumsum()
    total = int(cum[-1])
    return [
        float(q[int(np.searchsorted(cum, int(np.ceil(f * total))))])
        for f in fracs
    ]


def ppl_bucket(scores_ds, cutoffs: list[float], quant: int = 3):
    """(doc_id, logppl, bucket) with bucket in head|middle|tail by the
    quantized score vs the two cutoffs (head: q <= c0; tail: q > c1)."""
    c0, c1 = float(cutoffs[0]), float(cutoffs[1])

    def fn(batch: pa.Table) -> pa.Table:
        qv = np.round(batch["logppl"].to_numpy(zero_copy_only=False), quant)
        bucket = np.where(qv <= c0, "head", np.where(qv <= c1, "middle", "tail"))
        return batch.append_column("bucket", pa.array(bucket, type=pa.string()))

    return scores_ds.map_batches(fn, batch_format="pyarrow")
