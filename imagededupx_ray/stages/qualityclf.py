"""Fasttext-style discriminative quality classifier (Joulin et al. 2016,
arXiv:1607.01759 — linear classifier over a bag of hashed n-grams): the
"Wikipedia-vs-CommonCrawl" quality filter of GPT-3 (Brown et al. 2020
Appendix A) and LLaMA (Touvron et al. 2023 §2) pipelines. A logistic
regression over V hashed unigram+bigram buckets (the DSIR featurizer,
stages/dsir.py) is TRAINED with full-batch gradient descent and then
applied to the whole corpus as one broadcast scoring scan. The usual
deployment trains on rule-derived or curated labels (keep pages a cheap
rule likes / a reference corpus resembles) and runs the distilled linear
model at crawl scale; queries.docs_quality_classifier does exactly that
against the repo's C4/Gopher verdict kernel.

Reference parity: the reference scores quality with fixed per-score
threshold presets (improved_faiss_detector.py:785-788); a TRAINED
calibratable filter is the webtext-scale analogue.

Scale shape (all bounded, the dsir/ngramlm integer-partials discipline
applied to a trained model):
- featurization runs ONCE: block-grouped tasks emit compact CSR parts
  (int32 bucket ids, int64 doc offsets, int8 labels) that stay in the
  object store; T training iterations re-read the parts, never the text.
- every GD iteration is one fan-out over the parts emitting a FIXED-SIZE
  int64 gradient vector: per-feature-occurrence contributions are
  quantized to 2^-QUANT_BITS fixed point BEFORE summation, so the
  fanout-bounded tree sum is an exact integer reduce — the fitted weights
  are BIT-IDENTICAL at any parallelism / blocking (no float-sum order
  dependence; the quantization is a deterministic <=2^-28 perturbation of
  the gradient, not a source of run-to-run variance).
- the driver's per-iteration work is O(V): one dequantize + one weight
  update. Nothing corpus-sized ever reaches the driver.
- scoring is one streaming map_batches against the (V+1) weight vector
  broadcast once (``ray.put``); a pretrained fasttext-style model drops
  into the same seam (pass its weights instead of the self-fit).

Model (per doc, features L1-normalized so docs weigh equally):
    x_f = count_f(doc) / n_features(doc)
    p   = sigmoid(sum_f w[f] * x_f + w[V])      (w[V] = bias)
    grad_f = (p - y) * x_f + l2 * w[f]          (mean over docs; l2 skips bias)
    w     -= lr * grad
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.stages.dsir import _feature_buckets

V_DEFAULT = 1 << 16
QUANT_BITS = 28  # per-occurrence fixed-point: |contrib| <= 1, so int64
# headroom allows > 3e10 occurrences per bucket per partial at 2^28


@ray.remote
def _featurize_partial(V: int, label_col: str, *tables: pa.Table) -> tuple:
    """One CSR part: (flat int32 bucket ids, int64 doc offsets, int8 labels).
    Docs with zero features are kept (empty slice; they train the bias)."""
    import numpy as _np

    feats_l, offs_l, y_l = [], [_np.zeros(1, dtype=_np.int64)], []
    base = 0
    for t in tables:
        if t.num_rows == 0:
            continue
        flat, offsets = _feature_buckets(t["text"], V)
        feats_l.append(flat.astype(_np.int32))
        offs_l.append(offsets[1:].astype(_np.int64) + base)
        base += int(offsets[-1])
        y_l.append(
            t[label_col].to_numpy(zero_copy_only=False).astype(_np.int8)
        )
    if not y_l:
        return (
            _np.empty(0, dtype=_np.int32),
            _np.zeros(1, dtype=_np.int64),
            _np.empty(0, dtype=_np.int8),
        )
    return (
        _np.concatenate(feats_l) if feats_l else _np.empty(0, dtype=_np.int32),
        _np.concatenate(offs_l),
        _np.concatenate(y_l),
    )


def _part_gradient_arrays(
    part: tuple, w: np.ndarray, V: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact int64 (gradient vector [V+1], #docs) for one CSR part under
    weights ``w`` — the shared kernel of the distributed fit and the
    pure-python oracle (tests gate them identical). Quantizes each
    per-occurrence contribution independently, then integer-sums."""
    feats, offsets, y = part
    n = len(y)
    g = np.zeros(V + 1, dtype=np.int64)
    if n == 0:
        return g, 0
    n_feat = np.diff(offsets)
    inv = np.zeros(n, dtype=np.float64)
    nz = n_feat > 0
    inv[nz] = 1.0 / n_feat[nz]
    # per-doc score: sum of w over the doc's buckets, L1-normalized.
    # reduceat sums each doc's segment INDEPENDENTLY (a cumsum-difference
    # would fold other docs' rounding into the result and break the
    # bit-identical-across-blocking guarantee); empty segments are masked
    # out because reduceat returns the element AT an empty boundary.
    sums = np.zeros(n, dtype=np.float64)
    if len(feats) and nz.any():
        sums[nz] = np.add.reduceat(w[feats], offsets[:-1][nz]) * inv[nz]
    z = np.clip(sums + w[V], -30.0, 30.0)
    err = 1.0 / (1.0 + np.exp(-z)) - y.astype(np.float64)  # p - y, in [-1, 1]
    scale = float(1 << QUANT_BITS)
    if len(feats):
        per_occ = np.rint(np.repeat(err * inv, n_feat) * scale).astype(np.int64)
        np.add.at(g, feats.astype(np.int64), per_occ)
    g[V] = int(np.rint(err * scale).astype(np.int64).sum())
    return g, n


@ray.remote
def _fit_local(
    V: int, iters: int, lr: float, l2: float, *parts: tuple
) -> np.ndarray:
    """All ``iters`` steps inside ONE task — the small-corpus crossover.
    Bit-identical to the distributed loop: each step's gradient is the
    int64 sum of the SAME per-part quantized kernels (integer addition
    commutes), and the Adagrad update is the same float math, so blocking
    and fit-path choice never change the weights. Cuts T fan-out round
    trips to one when the featurized corpus is small."""
    w = np.zeros(V + 1, dtype=np.float64)
    g2 = np.zeros(V + 1, dtype=np.float64)
    scale = float(1 << QUANT_BITS)
    for _ in range(int(iters)):
        g = np.zeros(V + 1, dtype=np.int64)
        n = 0
        for p in parts:
            gp, np_ = _part_gradient_arrays(p, w, V)
            g += gp
            n += np_
        if n == 0:
            break
        grad = g.astype(np.float64) / (scale * n)
        grad[:V] += l2 * w[:V]
        g2 += grad * grad
        w -= lr * grad / np.sqrt(g2 + 1e-10)
    return w


@ray.remote
def _grad_partial(V: int, w_ref: np.ndarray, *parts: tuple) -> tuple:
    g = np.zeros(V + 1, dtype=np.int64)
    n = 0
    for p in parts:
        gp, np_ = _part_gradient_arrays(p, w_ref, V)
        g += gp
        n += np_
    return g, n


@ray.remote
def _sum_grad(*parts: tuple) -> tuple:
    g = parts[0][0].copy()
    n = parts[0][1]
    for p in parts[1:]:
        g += p[0]
        n += p[1]
    return g, n


def featurize_labeled(docs_ds, V: int = V_DEFAULT, label_col: str = "label"):
    """Materialize the labeled corpus as block-grouped CSR feature parts
    (object refs) plus the doc count. Run once; every GD iteration re-reads
    the parts."""
    from imagededupx_ray.util import block_group_size

    mat = docs_ds.select_columns(["text", label_col]).materialize()
    blocks = mat.to_arrow_refs()
    if not blocks:
        return [], 0
    group = block_group_size(len(blocks))
    return [
        _featurize_partial.remote(V, label_col, *blocks[i : i + group])
        for i in range(0, len(blocks), group)
    ], mat.count()


LOCAL_FIT_DOCS = 200_000  # below this, all iterations run in one task


def fit_quality_classifier(
    docs_ds,
    V: int = V_DEFAULT,
    label_col: str = "label",
    iters: int = 80,
    lr: float = 0.5,
    l2: float = 1e-8,
    local_fit_docs: int = LOCAL_FIT_DOCS,
) -> np.ndarray:
    """Train the (V+1)-weight logistic model on ``docs_ds`` (needs ``text``
    and 0/1 ``label_col``). Full-batch Adagrad, ``iters`` fixed steps —
    per-coordinate step scaling is what lets the rare hashed buckets move
    (L1-normalized features make their raw gradients ~1/(n_docs·n_feat);
    plain GD would need thousands of passes). Every step's gradient is an
    exact integer tree-reduce (module docstring) and the Adagrad state is
    driver-side float math over those exact sums, so the result stays
    bit-identical at any parallelism. Corpora at or under
    ``local_fit_docs`` run every iteration inside one task instead
    (``_fit_local`` — same integer sums, so bit-identical to the
    distributed loop; tests gate the equality)."""
    parts, n_docs = featurize_labeled(docs_ds, V, label_col)
    w = np.zeros(V + 1, dtype=np.float64)
    if not parts:
        return w
    if n_docs <= local_fit_docs:
        # small-corpus crossover: one task runs every iteration over the
        # same CSR parts — bit-identical (see _fit_local) without T
        # driver round trips
        return ray.get(_fit_local.remote(V, iters, lr, l2, *parts))
    scale = float(1 << QUANT_BITS)
    g2 = np.zeros(V + 1, dtype=np.float64)
    for _ in range(int(iters)):
        w_ref = ray.put(w)
        grads = [_grad_partial.remote(V, w_ref, p) for p in parts]
        while len(grads) > 1:
            grads = [
                _sum_grad.remote(*grads[i : i + 8])
                for i in range(0, len(grads), 8)
            ]
        g_int, n = ray.get(grads[0])
        if n == 0:
            break
        grad = g_int.astype(np.float64) / (scale * n)
        grad[:V] += l2 * w[:V]
        g2 += grad * grad
        w -= lr * grad / np.sqrt(g2 + 1e-10)
    return w


def _batch_probs(texts, w: np.ndarray) -> np.ndarray:
    """Keep-probabilities for one batch's text column under weights ``w``
    — the shared scoring kernel of score_quality and
    quality_filter_by_model. Feature-less docs score sigmoid(bias)."""
    V = len(w) - 1
    feats, offsets = _feature_buckets(texts, V)
    n = len(offsets) - 1
    n_feat = np.diff(offsets)
    inv = np.zeros(n, dtype=np.float64)
    nz = n_feat > 0
    inv[nz] = 1.0 / n_feat[nz]
    sums = np.zeros(n, dtype=np.float64)
    if len(feats) and nz.any():
        sums[nz] = np.add.reduceat(w[feats], offsets[:-1][nz]) * inv[nz]
    z = np.clip(sums + w[V], -30.0, 30.0)
    return 1.0 / (1.0 + np.exp(-z))


def score_quality(docs_ds, weights: np.ndarray, round_dp: int = 6):
    """The trained model applied to every doc in one broadcast scan: the
    input Dataset minus ``text`` plus a ``prob`` keep-probability column
    (non-text columns pass through, so corpus metadata needs no join).
    ``prob`` is rounded (stable across machines — the score is a
    deterministic dot product of the bit-identical fit)."""
    ref = ray.put(np.asarray(weights, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        prob = np.round(_batch_probs(batch["text"], ray.get(ref)), round_dp)
        return batch.drop_columns(["text"]).append_column(
            "prob", pa.array(prob, type=pa.float64())
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def quality_filter_by_model(
    docs_ds, weights: np.ndarray, threshold: float = 0.5, text_col: str = "text"
):
    """KEEP rows whose model keep-probability clears ``threshold`` — one
    broadcast scan, every column (text included) passes through: the
    refine-pipeline shape, where downstream stages still need the text
    (score_quality is the scoring-REPORT shape and drops it)."""
    ref = ray.put(np.asarray(weights, dtype=np.float64))
    thr = float(threshold)

    def fn(batch: pa.Table) -> pa.Table:
        keep = _batch_probs(batch[text_col], ray.get(ref)) >= thr
        return batch.filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow")
