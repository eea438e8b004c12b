"""Fasttext-style quality classifier (stages/qualityclf.py): distributed
Adagrad fit equals a pure-python single-process reference bit-for-bit; the
fit is bit-identical across blockings (the integer-gradient guarantee);
planted junk separates from clean text on held-out docs; score_quality
passes metadata through and honors a pretrained-weights seam."""

import numpy as np
import pyarrow as pa


def _labeled_ds(texts, labels, n_blocks=1):
    import ray.data as rd

    n = len(texts)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "label": pa.array(labels, type=pa.int8()),
            }
        )
    )
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _corpus(rng, n_clean=24, n_junk=24):
    clean = "the quick brown fox jumps over a lazy dog near the river bank".split()
    junk = ["zz%dq" % i for i in range(30)]
    texts, labels = [], []
    for _ in range(n_clean):
        texts.append(" ".join(rng.choice(clean, size=25)))
        labels.append(1)
    for _ in range(n_junk):
        texts.append(" ".join(rng.choice(junk, size=25)))
        labels.append(0)
    return texts, labels


def _py_reference_fit(texts, labels, V, iters, lr, l2):
    """Independent single-process loop: same featurizer, naive per-doc
    quantized gradient accumulation, same Adagrad update."""
    from imagededupx_ray.stages.dsir import _feature_buckets
    from imagededupx_ray.stages.qualityclf import QUANT_BITS

    per_doc = []
    for t in texts:
        f, o = _feature_buckets(pa.array([t], type=pa.string()), V)
        per_doc.append([int(x) for x in f])
    scale = float(1 << QUANT_BITS)
    w = np.zeros(V + 1, dtype=np.float64)
    g2 = np.zeros(V + 1, dtype=np.float64)
    n = len(texts)
    for _ in range(iters):
        g = np.zeros(V + 1, dtype=np.int64)
        for f, y in zip(per_doc, labels):
            if f:
                # identical float semantics to the kernel: reduceat
                # segment sum, then multiply by the reciprocal
                inv = np.float64(1.0) / np.float64(len(f))
                s = float(
                    np.add.reduceat(w[np.array(f, dtype=np.int64)], [0])[0]
                    * inv
                )
            else:
                inv = np.float64(0.0)
                s = 0.0
            z = min(max(s + w[V], -30.0), 30.0)
            err = 1.0 / (1.0 + np.exp(-z)) - y
            if f:
                q = int(np.rint(np.float64(err * inv) * scale))
                for b in f:
                    g[b] += q
            g[V] += int(np.rint(np.float64(err) * scale))
        grad = g.astype(np.float64) / (scale * n)
        grad[:V] += l2 * w[:V]
        g2 += grad * grad
        w -= lr * grad / np.sqrt(g2 + 1e-10)
    return w


def test_fit_matches_python_reference(ray_session):
    from imagededupx_ray.stages.qualityclf import fit_quality_classifier

    rng = np.random.default_rng(7)
    texts, labels = _corpus(rng, 10, 10)
    texts.append("")  # feature-less doc trains only the bias
    labels.append(1)
    V, iters, lr, l2 = 256, 12, 0.5, 1e-8
    w = fit_quality_classifier(
        _labeled_ds(texts, labels), V=V, iters=iters, lr=lr, l2=l2
    )
    ref = _py_reference_fit(texts, labels, V, iters, lr, l2)
    assert np.array_equal(w, ref), np.abs(w - ref).max()


def test_fit_bit_identical_across_blockings(ray_session):
    """The load-bearing scale property: fixed-point int64 gradient partials
    make the tree reduce order-independent, so the fitted weights are
    BIT-identical no matter how the corpus is blocked."""
    from imagededupx_ray.stages.qualityclf import fit_quality_classifier

    rng = np.random.default_rng(11)
    texts, labels = _corpus(rng, 30, 30)
    fits = [
        fit_quality_classifier(
            _labeled_ds(texts, labels, n_blocks=nb), V=512, iters=10
        )
        for nb in (1, 5, 13)
    ]
    assert np.array_equal(fits[0], fits[1])
    assert np.array_equal(fits[0], fits[2])


def test_local_and_distributed_fit_paths_bit_equal(ray_session):
    """The small-corpus crossover (_fit_local, one task for all steps) and
    the per-iteration distributed tree-reduce produce BIT-identical
    weights — integer gradient sums commute across parts and paths."""
    from imagededupx_ray.stages.qualityclf import fit_quality_classifier

    rng = np.random.default_rng(19)
    texts, labels = _corpus(rng, 20, 20)
    ds = _labeled_ds(texts, labels, n_blocks=7)
    w_local = fit_quality_classifier(ds, V=512, iters=9)  # default crossover
    w_dist = fit_quality_classifier(ds, V=512, iters=9, local_fit_docs=0)
    assert np.array_equal(w_local, w_dist)


def test_planted_separation_on_holdout(ray_session):
    """Train on 2/3 of a junk-vs-clean corpus, score the held-out 1/3:
    accuracy >= 0.95 and probabilities ordered by class."""
    from imagededupx_ray.stages.qualityclf import (
        fit_quality_classifier,
        score_quality,
    )

    rng = np.random.default_rng(3)
    texts, labels = _corpus(rng, 60, 60)
    order = rng.permutation(len(texts))
    texts = [texts[i] for i in order]
    labels = [labels[i] for i in order]
    n_train = (2 * len(texts)) // 3
    w = fit_quality_classifier(
        _labeled_ds(texts[:n_train], labels[:n_train]), V=1024, iters=60
    )
    scored = (
        score_quality(_labeled_ds(texts[n_train:], labels[n_train:]), w)
        .to_pandas()
        .sort_values("doc_id")
    )
    pred = (scored["prob"].to_numpy() >= 0.5).astype(int)
    acc = float((pred == np.array(labels[n_train:])).mean())
    assert acc >= 0.95, acc
    # label column passed through untouched (score_quality keeps metadata)
    assert np.array_equal(
        scored["label"].to_numpy().astype(int), np.array(labels[n_train:])
    )


def test_score_pretrained_seam_and_bounds(ray_session):
    """score_quality accepts externally-supplied weights (the pretrained
    fasttext-model seam): a hand-built weight vector orders docs as
    specified; probs stay in [0, 1]; a feature-less doc scores
    sigmoid(bias)."""
    from imagededupx_ray.stages.dsir import _feature_buckets
    from imagededupx_ray.stages.qualityclf import score_quality

    V = 128
    w = np.zeros(V + 1, dtype=np.float64)
    f_good, _ = _feature_buckets(pa.array(["good"], type=pa.string()), V)
    f_bad, _ = _feature_buckets(pa.array(["bad"], type=pa.string()), V)
    w[int(f_good[0])] = 8.0
    w[int(f_bad[0])] = -8.0
    w[V] = 0.25  # bias
    ds = _labeled_ds(["good good good", "bad bad bad", ""], [1, 0, 1])
    out = score_quality(ds, w).to_pandas().sort_values("doc_id")
    p = out["prob"].to_numpy()
    # "good good good" = 3 unigram + 2 bigram features, so the good/bad
    # bucket's L1 mass is 0.6: z = ±8·0.6 + 0.25
    assert p[0] > 0.95 and p[1] < 0.05
    assert abs(p[2] - 1.0 / (1.0 + np.exp(-0.25))) < 1e-6  # prob is 6dp-rounded
    assert p.min() >= 0.0 and p.max() <= 1.0


def test_driver_component_plants_and_separates(ray_session):
    """queries.docs_quality_classifier over a small sf dir: balanced planted
    labels, holdout accuracy >= 0.9, _component_ok passes."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from imagededupx_ray.queries import _component_ok, docs_quality_classifier

    rng = np.random.default_rng(5)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(80)]
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(80), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    df = docs_quality_classifier(d, V=1024, iters=60).to_pandas()
    assert len(df) == 80
    assert set(df["label"].unique()) == {0, 1}
    ho = df[df["holdout"] == 1]
    assert float((ho["pred"] == ho["label"]).mean()) >= 0.9
    assert _component_ok("docs_quality_classifier", df)
