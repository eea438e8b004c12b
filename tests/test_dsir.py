"""DSIR importance weights (stages/dsir.py): distributed counts/weights
equal a pure-python single-process reference; target-domain docs score
higher; determinism."""

import numpy as np
import pyarrow as pa


def _docs(texts, langs=None):
    import ray.data as rd

    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs or ["xx"] * n, type=pa.string()),
            }
        )
    )


def _py_reference(texts, target_idx, V):
    """Independent loop-based model: hashed unigram+bigram counts with the
    same kernels, Laplace-smoothed LLR, per-doc mean."""
    from imagededupx_ray.functions.hashing import splitmix64, token_hash_flat
    from imagededupx_ray.functions.text import tokenize_batch

    def feats_of(text):
        flat, _ = tokenize_batch(pa.array([text]))
        th = token_hash_flat(flat)
        out = [int(h) & (V - 1) for h in th]
        for i in range(len(th) - 1):
            a, b = th[i], th[i + 1]
            rot = np.uint64((int(b) << 17 | int(b) >> 47) & (2**64 - 1))
            out.append(int(splitmix64(np.array([a ^ rot], dtype=np.uint64))[0]) & (V - 1))
        return out

    t_counts = np.zeros(V)
    r_counts = np.zeros(V)
    per_doc = []
    for i, t in enumerate(texts):
        f = feats_of(t)
        per_doc.append(f)
        for b in f:
            r_counts[b] += 1
            if i in target_idx:
                t_counts[b] += 1
    lt = np.log(t_counts + 1.0) - np.log(t_counts.sum() + V)
    lr = np.log(r_counts + 1.0) - np.log(r_counts.sum() + V)
    llr = lt - lr
    mean = [
        round(float(np.mean([llr[b] for b in f])) if f else 0.0, 6) for f in per_doc
    ]
    # paper-faithful weight: SUM over features (log of product, DSIR §2)
    total = [
        round(float(np.sum([llr[b] for b in f])) if f else 0.0, 6) for f in per_doc
    ]
    return mean, total


def test_dsir_matches_python_reference(ray_session):
    from imagededupx_ray.queries import docs_dsir_weights

    rng = np.random.default_rng(17)
    cooking = "recipe oven butter flour sugar bake taste kitchen meal dish".split()
    finance = "market stock bond yield inflation trade price bank asset fund".split()
    texts, langs = [], []
    for _ in range(12):
        texts.append(" ".join(rng.choice(cooking, size=30)))
        langs.append("tgt")
    for _ in range(20):
        texts.append(" ".join(rng.choice(finance, size=30)))
        langs.append("raw")
    texts.append("")  # empty doc -> weight 0
    langs.append("raw")

    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    V = 512
    out = (
        docs_dsir_weights(d, target_lang="tgt", vocab=V)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref, ref_sum = _py_reference(texts, set(range(12)), V)
    assert np.allclose(out["logw"].to_numpy(), ref, atol=1e-6), (
        out["logw"].tolist(),
        ref,
    )
    # ADVICE r4: logw_sum is the paper's DSIR log-importance weight (sum
    # over features = log of the product), not the length-normalized mean
    assert np.allclose(out["logw_sum"].to_numpy(), ref_sum, atol=1e-4), (
        out["logw_sum"].tolist(),
        ref_sum,
    )
    # target-like docs outscore raw-domain docs; empty doc is 0
    tgt_w = out["logw"][:12].to_numpy()
    raw_w = out["logw"][12:32].to_numpy()
    assert tgt_w.min() > raw_w.max()
    assert out["logw"].iloc[-1] == 0.0
    # determinism
    out2 = (
        docs_dsir_weights(d, target_lang="tgt", vocab=V)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["logw"].to_numpy(), out2["logw"].to_numpy())
