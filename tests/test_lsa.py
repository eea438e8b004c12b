"""Distributed LSA encoder (stages/lsa.py): Gram/eigen parity vs a dense
single-process computation, topic separation, determinism, empty docs."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _dense_reference(texts, V, dim):
    """Single-process dense LSA with the same hashing/weighting."""
    from imagededupx_ray.functions.hashing import token_hash_flat
    from imagededupx_ray.functions.text import tokenize_batch

    A = np.zeros((len(texts), V), dtype=np.float64)
    flat, offsets = tokenize_batch(pa.array(texts))
    th = token_hash_flat(flat)
    bucket = (th & np.uint64(V - 1)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts)), np.diff(offsets))
    np.add.at(A, (doc_idx, bucket), 1.0)
    A = np.log1p(A)
    df = (A > 0).sum(axis=0)
    idf = np.log((1.0 + len(texts)) / (1.0 + df)) + 1.0
    A *= idf[None, :]
    A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    # fit-pass quantization (the spec's determinism device, stages/lsa.py
    # _GRAM_QUANTUM): Gram over 2^-16-grid rows; projection uses raw rows
    Aq = np.round(A * 2**16) / 2**16
    G = Aq.T @ Aq
    evals, evecs = np.linalg.eigh(G)
    W = evecs[:, ::-1][:, :dim]
    am = np.argmax(np.abs(W), axis=0)
    sign = np.sign(W[am, np.arange(dim)])
    sign[sign == 0] = 1.0
    W = W * sign[None, :]
    E = A @ W
    n = np.linalg.norm(E, axis=1, keepdims=True)
    return idf, G, W, np.where(n > 1e-12, E / np.maximum(n, 1e-12), 0.0)


def _topic_texts(rng, n_per=8):
    topics = {
        "cooking": "recipe oven butter flour sugar bake taste kitchen meal dish",
        "space": "rocket orbit planet launch satellite astronaut gravity moon mars star",
        "finance": "market stock bond yield inflation trade price bank asset fund",
    }
    texts, labels = [], []
    for label, vocab in topics.items():
        words = vocab.split()
        for _ in range(n_per):
            texts.append(" ".join(rng.choice(words, size=40, replace=True)))
            labels.append(label)
    return texts, labels


def test_lsa_matches_dense_reference(ray_session):
    from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit

    rng = np.random.default_rng(3)
    texts, _ = _topic_texts(rng)
    V, dim = 256, 8
    model = lsa_fit(_docs(texts), dim=dim, vocab=V)
    idf_ref, G_ref, W_ref, E_ref = _dense_reference(texts, V, dim)
    assert np.allclose(model["idf"], idf_ref)
    assert np.allclose(model["W"], W_ref, atol=1e-8)
    out = (
        lsa_embed(_docs(texts), model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    E = np.stack(out["embedding"].to_numpy())
    assert np.allclose(E, E_ref, atol=1e-8)


def test_lsa_topic_separation(ray_session):
    """Learned embeddings place same-topic docs closer than cross-topic —
    the property a real encoder must have and a random projection lacks."""
    from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit

    rng = np.random.default_rng(4)
    texts, labels = _topic_texts(rng, n_per=10)
    model = lsa_fit(_docs(texts), dim=16, vocab=512)
    out = (
        lsa_embed(_docs(texts), model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    E = np.stack(out["embedding"].to_numpy())
    S = E @ E.T
    lab = np.array(labels)
    same = lab[:, None] == lab[None, :]
    off_diag = ~np.eye(len(lab), dtype=bool)
    intra = S[same & off_diag].mean()
    inter = S[~same].mean()
    assert intra > inter + 0.3, (intra, inter)


def test_lsa_deterministic_and_empty_docs(ray_session):
    from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit

    rng = np.random.default_rng(5)
    texts, _ = _topic_texts(rng, n_per=4)
    texts.append("")  # empty doc embeds as zeros
    m1 = lsa_fit(_docs(texts), dim=8, vocab=256)
    m2 = lsa_fit(_docs(texts), dim=8, vocab=256)
    assert np.array_equal(m1["W"], m2["W"])
    # ADVICE r4: bit-identical across BLOCKINGS too (different block
    # boundaries/groupings change the fp summation order; the quantized
    # Gram pass makes every partial sum exact, hence order-independent)
    m3 = lsa_fit(_docs(texts).repartition(2), dim=8, vocab=256)
    m4 = lsa_fit(_docs(texts).repartition(7), dim=8, vocab=256)
    assert np.array_equal(m1["W"], m3["W"])
    assert np.array_equal(m1["W"], m4["W"])
    assert np.array_equal(m1["idf"], m3["idf"])
    out = (
        lsa_embed(_docs(texts), m1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    E = np.stack(out["embedding"].to_numpy())
    assert np.allclose(E[-1], 0.0)
    norms = np.linalg.norm(E[:-1], axis=1)
    assert np.allclose(norms, 1.0)


def test_lsa_semdedup_groups_paraphrases(ray_session, tmp_path):
    """LSA -> SemDeDup end-to-end: exact/near-duplicate docs land in one
    semantic component with exactly one keeper; distinct-topic docs stay
    singletons."""
    import pandas as pd
    import pyarrow.parquet as pq

    from imagededupx_ray.queries import lsa_semdedup

    rng = np.random.default_rng(7)
    texts, _ = _topic_texts(rng, n_per=6)
    # plant a duplicate trio: one base doc + an exact copy + a one-word edit
    # (measured LSA cosine ~0.979 at this config; the tail-append variant
    # lands ~0.914, below the 0.97 verdict threshold)
    base = texts[0]
    texts.append(base)
    texts.append(" ".join(base.split()[:-1] + ["changed"]))
    doc_ids = list(range(len(texts)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = lsa_semdedup(str(tmp_path), dim=8, vocab=256, eps=0.97)
    assert isinstance(out, pd.DataFrame)
    assert sorted(out["vec_id"]) == doc_ids
    trio = out[out["vec_id"].isin([0, len(texts) - 2, len(texts) - 1])]
    assert set(trio["semdup_id"]) == {0}, trio
    comp = out[out["semdup_id"] == 0]
    assert int(comp["keep"].sum()) == 1
    # every component keeps exactly one representative
    keeps = out.groupby("semdup_id")["keep"].sum()
    assert (keeps == 1).all()


def test_lsa_search_matches_dense_ranking(ray_session, tmp_path):
    """lsa_search's distributed partial-top-k ranking equals the dense
    single-process ranking (same model, same tie-breaks), and planted
    query-matching docs rank first."""
    import pyarrow.parquet as pq

    from imagededupx_ray.queries import ENSEMBLE_QUERIES, lsa_search
    from imagededupx_ray.stages.lsa import lsa_fit, lsa_project_texts

    rng = np.random.default_rng(11)
    texts, _ = _topic_texts(rng, n_per=8)
    # plant one doc per fixed query that repeats the query's tokens
    for q in ENSEMBLE_QUERIES:
        texts.append((q + " ") * 10)
    ids = list(range(len(texts)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    k, dim, vocab = 5, 16, 512
    # the SAME fitted model drives both sides: near-degenerate trailing
    # eigenvalues make independently-fitted bases rotate (summation-order
    # float noise), so the gate pins the distributed top-k machinery, and
    # a separate default-path check pins planted-rank-1 robustness
    model = lsa_fit(_docs(texts), dim=dim, vocab=vocab)
    out = lsa_search(str(tmp_path), k=k, dim=dim, vocab=vocab, model=model)

    from imagededupx_ray.stages.lsa import lsa_embed

    E = np.stack(
        lsa_embed(_docs(texts), model)
        .to_pandas()
        .sort_values("doc_id")["embedding"]
        .to_numpy()
    )
    Q = lsa_project_texts(list(ENSEMBLE_QUERIES), model)
    for qi in range(len(ENSEMBLE_QUERIES)):
        s = E @ Q[qi]
        order = np.lexsort((np.arange(len(s)), -s))[:k]
        got = out[out["query_id"] == qi].sort_values("rank")["doc_id"].tolist()
        assert got == [int(i) for i in order], (qi, got, order)
        # the planted repeat-the-query doc is rank 1
        assert got[0] == len(texts) - len(ENSEMBLE_QUERIES) + qi

    # default path (model fitted inside): planted docs still rank 1
    out_default = lsa_search(str(tmp_path), k=k, dim=dim, vocab=vocab)
    for qi in range(len(ENSEMBLE_QUERIES)):
        top1 = (
            out_default[out_default["query_id"] == qi]
            .sort_values("rank")["doc_id"]
            .iloc[0]
        )
        assert top1 == len(texts) - len(ENSEMBLE_QUERIES) + qi


def test_lsa_dual_path_rank_deficient_fallback(ray_session):
    """A corpus whose rank cannot fill dim columns must fall through to the
    primal V x V path (the dual cannot reproduce the nullspace convention):
    the model still carries dim columns and embeds without NaN."""
    from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit

    texts = ["alpha beta", "alpha beta", "gamma delta", "", "gamma delta"]
    model = lsa_fit(_docs(texts), dim=8, vocab=64)
    assert model["W"].shape == (64, 8)
    assert np.isfinite(model["W"]).all() and np.isfinite(model["sv"]).all()
    E = np.stack(
        lsa_embed(_docs(texts), model)
        .to_pandas()
        .sort_values("doc_id")["embedding"]
        .to_numpy()
    )
    assert np.isfinite(E).all()
    # the two identical pairs embed identically
    assert np.allclose(E[0], E[1]) and np.allclose(E[2], E[4])
