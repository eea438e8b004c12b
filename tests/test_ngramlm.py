"""CCNet-style bigram-LM perplexity filter (stages/ngramlm.py): distributed
fit + scoring equal a pure-python loop reference; exact tertile cutoffs;
gibberish lands in the tail; fit is bit-identical across parallelism."""

import numpy as np
import pyarrow as pa


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


def _py_reference(texts, V1, V2, lam):
    """Independent loop-based LM: same hash kernels, per-doc interpolated
    mean NLL (first token unigram-only), rounded to 6 dp."""
    from imagededupx_ray.functions.hashing import splitmix64, token_hash_flat
    from imagededupx_ray.functions.text import tokenize_batch

    def tok_hashes(text):
        flat, _ = tokenize_batch(pa.array([text]))
        return [int(h) for h in token_hash_flat(flat)]

    def big_bucket(a, b):
        rot = np.uint64((b << 17 | b >> 47) & (2**64 - 1))
        return int(
            splitmix64(np.array([np.uint64(a) ^ rot], dtype=np.uint64))[0]
        ) & (V2 - 1)

    c1 = np.zeros(V1)
    cctx = np.zeros(V1)
    c2 = np.zeros(V2)
    per_doc = []
    for t in texts:
        hs = tok_hashes(t)
        per_doc.append(hs)
        for h in hs:
            c1[h & (V1 - 1)] += 1
        for a, b in zip(hs[:-1], hs[1:]):
            cctx[a & (V1 - 1)] += 1
            c2[big_bucket(a, b)] += 1
    T = c1.sum()
    scores = {}
    for i, hs in enumerate(per_doc):
        if not hs:
            continue
        nll = []
        for j, h in enumerate(hs):
            p_uni = (c1[h & (V1 - 1)] + 1.0) / (T + V1)
            if j == 0:
                nll.append(-np.log(p_uni))
            else:
                prev = hs[j - 1]
                p_big = (c2[big_bucket(prev, h)] + 1.0) / (
                    cctx[prev & (V1 - 1)] + V2
                )
                nll.append(-np.log(lam * p_big + (1.0 - lam) * p_uni))
        scores[i] = round(float(np.mean(nll)), 6)
    return (c1, cctx, c2), scores


def _corpus(n_common=60, n_gibberish=12, seed=11):
    rng = np.random.default_rng(seed)
    common = [
        "the cat sat on the mat and the dog slept",
        "a quick brown fox jumps over the lazy dog",
        "to be or not to be that is the question",
    ]
    texts = [
        common[i % 3] + " " + common[(i + 1) % 3] for i in range(n_common)
    ]
    for _ in range(n_gibberish):
        texts.append(
            " ".join(
                "".join(rng.choice(list("qxzjvkwy"), size=9)) for _ in range(10)
            )
        )
    texts.append("")  # empty doc -> dropped from scoring
    return texts


def test_lm_fit_and_scores_match_python_reference(ray_session):
    from imagededupx_ray.stages.ngramlm import bigram_lm_counts, bigram_logppl

    texts = _corpus()
    V1, V2, lam = 1 << 10, 1 << 12, 0.8
    ds = _docs(texts)
    counts = bigram_lm_counts(ds, V1, V2)
    (r1, rctx, r2), ref_scores = _py_reference(texts, V1, V2, lam)
    assert np.array_equal(counts[0], r1.astype(np.int64))
    assert np.array_equal(counts[1], rctx.astype(np.int64))
    assert np.array_equal(counts[2], r2.astype(np.int64))

    out = (
        bigram_logppl(ds, counts, lam=lam)
        .to_pandas()
        .set_index("doc_id")["logppl"]
        .to_dict()
    )
    assert set(out) == set(ref_scores)  # empty doc dropped
    for i, v in ref_scores.items():
        assert abs(out[i] - v) < 2e-6, (i, out[i], v)


def test_fit_bit_identical_across_parallelism(ray_session):
    from imagededupx_ray.stages.ngramlm import bigram_lm_counts

    texts = _corpus(seed=23)
    V1, V2 = 1 << 10, 1 << 12
    a = bigram_lm_counts(_docs(texts), V1, V2)
    b = bigram_lm_counts(_docs(texts).repartition(7), V1, V2)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_cutoffs_exact_and_gibberish_in_tail(ray_session):
    from imagededupx_ray.stages.ngramlm import (
        bigram_lm_counts,
        bigram_logppl,
        ppl_bucket,
        ppl_cutoffs,
    )

    texts = _corpus(n_common=90, n_gibberish=15)
    ds = _docs(texts)
    counts = bigram_lm_counts(ds, 1 << 10, 1 << 12)
    scores = bigram_logppl(ds, counts).materialize()
    cut = ppl_cutoffs(scores)

    # oracle: same definition over the collected quantized scores
    q = np.round(scores.to_pandas()["logppl"].to_numpy(), 3)
    qs = np.sort(q)
    n = len(qs)
    for f, c in zip((1 / 3, 2 / 3), cut):
        uq = np.unique(qs)
        cum = np.array([(qs <= v).sum() for v in uq])
        want = float(uq[np.searchsorted(cum, int(np.ceil(f * n)))])
        assert c == want

    b = ppl_bucket(scores, cut).to_pandas()
    gib_ids = set(range(90, 105))
    gib = b[b["doc_id"].isin(gib_ids)]
    assert (gib["bucket"] == "tail").all()
    # tertile sizes: head holds >= ceil(n/3), no bucket empty
    vc = b["bucket"].value_counts()
    assert set(vc.index) == {"head", "middle", "tail"}
    assert vc["head"] >= int(np.ceil(n / 3)) - 1


def test_query_entry_runs(ray_session):
    from imagededupx_ray.queries import docs_ppl_buckets

    out = docs_ppl_buckets("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"doc_id", "logppl", "bucket"}
    assert np.isfinite(out["logppl"].to_numpy()).all()
    assert set(out["bucket"].unique()) <= {"head", "middle", "tail"}
