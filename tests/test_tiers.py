"""Tiered dedup cascade (pipelines/tiers.py): planted duplicate groups land
in the tier that should catch them, the survivor chain is consistent, and
the report is deterministic."""

import numpy as np
import pyarrow as pa
import pytest


def _pages_table(texts):
    n = len(texts)
    return pa.table(
        {
            "url": pa.array([f"doc://{i}" for i in range(n)], type=pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.nulls(n, pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
        }
    )


def _base_texts(rng, n, n_tokens=120):
    vocab = [f"tok{i}" for i in range(5000)]
    return [
        " ".join(rng.choice(vocab, size=n_tokens, replace=True)) for _ in range(n)
    ]


def test_tier_cascade_planted_groups(ray_session):
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.functions.hashing import simhash_vector
    from imagededupx_ray.pipelines.tiers import dedup_tier_cascade

    rng = np.random.default_rng(23)
    texts = _base_texts(rng, 40)

    # tier-1 plant: exact copies of docs 0 and 1
    texts.append(texts[0])
    texts.append(texts[1])

    # tier-2 plant: doc 2 with ONE token swapped (jaccard >> 0.7)
    toks = texts[2].split()
    toks[50] = "swapped"
    texts.append(" ".join(toks))

    # tier-4 plant handled via the embedding table below (doc 3's semantic
    # twin is doc len(texts)-1 after this append: textually unrelated)
    texts.append(_base_texts(rng, 1)[0])

    n = len(texts)  # 44
    cfg = DedupConfig()
    pages = rd.from_arrow(_pages_table(texts))

    # embeddings in the pipeline's hash64(url) id domain
    from imagededupx_ray.stages.extract import _hash64_column

    ids = np.asarray(
        _hash64_column(pa.array([f"doc://{i}" for i in range(n)], type=pa.string())),
        dtype=np.int64,
    )
    E = rng.normal(size=(n, 12))
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    twin = E[3] + rng.normal(scale=1e-3, size=12)
    E[n - 1] = twin / np.linalg.norm(twin)  # semantic twin of doc 3
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(E.reshape(-1), type=pa.float64()), 12
                ),
            }
        )
    )

    rep = dedup_tier_cascade(pages, emb_ds=emb, cfg=cfg, semantic_eps=0.95)
    rep = rep.set_index("tier")

    # chain consistency
    assert (rep["docs_in"] - rep["dup_docs_removed"] == rep["docs_out"]).all()
    outs = rep["docs_out"].to_numpy()
    ins = rep["docs_in"].to_numpy()
    assert (ins[1:] == outs[:-1]).all()
    assert ins[0] == n

    # tier attribution: 2 exact copies, 1 near dup, 1 semantic twin
    assert rep.loc["1_exact", "dup_docs_removed"] == 2
    assert rep.loc["2_near", "dup_docs_removed"] == 1
    assert rep.loc["4_semantic", "dup_docs_removed"] == 1
    assert rep.loc["4_semantic", "docs_out"] == n - 4 - rep.loc[
        "3_template", "dup_docs_removed"
    ]

    # determinism
    rep2 = dedup_tier_cascade(pages, emb_ds=emb, cfg=cfg, semantic_eps=0.95)
    assert rep.reset_index().equals(rep2)


def test_tier3_catches_below_jaccard_simhash_near(ray_session):
    """A doc pair engineered to sit BELOW the jaccard verify threshold but
    within the loose simhash hamming radius is attributed to tier 3."""
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.functions import hashing as H
    from imagededupx_ray.functions import text as T
    from imagededupx_ray.pipelines.tiers import dedup_tier_cascade

    rng = np.random.default_rng(31)
    texts = _base_texts(rng, 30, n_tokens=200)
    cfg = DedupConfig()

    # search deterministically for an edit level where the pair's shingle
    # jaccard is below the verify threshold while simhash hamming lands in
    # (cfg tight max, loose max] — the tier-3 window
    def shingles_and_simhash(t):
        flat, off = T.tokenize_batch(pa.array([t]))
        th = H.token_hash_flat(flat)
        sh, counts = H.shingle_hashes(th, off, cfg.shingle_k)
        sv = H.simhash_vector(sh, counts)
        return set(sh.tolist()), int(sv[0])

    def j_and_h(a, b):
        A, ha = shingles_and_simhash(a)
        B, hb = shingles_and_simhash(b)
        j = len(A & B) / max(1, len(A | B))
        return j, bin(ha ^ hb).count("1")

    # repetition-heavy template pair: simhash is tf-weighted, so the heavy
    # repeated block pins most bits while the distinct unique tail drives
    # jaccard (over DISTINCT shingles) below the verify threshold — the
    # template-family signature tier 3 exists for
    block = " ".join(f"common{i}" for i in range(10))
    body = " ".join([block] * 30)
    planted_pair = None
    for tail_len in range(8, 61, 4):
        a = body + " " + " ".join(f"tailA{i}" for i in range(tail_len))
        b = body + " " + " ".join(f"tailB{i}" for i in range(tail_len))
        j, h = j_and_h(a, b)
        if j < cfg.jaccard_threshold and cfg.simhash_hamming_max < h <= 10:
            planted_pair = (a, b)
            break
    if planted_pair is None:
        pytest.skip("no tail length lands in the tier-3 window for this seed")

    texts.extend(planted_pair)
    pages = rd.from_arrow(_pages_table(texts))
    rep = dedup_tier_cascade(pages, cfg=cfg, loose_hamming_max=10).set_index("tier")
    assert rep.loc["1_exact", "dup_docs_removed"] == 0
    assert rep.loc["3_template", "dup_docs_removed"] >= 1
    assert (
        rep.loc["3_template", "docs_out"]
        == len(texts) - rep[["dup_docs_removed"]].to_numpy().sum()
    )


def test_keep_longest_policy_prefers_fuller_doc(ray_session):
    """keep_policy="longest": a near-dup pair whose LONGER member has the
    HIGHER doc hash survives under "longest" and is dropped under "min_id";
    removal counts are policy-invariant."""
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.pipelines.tiers import dedup_tier_cascade
    from imagededupx_ray.stages.extract import _hash64_column

    rng = np.random.default_rng(41)
    texts = _base_texts(rng, 30)

    # near-dup pair: long doc = base + tail (one swapped token keeps
    # jaccard >> threshold), short doc = base
    base = texts[5]
    toks = base.split()
    toks[10] = "swapped"
    long_doc = " ".join(toks + ["tail1", "tail2", "tail3"])
    texts.append(long_doc)
    n = len(texts)
    pages = rd.from_arrow(_pages_table(texts))
    ids = np.asarray(
        _hash64_column(pa.array([f"doc://{i}" for i in range(n)], type=pa.string())),
        dtype=np.int64,
    )
    short_id, long_id = int(ids[5]), int(ids[n - 1])

    cfg = DedupConfig()
    drops_min, drops_long = [], []
    rep_min = dedup_tier_cascade(
        pages, cfg=cfg, keep_policy="min_id", collect_drops=drops_min
    ).set_index("tier")
    rep_long = dedup_tier_cascade(
        pages, cfg=cfg, keep_policy="longest", collect_drops=drops_long
    ).set_index("tier")

    # counts are policy-invariant
    assert rep_min["dup_docs_removed"].tolist() == rep_long["dup_docs_removed"].tolist()
    assert rep_min.loc["2_near", "dup_docs_removed"] == 1

    d_min = {t: set(a.tolist()) for t, a in drops_min}
    d_long = {t: set(a.tolist()) for t, a in drops_long}
    dropped_min = d_min["2_near"] | d_min["3_template"]
    dropped_long = d_long["2_near"] | d_long["3_template"]
    # min_id keeps min(short_id, long_id); longest keeps long_doc regardless
    assert long_id not in dropped_long
    assert short_id in dropped_long
    assert min(short_id, long_id) not in dropped_min
    assert max(short_id, long_id) in dropped_min

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_tier_cascade(pages, cfg=cfg, keep_policy="best")


def test_cascade_survivors_counts_and_policy(ray_session):
    """cascade_survivors materializes exactly docs_out[last text tier] docs;
    under keep_policy="longest" the planted long doc is among them."""
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.pipelines.tiers import cascade_survivors
    from imagededupx_ray.stages.extract import _hash64_column

    rng = np.random.default_rng(43)
    texts = _base_texts(rng, 25)
    base = texts[3]
    toks = base.split()
    toks[7] = "swapped"
    long_doc = " ".join(toks + ["tail1", "tail2", "tail3"])
    texts.append(long_doc)
    texts.append(texts[0])  # exact dup too
    n = len(texts)
    pages = rd.from_arrow(_pages_table(texts))
    ids = np.asarray(
        _hash64_column(pa.array([f"doc://{i}" for i in range(n)], type=pa.string())),
        dtype=np.int64,
    )
    long_id = int(ids[n - 2])

    survivors, report = cascade_survivors(
        pages, cfg=DedupConfig(), keep_policy="longest"
    )
    sdf = survivors.to_pandas()
    assert len(sdf) == report.set_index("tier").loc["3_template", "docs_out"]
    assert long_id in set(sdf["doc_id"].astype(np.int64))
    assert int(ids[3]) not in set(sdf["doc_id"].astype(np.int64))


def test_lsa_semantic_tier_catches_token_shuffle(ray_session):
    """semantic_encoder="lsa": a token-SHUFFLED copy (bag-of-words identical
    -> LSA cosine ~1.0; 5-gram shingles and simhash destroyed -> invisible
    to tiers 2/3) is caught by the corpus-learned semantic tier."""
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.pipelines.tiers import dedup_tier_cascade

    rng = np.random.default_rng(53)
    texts = _base_texts(rng, 30)
    toks = texts[4].split()
    rng.shuffle(toks)
    shuffled = " ".join(toks)
    assert shuffled != texts[4]
    texts.append(shuffled)
    pages = rd.from_arrow(_pages_table(texts))

    rep = dedup_tier_cascade(
        pages,
        cfg=DedupConfig(),
        semantic_encoder="lsa",
        semantic_eps=0.98,
    ).set_index("tier")
    assert "4_semantic" in rep.index
    assert rep.loc["1_exact", "dup_docs_removed"] == 0
    assert rep.loc["2_near", "dup_docs_removed"] == 0
    assert rep.loc["3_template", "dup_docs_removed"] == 0
    assert rep.loc["4_semantic", "dup_docs_removed"] >= 1
    assert rep.loc["4_semantic", "method"].startswith("lsa semdedup")
