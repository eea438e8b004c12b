"""BM25 stage vs an independent pure-python implementation
(reference semantics: utils/rank_bm25.py BM25Okapi, k1=1.5 b=0.75 eps=0.25)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from imagededupx_ray.stages.bm25 import B, EPSILON, K1, bm25_topk
from tests.oracle import tokenize


def _pure_bm25(docs: dict[int, str], query: str, k: int):
    """Plain-python BM25Okapi with the same idf-floor-over-query-terms
    contract as the stage."""
    corpus = {i: tokenize(t) for i, t in docs.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    q = tokenize(query)
    q_terms = sorted(set(q))
    dfs = {t: sum(1 for toks in corpus.values() if t in toks) for t in q_terms}
    raw = {t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in q_terms}
    pos = [v for v in raw.values() if v > 0]
    floor = EPSILON * (sum(pos) / len(pos)) if pos else EPSILON
    idf = {t: (v if v > 0 else floor) for t, v in raw.items()}
    scores = []
    for i, toks in corpus.items():
        dl = len(toks)
        s = 0.0
        for t in q:  # query-term multiplicity counts, like rank_bm25
            f = toks.count(t)
            s += idf[t] * f * (K1 + 1) / (f + K1 * (1 - B + B * dl / avgdl))
        scores.append((i, s))
    scores.sort(key=lambda x: (-x[1], x[0]))
    return [(i, s) for i, s in scores[:k] if s > 0]


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(120)]
    docs = {}
    for i in range(80):
        docs[i] = " ".join(rng.choice(vocab, size=int(rng.integers(20, 80))))
    docs[80] = "rare unique signal phrase inside this document only"
    docs[81] = "another rare signal here with unique words of its own"
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), type=pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)], type=pa.string()),
        }
    )
    return rd.from_arrow(tbl), docs


def test_bm25_matches_pure_python(corpus_ds):
    ds, docs = corpus_ds
    queries = ["rare unique signal", "w1 w2 w3", "w10 w10 w10", "absent absent"]
    got = bm25_topk(ds, queries, k=10)
    for qi, q in enumerate(queries):
        want = _pure_bm25(docs, q, 10)
        sub = got[got.query_id == qi].sort_values("rank")
        assert list(sub.doc_id) == [i for i, _ in want], q
        assert np.allclose(sub.score.to_numpy(), [s for _, s in want], rtol=1e-9), q


def test_bm25_rare_term_ranks_first(corpus_ds):
    ds, _ = corpus_ds
    got = bm25_topk(ds, ["rare unique signal phrase"], k=3)
    assert int(got.iloc[0].doc_id) == 80
