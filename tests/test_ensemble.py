"""Ensemble retrieval end-to-end (SURVEY.md §2.10 — reference
EnsembleSimilarity, ensemble_similarity.py:27-170) + the TF-IDF retriever
it fuses (M3): parity against a pure-python tfidf oracle and a manual RRF."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet").to_pandas()


def _py_tfidf_topk(docs, queries, k):
    """Pure-python oracle: same tokenization (lower + whitespace split),
    w = tf * ln(N/df), cosine, ties by doc_id."""
    import collections
    import math

    toks = {}
    for _, r in docs.iterrows():
        t = r.text.lower().split()
        if t:
            toks[int(r.doc_id)] = collections.Counter(t)
    n = len(toks)
    df = collections.Counter()
    for c in toks.values():
        for t in c:
            df[t] += 1
    w = {
        d: {t: tf * math.log(n / df[t]) for t, tf in c.items()} for d, c in toks.items()
    }
    norms = {d: math.sqrt(sum(v * v for v in ws.values())) for d, ws in w.items()}
    out = []
    for qi, q in enumerate(queries):
        qc = collections.Counter(q.lower().split())
        qw = {t: tf * math.log(n / df[t]) for t, tf in qc.items() if t in df}
        qn = math.sqrt(sum(v * v for v in qw.values()))
        scored = []
        for d, ws in w.items():
            dot = sum(ws.get(t, 0.0) * v for t, v in qw.items())
            if dot > 0 and norms[d] > 0 and qn > 0:
                scored.append((d, dot / (norms[d] * qn)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        out.extend((qi, d, s) for d, s in scored[:k])
    return out


def test_tfidf_topk_matches_pure_python(ray_session, docs_df):
    import ray.data as rd

    from imagededupx_ray.queries import ENSEMBLE_QUERIES
    from imagededupx_ray.stages.tfidf import tfidf_topk

    docs = rd.read_parquet(f"{SF}/documents.parquet").select_columns(
        ["doc_id", "text"]
    )
    got = tfidf_topk(docs, ENSEMBLE_QUERIES, k=10)
    want = _py_tfidf_topk(docs_df, ENSEMBLE_QUERIES, k=10)
    got_rows = list(zip(got.query_id, got.doc_id))
    want_rows = [(q, d) for q, d, _ in want]
    assert got_rows == want_rows
    for (_, _, s_want), s_got in zip(want, got.score):
        assert abs(s_want - s_got) < 1e-9


def test_ensemble_equals_manual_rrf(ray_session):
    """ensemble_search == RRF(bm25_topk, tfidf_topk) computed independently."""
    import ray.data as rd

    from imagededupx_ray.functions.fusion import reciprocal_rank_fusion
    from imagededupx_ray.queries import ENSEMBLE_QUERIES, ensemble_search
    from imagededupx_ray.stages.bm25 import bm25_topk
    from imagededupx_ray.stages.tfidf import tfidf_topk

    fused = ensemble_search(SF, k=10)
    docs = rd.read_parquet(f"{SF}/documents.parquet").select_columns(
        ["doc_id", "text"]
    )
    manual = reciprocal_rank_fusion(
        [bm25_topk(docs, ENSEMBLE_QUERIES, k=30), tfidf_topk(docs, ENSEMBLE_QUERIES, k=30)],
        k=10,
    )
    assert list(fused.query_id) == list(manual.query_id)
    assert list(fused.doc_id) == list(manual.doc_id)
    assert np.allclose(fused.score, manual.score.round(6))
    # both retrievers actually contribute: fused order differs from each alone
    assert len(fused) > 0 and fused.groupby("query_id").size().max() <= 10
