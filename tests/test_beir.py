"""BEIR-style loader + end-to-end retrieval eval (SURVEY.md §2.1 S9;
reference data_loader.py:14-125, benchmark_bm25.py:57-111)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def beir_dir(tmp_path_factory):
    """Tiny synthetic corpus/queries/qrels triple: each query's relevant doc
    shares its distinctive tokens, so BM25 must rank it first."""
    root = str(tmp_path_factory.mktemp("beir"))
    docs = [
        {"_id": "d1", "title": "alpha systems", "text": "alpha beta gamma pipeline"},
        {"_id": "d2", "title": "", "text": "delta epsilon zeta stream"},
        {"_id": "d3", "title": "noise", "text": "eta theta iota batch"},
        {"_id": "d4", "title": "", "text": "kappa lambda mu shuffle"},
        {"_id": "d5", "title": "filler", "text": "common words only here"},
    ]
    queries = [
        {"_id": "q1", "text": "alpha beta"},
        {"_id": "q2", "text": "delta epsilon"},
        {"_id": "q3", "text": "unjudged query"},  # no qrels: must be skipped
    ]
    with open(os.path.join(root, "corpus.jsonl"), "w") as f:
        f.writelines(json.dumps(d) + "\n" for d in docs)
    with open(os.path.join(root, "queries.jsonl"), "w") as f:
        f.writelines(json.dumps(q) + "\n" for q in queries)
    os.makedirs(os.path.join(root, "qrels"))
    with open(os.path.join(root, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t1\n")
        f.write("q2\td2\t1\n")
    return root


def test_load_triple(ray_session, beir_dir):
    from imagededupx_ray.sources import beir

    corpus = beir.load_corpus(beir_dir).to_pandas()
    assert len(corpus) == 5
    assert set(corpus.columns) == {"_id", "doc_id", "title", "text"}
    assert corpus["doc_id"].is_unique
    queries = beir.load_queries(beir_dir).to_pandas()
    assert len(queries) == 3
    qrels = beir.load_qrels_dict(beir_dir, "test")
    assert qrels == {"q1": {"d1": 1}, "q2": {"d2": 1}}


def test_beir_eval_end_to_end(ray_session, beir_dir):
    from imagededupx_ray.sources import beir

    m = beir.beir_eval(beir_dir, split="test", k=3)
    # each judged query's relevant doc is the unique token match -> rank 1
    assert m["n_queries"] == 2.0
    assert m["ndcg@k"] == 1.0
    assert m["mrr@k"] == 1.0
    assert m["recall@k"] == 1.0
    assert m["map@k"] == 1.0


def test_missing_files_raise(beir_dir):
    from imagededupx_ray.sources import beir

    with pytest.raises(ValueError, match="not present"):
        beir.load_corpus("/tmp/definitely_missing_beir")


def test_beir_eval_lsa_end_to_end(ray_session, beir_dir):
    """VERDICT r4 #5: the learned-LSA retriever runs through the same BEIR
    harness with the same output contract. On the tiny synthetic triple the
    metric only needs to be a valid recorded number; the committed
    bench_fixtures/beir quality (NDCG@10, recorded in BENCH) is the bar the
    next plugged-in encoder must beat."""
    from imagededupx_ray.sources import beir

    m = beir.beir_eval_lsa(beir_dir, split="test", k=3, dim=8, vocab=64)
    assert m["n_queries"] == 2.0
    assert 0.0 <= m["ndcg@k"] <= 1.0
    assert 0.0 <= m["recall@k"] <= 1.0
    assert set(m) == {"ndcg@k", "map@k", "recall@k", "mrr@k", "n_queries"}


def test_lsa_topk_contract(ray_session, beir_dir):
    """lsa_topk shares bm25_topk's output contract so retrievers swap."""
    from imagededupx_ray.sources import beir
    from imagededupx_ray.stages.lsa import lsa_topk

    docs, query_texts, _ = beir._eval_inputs(beir_dir, "test")
    out = lsa_topk(docs, query_texts, k=3, dim=8, vocab=64)
    assert list(out.columns) == ["query_id", "doc_id", "score", "rank"]
    assert (out.groupby("query_id")["rank"].min() == 1).all()
    assert (out.groupby("query_id").size() <= 3).all()
    # ranks are contiguous and scores non-increasing within a query
    for _, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 1e-9).all()
