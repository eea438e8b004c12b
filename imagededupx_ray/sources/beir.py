"""BEIR-style eval-corpus loader (SURVEY.md §2.1 S9 — the reference's
SearchDataLoader, /root/reference/similarities/similarities/data_loader.py:14-125,
itself following the public UKPLab/beir layout):

- ``corpus.jsonl``   — one json object per line: {_id, title, text}
- ``queries.jsonl``  — {_id, text}
- ``qrels/<split>.tsv`` — header + (query-id \\t corpus-id \\t score) rows

Re-expressed Ray-Data-first: each file becomes a streaming Dataset
(``read_json`` handles jsonl natively; qrels via ``read_csv`` with a tab
parser) instead of driver dicts, so a 100M-doc corpus never lands in one
process. ``load_qrels_dict`` intentionally returns a driver dict — qrels are
per-benchmark-query relevance labels, thousands of rows, the eval-metric
input shape. ``beir_eval`` wires loader → BM25 retrieval → IR metrics
end-to-end (reference benchmark_bm25.py:57-111)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd


def _check(path: str, ext: str) -> None:
    if not os.path.exists(path):
        raise ValueError(f"file {path} not present")
    if not path.endswith(ext):
        raise ValueError(f"file {path} must have extension {ext}")


def load_corpus(data_folder: str, corpus_file: str = "corpus.jsonl"):
    """corpus.jsonl → Dataset(_id: string, title: string, text: string),
    plus content-derived int64 ``doc_id`` for downstream joins."""
    path = os.path.join(data_folder, corpus_file)
    _check(path, "jsonl")

    def normalize(batch: pa.Table) -> pa.Table:
        from imagededupx_ray.stages.extract import _hash64_column

        names = set(batch.column_names)
        ids = batch["_id"].cast(pa.string())
        title = (
            batch["title"].cast(pa.string()) if "title" in names else pa.nulls(batch.num_rows, pa.string())
        )
        text = batch["text"].cast(pa.string())
        return pa.table(
            {
                "_id": ids,
                "doc_id": pa.array(_hash64_column(ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids), type=pa.int64()),
                "title": title,
                "text": text,
            }
        )

    return rd.read_json(path).map_batches(normalize, batch_format="pyarrow")


def load_queries(data_folder: str, query_file: str = "queries.jsonl"):
    """queries.jsonl → Dataset(_id: string, text: string)."""
    path = os.path.join(data_folder, query_file)
    _check(path, "jsonl")
    return rd.read_json(path).map_batches(
        lambda t: pa.table(
            {"_id": t["_id"].cast(pa.string()), "text": t["text"].cast(pa.string())}
        ),
        batch_format="pyarrow",
    )


def load_qrels(data_folder: str, split: str = "test", qrels_folder: str = "qrels"):
    """qrels/<split>.tsv → Dataset(query_id: string, corpus_id: string,
    score: int64). Header row skipped, like the reference (:117-125)."""
    path = os.path.join(data_folder, qrels_folder, f"{split}.tsv")
    _check(path, "tsv")
    ds = rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )

    def normalize(t: pa.Table) -> pa.Table:
        c = t.column_names
        return pa.table(
            {
                "query_id": t[c[0]].cast(pa.string()),
                "corpus_id": t[c[1]].cast(pa.string()),
                "score": t[c[2]].cast(pa.int64()),
            }
        )

    return ds.map_batches(normalize, batch_format="pyarrow")


def load_qrels_dict(data_folder: str, split: str = "test") -> dict[str, dict[str, int]]:
    """Driver-shaped qrels {query_id: {corpus_id: score}} — the eval-metric
    input (qrels are benchmark labels, thousands of rows by construction)."""
    out: dict[str, dict[str, int]] = {}
    for b in load_qrels(data_folder, split).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        for q, c, s in zip(
            b["query_id"].to_pylist(), b["corpus_id"].to_pylist(), b["score"].to_pylist()
        ):
            out.setdefault(q, {})[c] = int(s)
    return out


def _eval_inputs(data_folder: str, split: str):
    """Shared eval harness inputs: (docs Dataset with title+text concat,
    query texts, qrels keyed by query index over int64 doc ids)."""
    corpus = load_corpus(data_folder)

    def with_full_text(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        title = pc.fill_null(t["title"], "")
        joined = pc.binary_join_element_wise(title, t["text"], " ")
        return pa.table({"doc_id": t["doc_id"], "text": pc.utf8_trim_whitespace(joined)})

    docs = corpus.map_batches(with_full_text, batch_format="pyarrow").materialize()
    # string _id -> int64 doc_id mapping for qrels (corpus-derived, small per
    # eval benchmark; the retrieval itself stays distributed)
    id_map: dict[str, int] = {}
    for b in corpus.select_columns(["_id", "doc_id"]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        id_map.update(zip(b["_id"].to_pylist(), b["doc_id"].to_pylist()))

    queries_tbl = load_queries(data_folder).to_pandas()
    qrels = load_qrels_dict(data_folder, split)
    # only queries with qrels are evaluated (reference load(), :55-57)
    queries_tbl = queries_tbl[queries_tbl["_id"].isin(qrels)].reset_index(drop=True)
    qrels_int = {
        qi: {id_map[c] for c in qrels.get(qid, {}) if c in id_map}
        for qi, qid in enumerate(queries_tbl["_id"])
    }
    return docs, queries_tbl["text"].tolist(), qrels_int


def _metrics(results, qrels_int, k: int, n_queries: int) -> dict[str, float]:
    from imagededupx_ray.functions import evalmetrics as EM

    return {
        "ndcg@k": round(EM.ndcg_at_k(results, qrels_int, k), 6),
        "map@k": round(EM.map_at_k(results, qrels_int, k), 6),
        "recall@k": round(EM.recall_at_k(results, qrels_int, k), 6),
        "mrr@k": round(EM.mrr_at_k(results, qrels_int, k), 6),
        "n_queries": float(n_queries),
    }


def beir_eval(data_folder: str, split: str = "test", k: int = 10) -> dict[str, float]:
    """End-to-end: load triple → distributed BM25 top-k (title + text field
    concat, like the reference's corpus dict) → NDCG/MAP/Recall/MRR@k."""
    from imagededupx_ray.stages.bm25 import bm25_topk

    docs, query_texts, qrels_int = _eval_inputs(data_folder, split)
    results = bm25_topk(docs, query_texts, k=k)
    return _metrics(results, qrels_int, k, len(query_texts))


def beir_eval_lsa(
    data_folder: str,
    split: str = "test",
    k: int = 10,
    dim: int = 64,
    vocab: int = 2048,
) -> dict[str, float]:
    """Same harness with the learned LSA encoder as the retriever
    (stages/lsa.lsa_topk, identical output contract to bm25_topk) — the
    honest quality number the next (torch) encoder plugged into the
    stages/plugin.py seam must beat (VERDICT r4 #5)."""
    from imagededupx_ray.stages.lsa import lsa_topk

    docs, query_texts, qrels_int = _eval_inputs(data_folder, split)
    results = lsa_topk(docs, query_texts, k=k, dim=dim, vocab=vocab)
    return _metrics(results, qrels_int, k, len(query_texts))
