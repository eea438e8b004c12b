"""IR evaluation aggregates (SURVEY.md §2.5 G8 — the reference's
evaluation.py:10-122 MRR / Recall@k / Accuracy@k / NDCG@k / MAP@k, standard
public formulas, computed over small result frames without pytrec_eval)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _per_query(results: pd.DataFrame, qrels: dict[int, set[int]], k: int):
    """Yield (query_id, ranked doc list truncated to k, relevant set)."""
    for qid, grp in results.sort_values(["query_id", "rank"]).groupby("query_id"):
        yield qid, grp["doc_id"].tolist()[:k], qrels.get(qid, set())


def mrr_at_k(results: pd.DataFrame, qrels: dict[int, set[int]], k: int = 10) -> float:
    """Mean reciprocal rank of the first relevant hit (evaluation.py mrr)."""
    vals = []
    for _, docs, rel in _per_query(results, qrels, k):
        rr = 0.0
        for i, d in enumerate(docs):
            if d in rel:
                rr = 1.0 / (i + 1)
                break
        vals.append(rr)
    return float(np.mean(vals)) if vals else 0.0


def recall_at_k(results: pd.DataFrame, qrels: dict[int, set[int]], k: int = 10) -> float:
    vals = [
        len(set(docs) & rel) / len(rel)
        for _, docs, rel in _per_query(results, qrels, k)
        if rel
    ]
    return float(np.mean(vals)) if vals else 0.0


def accuracy_at_k(results: pd.DataFrame, qrels: dict[int, set[int]], k: int = 10) -> float:
    """Fraction of queries with >= 1 relevant doc in the top k (Acc@k)."""
    vals = [1.0 if set(docs) & rel else 0.0 for _, docs, rel in _per_query(results, qrels, k)]
    return float(np.mean(vals)) if vals else 0.0


def ndcg_at_k(results: pd.DataFrame, qrels: dict[int, set[int]], k: int = 10) -> float:
    """Binary-gain NDCG@k."""
    vals = []
    for _, docs, rel in _per_query(results, qrels, k):
        gains = np.array([1.0 if d in rel else 0.0 for d in docs])
        disc = 1.0 / np.log2(np.arange(2, len(gains) + 2))
        dcg = float((gains * disc).sum())
        ideal_n = min(len(rel), k)
        idcg = float(disc[:ideal_n].sum()) if ideal_n else 0.0
        vals.append(dcg / idcg if idcg else 0.0)
    return float(np.mean(vals)) if vals else 0.0


def map_at_k(results: pd.DataFrame, qrels: dict[int, set[int]], k: int = 10) -> float:
    """Mean average precision at k (binary relevance)."""
    vals = []
    for _, docs, rel in _per_query(results, qrels, k):
        hits = 0
        precs = []
        for i, d in enumerate(docs):
            if d in rel:
                hits += 1
                precs.append(hits / (i + 1))
        denom = min(len(rel), k)
        vals.append(sum(precs) / denom if denom else 0.0)
    return float(np.mean(vals)) if vals else 0.0
