"""Score fusion over multiple retrieval/fingerprint verdicts
(SURVEY.md §2.10 — reference EnsembleSimilarity,
/root/reference/similarities/similarities/ensemble_similarity.py:27-170:
weighted score averaging and Reciprocal Rank Fusion with c=60).

Operates on small per-query result frames (query_id, doc_id, score) — fusion
happens after each retriever's distributed top-k, so inputs are k·queries
rows, never corpus-sized.
"""

from __future__ import annotations

import pandas as pd

RRF_C = 60  # reference default (ensemble_similarity.py RRF constant)


def weighted_fusion(
    results: list[pd.DataFrame], weights: list[float] | None = None, k: int = 10
) -> pd.DataFrame:
    """Weighted sum of (min-max normalized per query) scores across systems.
    Input frames: (query_id, doc_id, score). Ties break by doc_id."""
    if weights is None:
        weights = [1.0] * len(results)
    parts = []
    for df, w in zip(results, weights):
        df = df[["query_id", "doc_id", "score"]].copy()
        g = df.groupby("query_id")["score"]
        lo, hi = g.transform("min"), g.transform("max")
        rng = (hi - lo).replace(0, 1.0)
        df["score"] = (df["score"] - lo) / rng * w
        parts.append(df)
    allp = pd.concat(parts, ignore_index=True)
    fused = (
        allp.groupby(["query_id", "doc_id"], as_index=False)["score"].sum()
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    fused["rank"] = fused.groupby("query_id").cumcount() + 1
    return fused


def reciprocal_rank_fusion(
    results: list[pd.DataFrame], k: int = 10, c: int = RRF_C
) -> pd.DataFrame:
    """RRF: score(d) = Σ_systems 1/(c + rank_d) (public Cormack et al.
    formula; reference uses c=60). Input frames need (query_id, doc_id) in
    rank order or with a score column to rank by."""
    parts = []
    for df in results:
        df = df[["query_id", "doc_id"] + (["score"] if "score" in df else [])].copy()
        if "score" in df:
            df = df.sort_values(
                ["query_id", "score", "doc_id"], ascending=[True, False, True]
            )
        df["rank"] = df.groupby("query_id").cumcount() + 1
        df["rrf"] = 1.0 / (c + df["rank"])
        parts.append(df[["query_id", "doc_id", "rrf"]])
    allp = pd.concat(parts, ignore_index=True)
    fused = (
        allp.groupby(["query_id", "doc_id"], as_index=False)["rrf"].sum()
        .rename(columns={"rrf": "score"})
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    fused["rank"] = fused.groupby("query_id").cumcount() + 1
    return fused
