"""TF-IDF retrieval over a document Dataset (SURVEY.md §2.2 M3 — the
reference's TfidfSimilarity, /root/reference/similarities/similarities/
literal_similarity.py TfidfSimilarity + utils/tfidf.py:63-71, rebuilt as two
Ray stages):

1. vocabulary document frequencies: distinct (term, doc) explode → coarse
   int-key groupby → vocab-bounded broadcast (hashed terms, no strings).
2. scoring: one vectorized pass over doc batches computes cosine(query
   tfidf, doc tfidf) for every query with partial top-k per batch.

Weights w(d, t) = tf(d, t) · ln(N / df(t)); doc norms over the FULL doc
vector (so the broadcast carries the whole hashed vocabulary — the standard
trade: vocab is heavy-tailed and hash-bounded, documents are not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions.text import tokenize_batch


def _tok_tf(batch: pa.Table) -> pd.DataFrame:
    """(doc, token-hash, tf) rows for a batch, sorted by (doc, token)."""
    flat, offsets = tokenize_batch(batch["text"])
    th = H.token_hash_flat(flat).astype(np.int64)
    n_tok = np.diff(offsets)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = np.repeat(ids, n_tok)
    g = pd.DataFrame({"d": d, "t": th}).groupby(["d", "t"]).size().reset_index()
    g.columns = ["d", "t", "tf"]
    return g


def build_df_broadcast(docs_ds):
    """→ (ObjectRef[(sorted term hashes, df float64)], n_docs_with_tokens)."""

    def distinct_tokens(batch: pa.Table) -> pa.Table:
        g = _tok_tf(batch)
        return pa.table(
            {
                "_part": pa.array((g["t"].to_numpy() & 63).astype(np.int32), type=pa.int32()),
                "t": pa.array(g["t"].to_numpy(), type=pa.int64()),
            }
        )

    def df_count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("t").size().reset_index()
        g.columns = ["t", "df"]
        return g

    df_tbl = (
        docs_ds.map_batches(distinct_tokens, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(df_count, batch_format="pandas")
        .to_pandas()
    )
    t = df_tbl["t"].to_numpy().astype(np.int64)
    order = np.argsort(t)
    n_docs = (
        docs_ds.map_batches(
            lambda t_: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.cast(
                                        pc.not_equal(
                                            pc.utf8_trim_whitespace(t_["text"]), ""
                                        ),
                                        pa.int64(),
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["n"]
        .sum()
    )
    ref = ray.put(
        (t[order], df_tbl["df"].to_numpy().astype(np.float64)[order], float(n_docs))
    )
    return ref, int(n_docs)


def query_vector(q: str, df_ref) -> tuple[np.ndarray, np.ndarray, float]:
    """Query string → (sorted term hashes, weights, norm). Terms unseen in
    the corpus get idf 0 (df treated as N — they cannot match anyway)."""
    toks_sorted, dfs_sorted, N = ray.get(df_ref)
    flat, _ = tokenize_batch(pa.array([q], type=pa.string()))
    th = H.token_hash_flat(flat).astype(np.int64)
    if len(th) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), 0.0
    ts, tf = np.unique(th, return_counts=True)
    pos = np.searchsorted(toks_sorted, ts)
    pos[pos >= max(len(toks_sorted), 1)] = 0
    known = len(toks_sorted) > 0
    hit = toks_sorted[pos] == ts if known else np.zeros(len(ts), bool)
    idf = np.zeros(len(ts))
    idf[hit] = np.log(N / dfs_sorted[pos[hit]])
    w = tf.astype(np.float64) * idf
    norm = float(np.sqrt((w**2).sum()))
    return ts, w, norm


def tfidf_topk(docs_ds, queries: list[str], k: int = 10) -> pd.DataFrame:
    """Top-k tfidf-cosine docs per query string. Returns (query_id, doc_id,
    score, rank); ties break by doc_id ascending (same contract as
    bm25_topk)."""
    docs_ds = docs_ds.select_columns(["doc_id", "text"])
    df_ref, _ = build_df_broadcast(docs_ds)
    q_pack = [query_vector(q, df_ref) for q in queries]
    state = ray.put(q_pack)

    def score_batch(batch: pa.Table) -> pa.Table:
        packs = ray.get(state)
        toks_sorted, dfs_sorted, N = ray.get(df_ref)
        g = _tok_tf(batch)
        oq, od, os_ = [], [], []
        if len(g):
            d = g["d"].to_numpy().astype(np.int64)
            t = g["t"].to_numpy().astype(np.int64)
            pos = np.searchsorted(toks_sorted, t)
            wt = g["tf"].to_numpy().astype(np.float64) * np.log(N / dfs_sorted[pos])
            uniq_d, seg_starts = np.unique(d, return_index=True)
            norms = np.sqrt(np.add.reduceat(wt * wt, seg_starts))
            for qi, (q_t, q_w, q_norm) in enumerate(packs):
                if len(q_t) == 0 or q_norm == 0:
                    continue
                qpos = np.searchsorted(q_t, t)
                qpos[qpos >= len(q_t)] = 0
                hit = q_t[qpos] == t
                prod = np.where(hit, wt * q_w[qpos], 0.0)
                dots = np.add.reduceat(prod, seg_starts)
                cos = np.where(norms > 0, dots / (np.maximum(norms, 1e-300) * q_norm), 0.0)
                top = np.lexsort((uniq_d, -cos))[:k]
                top = top[cos[top] > 0]
                oq.append(np.full(len(top), qi, dtype=np.int64))
                od.append(uniq_d[top])
                os_.append(cos[top])
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(oq) if oq else np.empty(0, np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(
                    np.concatenate(od) if od else np.empty(0, np.int64), type=pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(os_) if os_ else np.empty(0, np.float64),
                    type=pa.float64(),
                ),
            }
        )

    parts = docs_ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
