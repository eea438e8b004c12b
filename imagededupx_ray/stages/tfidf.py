"""TF-IDF retrieval over a document Dataset (SURVEY.md §2.2 M3 — the
reference's TfidfSimilarity, /root/reference/similarities/similarities/
literal_similarity.py TfidfSimilarity + utils/tfidf.py:63-71, rebuilt as
Ray stages).

Distributed dataflow — NO vocabulary-sized driver collect anywhere (the
reference loads its whole idf dict per process, utils/tfidf.py:27-47; a
round-2 version of this module still collected the full hashed-vocab df
table to the driver):

1. ``tfidf_postings``: (doc, term, tf) rows through ONE term-keyed coarse
   shuffle; every occurrence of a term lands in one partition, so df(t) is
   computed locally and ATTACHED to each posting row — the classic inverted
   index build. Materialized: this IS the index, reused by query-vector
   construction and scoring.
2. query vectors: idfs for the QUERY terms only, via a filtered scan of the
   postings restricted to the (tiny) broadcast query-term set — the
   bm25-style "only query terms reach the driver" pattern.
3. scoring: postings re-keyed by doc; each partition holds every term of
   its docs, so per-doc norms (over the FULL doc vector) and per-query dots
   compute locally; partial top-k per partition, tiny global reduce.

Weights w(d, t) = tf(d, t) · ln(N / df(t)); cosine scoring; ties break by
doc_id ascending (same contract as bm25_topk).
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


def count_docs_with_tokens(docs_ds) -> int:
    """N for the idf: docs with at least one token (narrow distributed
    count)."""
    return int(
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


def tfidf_postings(docs_ds, num_partitions: int | None = None):
    """docs → materialized posting rows (d, t, tf, df): one term-keyed
    coarse-partition shuffle, df computed inside each partition (all
    occurrences of a term co-locate) and attached per row."""
    from imagededupx_ray.stages.lsh import _pow2
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        g = _tok_tf(batch)
        t = g["t"].to_numpy().astype(np.int64)
        part = (H.splitmix64(t.view(np.uint64)) & np.uint64(p - 1)).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(part, type=pa.int32()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64), type=pa.int64()),
                "t": pa.array(t, type=pa.int64()),
                "tf": pa.array(g["tf"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    def attach_df(t: pa.Table) -> pa.Table:
        terms = t["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv, counts = np.unique(terms, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "d": t["d"],
                "t": t["t"],
                "tf": t["tf"],
                "df": pa.array(counts[inv].astype(np.int64), type=pa.int64()),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(attach_df, batch_format="pyarrow")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )


def query_term_idfs(postings, q_terms: np.ndarray, n_docs: float) -> tuple[np.ndarray, np.ndarray]:
    """(sorted query terms, idf per term) — one scan of the postings
    restricted to the broadcast query-term set; only query terms' dfs reach
    the driver (terms unseen in the corpus get idf 0)."""
    q_sorted = np.unique(q_terms.astype(np.int64))
    ref = ray.put(q_sorted)

    def pick(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        terms = t["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(want) == 0:
            sel = np.zeros(len(terms), dtype=bool)
        else:
            pos = np.searchsorted(want, terms)
            pos[pos >= len(want)] = 0
            sel = want[pos] == terms
        tt, idx = np.unique(terms[sel], return_index=True)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)[sel][idx]
        return pa.table(
            {"t": pa.array(tt, type=pa.int64()), "df": pa.array(dfv, type=pa.int64())}
        )

    got: dict[int, int] = {}
    for b in postings.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        got.update(zip(b["t"].to_pylist(), b["df"].to_pylist()))
    idf = np.zeros(len(q_sorted), dtype=np.float64)
    for i, term in enumerate(q_sorted.tolist()):
        if term in got:
            idf[i] = np.log(n_docs / got[term])
    return q_sorted, idf


def _score_partitions(
    postings,
    q_pack,
    n_docs: float,
    k: int,
    num_partitions=None,
    candidates: str = "positive",
):
    """postings re-keyed by doc → per-partition scoring of every query
    against every doc (full-vocab norms local to the partition), partial
    top-k per partition. q_pack = list of (q_key, sorted q terms, weights,
    norm). ``candidates``: "positive" keeps docs with score > 0 (string
    queries); "share_excl_self" keeps docs sharing ≥1 token with the query
    and excludes the query doc itself (the SQL twin's join semantics —
    zero-score sharers stay rankable)."""
    from imagededupx_ray.stages.lsh import _pow2
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    state = ray.put(q_pack)

    def rekey(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (H.splitmix64(d.view(np.uint64)) & np.uint64(p - 1)).astype(np.int32)
        return pa.table(
            {"_part": pa.array(part, type=pa.int32()), "d": t["d"], "t": t["t"],
             "tf": t["tf"], "df": t["df"]}
        )

    def score(tbl: pa.Table) -> pa.Table:
        packs = ray.get(state)
        d = tbl["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = tbl["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((t, d))
        d, t = d[order], t[order]
        wt = tf[order] * np.log(n_docs / df[order])
        uniq_d, seg_starts = np.unique(d, return_index=True)
        norms = np.sqrt(np.add.reduceat(wt * wt, seg_starts)) if len(d) else np.empty(0)
        oq, od, os_ = [], [], []
        for q_key, q_t, q_w, q_norm in packs:
            if len(q_t) == 0 or q_norm == 0 or len(d) == 0:
                continue
            qpos = np.searchsorted(q_t, t)
            qpos[qpos >= len(q_t)] = 0
            hit = q_t[qpos] == t
            prod = np.where(hit, wt * q_w[qpos], 0.0)
            dots = np.add.reduceat(prod, seg_starts)
            cos = np.where(
                norms > 0, dots / (np.maximum(norms, 1e-300) * q_norm), 0.0
            )
            if candidates == "share_excl_self":
                shares = np.add.reduceat(hit.astype(np.int64), seg_starts) > 0
                cand = shares & (uniq_d != q_key)
            else:
                cand = cos > 0
            if not cand.any():
                continue
            nid = uniq_d[cand]
            cc = cos[cand]
            top = np.lexsort((nid, -cc))[:k]
            oq.append(np.full(len(top), q_key, dtype=np.int64))
            od.append(nid[top])
            os_.append(cc[top])
        if not oq:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(oq), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(od), type=pa.int64()),
                "score": pa.array(np.concatenate(os_), type=pa.float64()),
            }
        )

    return (
        postings.map_batches(rekey, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(score, batch_format="pyarrow")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .to_pandas()
    )


def tfidf_topk(docs_ds, queries: list[str], k: int = 10) -> pd.DataFrame:
    """Top-k tfidf-cosine docs per query string. Returns (query_id, doc_id,
    score, rank); ties break by doc_id ascending (same contract as
    bm25_topk)."""
    docs_ds = docs_ds.select_columns(["doc_id", "text"])
    postings = tfidf_postings(docs_ds)
    n_docs = float(count_docs_with_tokens(docs_ds))

    # union of all query terms → one idf lookup scan
    per_q: list[tuple[np.ndarray, np.ndarray]] = []
    for q in queries:
        flat, _ = tokenize_batch(pa.array([q], type=pa.string()))
        th = H.token_hash_flat(flat).astype(np.int64)
        ts, tf = (np.unique(th, return_counts=True)) if len(th) else (np.empty(0, np.int64), np.empty(0, np.int64))
        per_q.append((ts, tf))
    all_terms = (
        np.unique(np.concatenate([ts for ts, _ in per_q if len(ts)]))
        if any(len(ts) for ts, _ in per_q)
        else np.empty(0, np.int64)
    )
    terms_sorted, idfs = query_term_idfs(postings, all_terms, n_docs)
    q_pack = []
    for qi, (ts, tf) in enumerate(per_q):
        if len(ts) == 0:
            q_pack.append((qi, ts, np.empty(0, np.float64), 0.0))
            continue
        pos = np.searchsorted(terms_sorted, ts)
        w = tf.astype(np.float64) * idfs[pos]
        q_pack.append((qi, ts, w, float(np.sqrt((w**2).sum()))))

    parts = _score_partitions(postings, q_pack, n_docs, k)
    out = (
        parts.sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
