"""BM25 (Okapi) retrieval over a document Dataset (SURVEY.md §2.3 A3, §2.5
G6, §2.6 O4).

Reference analogue: ``utils/rank_bm25.py`` (BM25Okapi: k1=1.5, b=0.75,
epsilon=0.25; idf = ln((N - n + 0.5)/(n + 0.5)) with the epsilon floor for
negative idfs, :78-98) — rebuilt as two Ray stages instead of an in-RAM
rebuild-on-every-insert index (the reference rebuilds the whole index on each
``add_corpus``, literal_similarity.py:404-414):

1. ``bm25_stats``: distributed corpus statistics — distinct (term, doc)
   explode → narrow ``groupby(term).count()`` doc frequencies + global doc
   count/avgdl. Only the QUERY terms' frequencies are pulled to the driver.
2. ``bm25_score_topk``: broadcast the per-query idf tables; one vectorized
   pass over doc batches computes every query's score against every doc
   (term-hash membership via searchsorted); partial top-k per batch, tiny
   global reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions.text import tokenize_batch

K1 = 1.5
B = 0.75
EPSILON = 0.25


def _doc_freq_and_sizes(docs_ds, terms: np.ndarray | None = None):
    """(term doc-frequency Dataset(term:int64, df:int64), n_docs, avgdl).

    With ``terms`` (sorted unique int64 hashes — the QUERY vocabulary), the
    explode keeps only those terms BEFORE the df count, so the exchange
    carries |query terms| x |matching docs| rows instead of the corpus's
    full distinct (term, doc) postings, and the count runs through the
    shuffle-free partial-groupby (identical df values for the kept terms —
    BM25 needs no other corpus statistics, unlike TF-IDF's full-vector doc
    norms). ``terms=None`` keeps the full-index behavior."""
    from imagededupx_ray.util import partial_groupby

    terms_ref = ray.put(np.sort(np.unique(terms)).astype(np.int64)) if (
        terms is not None and len(terms)
    ) else None

    if terms_ref is not None:
        # ONE tokenize pass computes both the query-term df partials and the
        # doc-count/length partials: per batch, df of each query term within
        # the batch (distinct docs containing it) + one summary row keyed
        # term = i (i >= n_terms) carrying (n_docs, sum_dl). Fixed-width
        # per-batch output -> shuffle-free fanout combine, no postings
        # exchange at all.
        def stats_partial(batch: pa.Table) -> pa.Table:
            want = ray.get(terms_ref)
            flat, offsets = tokenize_batch(batch["text"])
            th = H.token_hash_flat(flat).astype(np.int64)
            n_tok = np.diff(offsets)
            doc_idx = np.repeat(np.arange(batch.num_rows), n_tok)
            pos = np.searchsorted(want, th)
            pos[pos >= len(want)] = 0
            hit = want[pos] == th
            # distinct (term, doc) within batch
            key = pos[hit] * np.int64(batch.num_rows) + doc_idx[hit]
            dfc = np.zeros(len(want), dtype=np.int64)
            if len(key):
                uk = np.unique(key)
                np.add.at(dfc, (uk // batch.num_rows).astype(np.int64), 1)
            idx = np.arange(len(want) + 1, dtype=np.int64)
            vals = np.concatenate([dfc, [int(n_tok.sum())]])
            ndoc = np.concatenate(
                [np.zeros(len(want), dtype=np.int64), [batch.num_rows]]
            )
            return pa.table(
                {
                    "i": pa.array(idx, type=pa.int64()),
                    "v": pa.array(vals, type=pa.int64()),
                    "nd": pa.array(ndoc, type=pa.int64()),
                }
            )

        agg = partial_groupby(
            docs_ds.map_batches(stats_partial, batch_format="pyarrow"),
            ["i"],
            [("sum", "v", "v"), ("sum", "nd", "nd")],
        ).to_pandas().sort_values("i").reset_index(drop=True)
        want = ray.get(terms_ref)
        n_docs = int(agg["nd"].iloc[-1])
        sum_dl = int(agg["v"].iloc[-1])
        avgdl = sum_dl / max(n_docs, 1)
        import ray.data as rd

        df_tbl = pa.table(
            {
                "term": pa.array(want, type=pa.int64()),
                "df": pa.array(
                    agg["v"].to_numpy()[: len(want)].astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )
        return rd.from_arrow(df_tbl), n_docs, float(avgdl)

    def explode(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        th = H.token_hash_flat(flat)
        n_tok = np.diff(offsets)
        d = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), n_tok
        )
        df = pd.DataFrame({"d": d, "t": th}).drop_duplicates()
        return pa.table(
            {
                "term": pa.array(df["t"].to_numpy().astype(np.int64), type=pa.int64()),
                "doc_id": pa.array(df["d"].to_numpy(), type=pa.int64()),
            }
        )

    def lens(batch: pa.Table) -> pa.Table:
        _, offsets = tokenize_batch(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dl": pa.array(np.diff(offsets), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    tf = docs_ds.map_batches(explode, batch_format="pyarrow")
    df_ds = tf.groupby("term").aggregate(Count(alias_name="df"))
    len_tbl = partial_groupby(
        docs_ds.map_batches(lens, batch_format="pyarrow"),
        [],
        [("count", "", "n"), ("mean", "dl", "avgdl")],
    ).to_pandas()
    return df_ds, int(len_tbl["n"].iloc[0]), float(len_tbl["avgdl"].iloc[0])


def _idf_for_terms(df_ds, term_hashes: np.ndarray, n_docs: int) -> dict[int, float]:
    """Okapi idf with epsilon floor, for the query terms only. The floor's
    average is over the QUERY terms' positive idfs (the reference averages
    over its whole vocabulary — equivalent contract as long as the oracle
    uses the same definition)."""
    want = np.unique(term_hashes.astype(np.int64))
    want_ref = ray.put(want)

    def pick(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        terms = t["term"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(w, terms)
        pos[pos >= len(w)] = 0
        return t.filter(pa.array(w[pos] == terms))

    hits = df_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    dfs = dict(zip(hits["term"], hits["df"]))
    raw = {
        int(t): float(np.log((n_docs - dfs.get(int(t), 0) + 0.5) / (dfs.get(int(t), 0) + 0.5)))
        for t in want
    }
    pos_vals = [v for v in raw.values() if v > 0]
    floor = EPSILON * (sum(pos_vals) / len(pos_vals)) if pos_vals else EPSILON
    return {t: (v if v > 0 else floor) for t, v in raw.items()}


def bm25_topk(
    docs_ds, queries: list[str], k: int = 10
) -> pd.DataFrame:
    """Top-k BM25 per query. Returns (query_id, doc_id, score, rank); ties
    broken by doc_id ascending — deterministic where the reference depends on
    argsort stability (rank_bm25.py:62-68)."""
    q_tokens = []
    for q in queries:
        flat, _ = tokenize_batch(pa.array([q], type=pa.string()))
        q_tokens.append(H.token_hash_flat(flat).astype(np.int64))
    all_terms = (
        np.unique(np.concatenate(q_tokens)) if q_tokens else np.empty(0, np.int64)
    )
    df_ds, n_docs, avgdl = _doc_freq_and_sizes(docs_ds, terms=all_terms)
    idf = _idf_for_terms(df_ds, all_terms, n_docs)

    # per-query aligned (sorted term hashes, idf weights)
    q_pack = []
    for toks in q_tokens:
        ts = np.sort(np.unique(toks))
        # term frequency IN THE QUERY multiplies the per-occurrence score
        tf_q = np.array([int((toks == t).sum()) for t in ts], dtype=np.float64)
        w = np.array([idf[int(t)] for t in ts], dtype=np.float64) * tf_q
        q_pack.append((ts, w))
    state = ray.put((q_pack, float(avgdl)))

    def score_batch(batch: pa.Table) -> pa.Table:
        packs, avg = ray.get(state)
        flat, offsets = tokenize_batch(batch["text"])
        th = H.token_hash_flat(flat).astype(np.int64)
        dl = np.diff(offsets).astype(np.float64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        denom_norm = K1 * (1.0 - B + B * dl / avg)  # per doc
        oq, od, os_ = [], [], []
        for qi, (ts, w) in enumerate(packs):
            if len(ts) == 0:
                continue
            # term frequency per (doc, query-term): count matches of each
            # token hash against the sorted query terms, vectorized
            pos = np.searchsorted(ts, th)
            pos[pos >= len(ts)] = 0
            hit = ts[pos] == th
            doc_idx = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
            f = np.zeros((batch.num_rows, len(ts)), dtype=np.float64)
            np.add.at(f, (doc_idx[hit], pos[hit]), 1.0)
            score = (
                (f * (K1 + 1.0)) / (f + denom_norm[:, None]) * w[None, :]
            ).sum(axis=1)
            top = np.argsort(score)[::-1][:k]
            top = top[score[top] > 0]
            oq.append(np.full(len(top), qi, dtype=np.int64))
            od.append(ids[top])
            os_.append(score[top])
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
        parts.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True]
        )
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
