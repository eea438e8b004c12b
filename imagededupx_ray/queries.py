"""Driver-contract query registry: every operator family from SURVEY.md §2
exposed as a callable over the driver's testdata tables, with (where the
semantics are SQL-expressible) a DuckDB oracle twin in ``ORACLE_SQL``.

Column names and rounding are part of the contract: the driver sorts columns
by name and value-hashes both sides, so every computed column is named
identically here and in the SQL, floats are rounded to fixed decimals on both
sides (computed in float64 on both sides), and timestamps are emitted as epoch
integers.

Reference analogues are cited per query; the dedup-family queries (minhash /
simhash / LSH / clusters) have no SQL twin — DuckDB cannot reproduce
blake2b-based signatures — and get the driver's rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from imagededupx_ray.config import DEFAULT_CONFIG, DedupConfig
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions.text import tokenize_batch


def _read(sf_dir: str, table: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/{table}.parquet")


def _round_col(arr: np.ndarray, nd: int) -> pa.Array:
    """Half-AWAY-from-zero rounding (DuckDB ROUND semantics; numpy's default
    np.round is banker's rounding and would hash-mismatch the oracle on ties)."""
    x = arr.astype(np.float64)
    p = 10.0 ** nd
    return pa.array(np.copysign(np.floor(np.abs(x) * p + 0.5) / p, x), type=pa.float64())


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _coarse_parts() -> int:
    """Power-of-two coarse-partition count for keyed-window operators (same
    discipline as stages/lsh.py: group on ``hash(key) & (P-1)``, never on the
    raw unbounded key — one Python call per PARTITION, not per key)."""
    from imagededupx_ray.util import suggest_num_partitions

    return _pow2(suggest_num_partitions(per_cpu=2))


# above this many dimension rows the worker-assembled broadcast stops being
# "small side" territory (the packed (keys, vals) object is shipped to every
# map task) and _attach_dim flips to the Q5-style coarse-partition union
# exchange, where no single process ever holds the whole dimension
DIM_BROADCAST_MAX_ROWS = 2_000_000

_KV_TREE_FANOUT = 16


@ray.remote
def _pack_kv_blocks(key_name: str, val_name: str, *tables):
    """Pack a GROUP of dimension blocks into one (sorted keys, vals) pair —
    worker-side, so the driver never collects the dimension rows."""
    import numpy as _np

    ks, vs = [], []
    for t in tables:
        if t.num_rows == 0 or key_name not in t.column_names:
            continue
        ks.append(t[key_name].to_numpy(zero_copy_only=False).astype(_np.int64))
        vs.append(t[val_name].to_numpy(zero_copy_only=False))
    if not ks:
        return (_np.empty(0, _np.int64), _np.empty(0, object))
    k = _np.concatenate(ks)
    v = _np.concatenate(vs)
    o = _np.argsort(k, kind="stable")
    return (k[o], v[o])


@ray.remote
def _merge_kv(*pairs):
    import numpy as _np

    pairs = [p_ for p_ in pairs if len(p_[0])]
    if not pairs:
        return (_np.empty(0, _np.int64), _np.empty(0, object))
    if len(pairs) == 1:
        return pairs[0]
    k = _np.concatenate([p_[0] for p_ in pairs])
    v = _np.concatenate([p_[1] for p_ in pairs])
    o = _np.argsort(k, kind="stable")
    return (k[o], v[o])


def _attach_dim(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    dim_val: str,
    out_val: str,
    max_broadcast_rows: int | None = None,
):
    """Inner-join ONE dimension column onto a fact Dataset by int64 key
    (unique dimension keys assumed — TPC-H primary keys).

    Small dimension (≤ ``max_broadcast_rows``, default
    ``DIM_BROADCAST_MAX_ROWS``): the dimension packs worker-side into one
    sorted (keys, vals) broadcast through a fanout-bounded task tree — the
    driver holds only an ObjectRef, never the rows (VERDICT r4 #6 replaced
    the full ``.to_pandas()`` driver collect). Large dimension: both sides
    run the Q5 coarse-partition union exchange, so no single process ever
    materializes the dimension."""
    if max_broadcast_rows is None:
        max_broadcast_rows = DIM_BROADCAST_MAX_ROWS
    dim_narrow = dim_ds.select_columns([dim_key, dim_val])
    dsch = dim_narrow.schema()  # ray Schema: .names / .types (arrow types)
    val_type = dict(zip(dsch.names, dsch.types))[dim_val]
    n_dim = dim_narrow.count()

    if n_dim <= max_broadcast_rows:
        from imagededupx_ray.util import block_group_size

        refs = dim_narrow.to_arrow_refs()
        g = max(block_group_size(len(refs)), 2)
        packed = [
            _pack_kv_blocks.remote(dim_key, dim_val, *refs[i : i + g])
            for i in range(0, len(refs), g)
        ]
        while len(packed) > 1:
            packed = [
                _merge_kv.remote(*packed[i : i + _KV_TREE_FANOUT])
                for i in range(0, len(packed), _KV_TREE_FANOUT)
            ]
        state = packed[0]

        def attach(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(state)
            fk = t[fact_key].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(keys, fk)
            pos[pos >= len(keys)] = 0
            hit = keys[pos] == fk if len(keys) else np.zeros(len(fk), bool)
            out = t.filter(pa.array(hit))
            return out.append_column(
                out_val, pa.array(list(vals[pos[hit]]), type=val_type)
            )

        return fact_ds.map_batches(attach, batch_format="pyarrow")

    # exchange path: union fact and dim rows under one schema keyed by
    # hash(key) & (p-1); each partition sorts its dim rows once and
    # searchsorted-attaches the value to its fact rows
    p = _coarse_parts()
    fact_schema = fact_ds.schema()
    fact_cols = list(fact_schema.names)
    fact_types = dict(zip(fact_schema.names, fact_schema.types))

    def fact_rows(t: pa.Table) -> pa.Table:
        fk = t[fact_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"_part": _coarse_part_col(fk, p), "_k": pa.array(fk, type=pa.int64()),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8))}
        for c in fact_cols:
            cols[c] = t[c]
        cols[out_val] = pa.nulls(t.num_rows, val_type)
        return pa.table(cols)

    def dim_rows(t: pa.Table) -> pa.Table:
        dk = t[dim_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"_part": _coarse_part_col(dk, p), "_k": pa.array(dk, type=pa.int64()),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8))}
        for c in fact_cols:
            cols[c] = pa.nulls(t.num_rows, fact_types[c])
        cols[out_val] = t[dim_val]
        return pa.table(cols)

    out_schema = pa.schema(
        [(c, fact_types[c]) for c in fact_cols] + [(out_val, val_type)]
    )

    def join_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        side = t["_side"].to_numpy(zero_copy_only=False)
        k = t["_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        dm = side == 0
        dk = k[dm]
        dv = t[out_val].to_numpy(zero_copy_only=False)[dm]
        o = np.argsort(dk, kind="stable")
        dk, dv = dk[o], dv[o]
        fm = np.flatnonzero(~dm)
        fk = k[fm]
        if len(dk) == 0 or len(fk) == 0:
            return out_schema.empty_table()
        pos = np.searchsorted(dk, fk)
        pos[pos >= len(dk)] = 0
        hit = dk[pos] == fk
        sel = t.take(pa.array(fm[hit]))
        cols = {c: sel[c] for c in fact_cols}
        cols[out_val] = pa.array(list(dv[pos[hit]]), type=val_type)
        return pa.table(cols, schema=out_schema)

    union = fact_ds.map_batches(fact_rows, batch_format="pyarrow").union(
        dim_ds.select_columns([dim_key, dim_val]).map_batches(
            dim_rows, batch_format="pyarrow"
        )
    )
    return union.groupby("_part").map_groups(join_part, batch_format="pyarrow")


def _coarse_part_col(key: np.ndarray, p: int) -> pa.Array:
    """int32 shuffle key ``splitmix64(key) & (p-1)`` for a coarse groupby."""
    part = (H.splitmix64(key.astype(np.uint64)).astype(np.int64) & np.int64(p - 1)).astype(
        np.int32
    )
    return pa.array(part, type=pa.int32())


# segmented searchsorted lives in util (shared with stages/setjoin.py)
from imagededupx_ray.util import seg_searchsorted_right as _seg_searchsorted_right  # noqa: E402


# shuffle-free small-cardinality groupby (shared with the stages)
from imagededupx_ray.util import partial_groupby as _partial_groupby  # noqa: E402


# --------------------------------------------------------------------------
# documents family (text analysis / dedup-adjacent, SURVEY.md §2.5 G5, §2.2)
# --------------------------------------------------------------------------

def docs_lang_counts(sf_dir: str):
    """Per (lang, source): doc count + mean n_chars (shuffle-free
    partial-groupby — the (lang, source) domain is tiny and fixed;
    reference analogue: corpus stats G7, improved_faiss_detector.py:399-405)."""
    ds = _partial_groupby(
        _read(sf_dir, "documents").select_columns(["lang", "source", "n_chars"]),
        ["lang", "source"],
        [("count", "", "n_docs"), ("mean", "n_chars", "avg_chars")],
    )
    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("avg_chars"),
            "avg_chars",
            _round_col(t["avg_chars"].to_numpy(zero_copy_only=False), 6),
        ),
        batch_format="pyarrow",
    )


def docs_exact_dedup(sf_dir: str):
    """Exact-dedup winner map keyed by full text: canonical = min(doc_id)
    (G5/M9; reference value-dedup literal_similarity.py:66-74)."""
    from ray.data.aggregate import Count, Min

    return (
        _read(sf_dir, "documents")
        .select_columns(["text", "doc_id"])
        .groupby("text")
        .aggregate(
            Min("doc_id", alias_name="canonical_doc_id"),
            Count(alias_name="n_exact_dups"),
        )
    )


def docs_token_stats(sf_dir: str):
    """Per doc: token count + distinct token count over lowercased
    whitespace tokens (M4 tokenizer; token counting for training-data prep)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        n_tok = np.diff(offsets)
        doc_idx = np.repeat(np.arange(batch.num_rows), n_tok)
        df = pd.DataFrame({"d": doc_idx, "t": flat.to_pandas()})
        uniq = df.drop_duplicates().groupby("d").size()
        n_uniq = np.zeros(batch.num_rows, dtype=np.int64)
        n_uniq[uniq.index.to_numpy()] = uniq.to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_unique_tokens": pa.array(n_uniq, type=pa.int64()),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


_BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Corpus size where the subquadratic prefix-filter set-similarity join
# (stages/setjoin.py) overtakes the exhaustive tiled miner: the tiled path
# has 4 fixed shuffles but O(n^2) compute; the prefix join has ~7 exchanges
# of candidate-bounded volume. Measured crossover on this box (t=0.8,
# q=16 count filter): 500 docs tiled 4.3 s vs prefix ~9 s; 5,000 docs
# tiled 10.9 s vs prefix 12.2 s with the prefix path flat-lining while
# tiled grows O(n^2) — see BASELINE.md "set-similarity join" note.
_SETJOIN_AUTO_DOCS = 5_000


def docs_bpe_token_counts(sf_dir: str):
    """BPE-ish token counting for training-data budgeting: runs of letters,
    single digits, and single punctuation marks (the GPT-2 pre-tokenizer's
    coarse shape) — counted with Arrow's RE2 kernel, which matches DuckDB's
    RE2 exactly, so this is a hash-gated twin (token counting op of the
    large-scale curation stack; whitespace variant = docs_token_stats)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern=_BPE_PATTERN)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": n.cast(pa.int64()),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


def docs_top_longest(sf_dir: str):
    """Top-20 docs by n_chars (O1 sort+limit; reference most_similar topn,
    literal_similarity.py:179-189)."""
    return (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )


def _distinct_sets_table(d: np.ndarray, t: np.ndarray) -> pa.Table:
    """Pack (doc, element-hash) pairs into one row per doc holding its sorted
    distinct element set; docs with zero elements are dropped (they cannot
    pair above a positive threshold)."""
    df = (
        pd.DataFrame({"d": d, "t": t.astype(np.int64)})
        .drop_duplicates()
        .sort_values(["d", "t"])
    )
    dd = df["d"].to_numpy()
    uniq_docs, counts = np.unique(dd, return_counts=True)
    off = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    toks = pa.ListArray.from_arrays(
        pa.array(off), pa.array(df["t"].to_numpy(), type=pa.int64())
    )
    return pa.table({"doc_id": pa.array(uniq_docs, type=pa.int64()), "toks": toks})


def _tiled_set_jaccard(
    sets_ds: "rd.Dataset", threshold: float, block: int, score_name: str
) -> "rd.Dataset":
    """Exact all-pairs set jaccard >= threshold via two-sided block tiling
    (same shape as ``embedding_dup_pairs``): ``sets_ds`` has one row per doc
    (doc_id, toks: sorted distinct int64 element hashes). The corpus streams
    through the driver one ``block``-doc slab at a time into per-block
    object-store entries (never a whole-corpus incidence matrix anywhere),
    then the upper-triangle (row-block × col-block) tiles fan out as tasks.
    Each tile intersects the two blocks' vocabularies first (elements in only
    one block cannot contribute) and accumulates intersection counts by
    chunked dense matmul over that shared vocabulary, so per-task memory is
    bounded by the block/chunk sizes. Inverted-index candidate generation was
    tried and rejected: this corpus's vocab overlap makes nearly every pair
    co-occur (86% of all pairs pass the 0.4 oracle threshold), so candidate
    pruning degenerates to O(n^2 * df) emitted rows — exhaustive tiles ARE
    the right algorithm at oracle scale, and the MinHash/LSH pipeline is the
    10^12-doc path.
    """
    # stream doc blocks into per-block objects: (ids, sizes, tok_by_token_order,
    # doc_code_by_token_order, sorted unique tokens of the block)
    block_refs: list = []
    for b in sets_ds.iter_batches(batch_size=block, batch_format="pyarrow"):
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = b["toks"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(offs)
        doc_code = np.repeat(np.arange(len(ids), dtype=np.int32), sizes)
        order = np.argsort(flat, kind="stable")
        tok_s = flat[order]
        doc_s = doc_code[order]
        uniq = np.unique(tok_s)
        block_refs.append(
            ray.put((ids, sizes.astype(np.float64), tok_s, doc_s, uniq))
        )

    nb = len(block_refs)
    tiles = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    thr = threshold
    vchunk = 16384  # shared-vocab chunk: bounds each dense slab to block×vchunk

    def _shared_codes(tok_s, doc_s, shared):
        pos = np.searchsorted(shared, tok_s)
        pos_c = np.minimum(pos, len(shared) - 1)
        ok = shared[pos_c] == tok_s
        return pos_c[ok], doc_s[ok]  # token codes ascending (tok_s is sorted)

    def pairs_for_tile(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, sz_i, tok_i, doc_i, uq_i = ray.get(block_refs[i])
            ids_j, sz_j, tok_j, doc_j, uq_j = ray.get(block_refs[j])
            shared = np.intersect1d(uq_i, uq_j, assume_unique=True)
            if len(shared) == 0:
                continue
            ci, di = _shared_codes(tok_i, doc_i, shared)
            cj, dj = _shared_codes(tok_j, doc_j, shared)
            inter = np.zeros((len(ids_i), len(ids_j)), dtype=np.float32)
            for c0 in range(0, len(shared), vchunk):
                c1 = min(c0 + vchunk, len(shared))
                li, hi = np.searchsorted(ci, (c0, c1))
                lj, hj = np.searchsorted(cj, (c0, c1))
                if hi == li or hj == lj:
                    continue
                A = np.zeros((len(ids_i), c1 - c0), dtype=np.float32)
                A[di[li:hi], ci[li:hi] - c0] = 1.0
                B = np.zeros((len(ids_j), c1 - c0), dtype=np.float32)
                B[dj[lj:hj], cj[lj:hj] - c0] = 1.0
                inter += A @ B.T
            interd = inter.astype(np.float64)  # counts exact (< 2^24)
            union = sz_i[:, None] + sz_j[None, :] - interd
            jac = interd / np.maximum(union, 1.0)  # union >= 1 (docs non-empty)
            ii, jj = np.nonzero(jac >= thr)
            if i == j:
                keep = ids_i[ii] < ids_j[jj]  # upper triangle, a < b
                out_a.append(ids_i[ii[keep]])
                out_b.append(ids_j[jj[keep]])
                out_j.append(jac[ii[keep], jj[keep]])
            else:
                ai, bj = ids_i[ii], ids_j[jj]
                out_a.append(np.minimum(ai, bj))
                out_b.append(np.maximum(ai, bj))
                out_j.append(jac[ii, jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        jv = np.concatenate(out_j) if out_j else np.empty(0, np.float64)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                score_name: _round_col(jv, 6),
            }
        )

    if not tiles:
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    score_name: pa.array([], type=pa.float64()),
                }
            )
        )
    return rd.from_items(tiles).map_batches(
        pairs_for_tile, batch_format="pyarrow", batch_size=1
    )


def token_jaccard_pairs(
    sf_dir: str, threshold: float = 0.4, block: int = 512, engine: str = "auto"
):
    """All doc pairs with unigram token-set jaccard >= threshold — the n-gram
    jaccard dedup operator at n=1 (G4 jaccard_coef, utils/distance.py:129-134).
    Two value-identical engines (see shingle_jaccard_pairs): the exhaustive
    ``tiled`` miner and the subquadratic ``prefix`` set-similarity join
    (stages/setjoin.py). At the default t=0.4 the prefix is ~60 % of each
    set, so pruning is weaker than in the t=0.8 shingle tier — the count
    filter still removes the near-miss mass and keeps the join
    candidate-bounded; ``auto`` switches engines at _SETJOIN_AUTO_DOCS."""
    from imagededupx_ray.stages.setjoin import set_similarity_join

    def doc_token_sets(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        tok_h = H.token_hash_flat(flat)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.repeat(doc_ids, np.diff(offsets))
        return _distinct_sets_table(d, tok_h)

    docs = _read(sf_dir, "documents")
    if engine == "auto":
        engine = "prefix" if docs.count() >= _SETJOIN_AUTO_DOCS else "tiled"
    sets_ds = docs.map_batches(doc_token_sets, batch_format="pyarrow")
    if engine == "tiled":
        return _tiled_set_jaccard(sets_ds, threshold, block, "jaccard")

    def round6(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "jaccard": _round_col(
                    t["jaccard"].to_numpy(zero_copy_only=False), 6
                ),
            }
        )

    return set_similarity_join(sets_ds, threshold).map_batches(
        round6, batch_format="pyarrow"
    )


def shingle_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    k: int = 5,
    block: int = 512,
    engine: str = "auto",
):
    """All doc pairs with character k-gram (shingle) set jaccard >= threshold
    — the exact n-gram-jaccard dedup tier whose 10^12-doc approximation is
    the MinHash pipeline (same 5-gram shingles, stages/signatures.py).
    Shingles are taken over lower(trim(text)) to match the SQL twin exactly;
    the per-doc python slice loop is oracle-scale-only by design (the scale
    path shingles inside the fused C kernel, functions/native.py).

    Two value-identical engines since round 4 (equality-tested at thresholds
    0.3-0.95): ``tiled`` is the exhaustive two-sided tiled miner — O(n^2)
    compute but only four fixed shuffles, fastest at oracle scale; ``prefix``
    is the subquadratic prefix-filtering set-similarity join
    (stages/setjoin.py — AllPairs/PPJoin candidate generation + size-ratio
    filter + exact verify) that prunes candidates by the rarest
    ~``(1-t)|d|`` shingles per doc and is the 100-TB scale path for
    selective thresholds (t >= ~0.6). ``auto`` switches on corpus size at
    _SETJOIN_AUTO_DOCS docs."""
    from imagededupx_ray.stages.setjoin import set_similarity_join

    def doc_shingle_sets(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.utf8_trim_whitespace(batch["text"]))
        texts = s.to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shingles: list[str] = []
        docs: list[np.ndarray] = []
        for did, t in zip(doc_ids, texts):
            t = t or ""
            n = len(t) - k + 1
            if n <= 0:
                continue
            sh = list({t[i : i + k] for i in range(n)})
            shingles.extend(sh)
            docs.append(np.full(len(sh), did, dtype=np.int64))
        d = np.concatenate(docs) if docs else np.empty(0, np.int64)
        th = H.token_hash_flat(pa.array(shingles, type=pa.string()))
        return _distinct_sets_table(d, th)

    docs = _read(sf_dir, "documents")
    if engine == "auto":
        engine = "prefix" if docs.count() >= _SETJOIN_AUTO_DOCS else "tiled"
    sets_ds = docs.map_batches(doc_shingle_sets, batch_format="pyarrow")
    if engine == "tiled":
        return _tiled_set_jaccard(sets_ds, threshold, block, "jaccard")

    def round6(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "jaccard": _round_col(
                    t["jaccard"].to_numpy(zero_copy_only=False), 6
                ),
            }
        )

    return set_similarity_join(sets_ds, threshold).map_batches(
        round6, batch_format="pyarrow"
    )


def tfidf_cosine_topk(sf_dir: str, n_queries: int = 10, k: int = 10):
    """TF-IDF cosine top-k retrieval (M3 — the reference's TfidfSimilarity,
    utils/tfidf.py:63-71 / literal_similarity.py TfidfSimilarity): weights
    w(d, t) = tf(d, t) · ln(N / df(t)) over whitespace unigrams, cosine of
    the first ``n_queries`` docs against the corpus, top-k by (cos desc,
    neighbor asc). Neighbors must SHARE at least one token with the query
    (the SQL twin's join semantics).

    Fully distributed, NO vocab-sized driver collect (round-2 flaw fixed):
    one term-keyed shuffle builds posting rows with df attached in-partition
    (stages/tfidf.tfidf_postings), query-doc vectors come from a filtered
    scan of those postings, and scoring re-keys by doc so full-vector norms
    are partition-local."""
    from imagededupx_ray.stages.tfidf import (
        _score_partitions,
        count_docs_with_tokens,
        tfidf_postings,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    postings = tfidf_postings(docs)
    n_docs = float(count_docs_with_tokens(docs))

    # query vectors = the first n_queries docs' own posting rows (tiny
    # filtered scan; df rides along, so no vocabulary lookup is needed)
    q_rows = (
        postings.filter(expr=f"d < {n_queries}")
        .to_pandas()
        .sort_values(["d", "t"])
    )
    q_pack = []
    for q_id, grp in q_rows.groupby("d"):
        t = grp["t"].to_numpy().astype(np.int64)
        wt = grp["tf"].to_numpy().astype(np.float64) * np.log(
            n_docs / grp["df"].to_numpy().astype(np.float64)
        )
        q_pack.append((int(q_id), t, wt, float(np.sqrt((wt**2).sum()))))

    partials = _score_partitions(
        postings, q_pack, n_docs, k, candidates="share_excl_self"
    ).rename(columns={"doc_id": "neighbor_id", "score": "cosine"})
    out = (
        partials.sort_values(
            ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = _round_col(out["cosine"].to_numpy(), 6).to_numpy()
    return out


# --------------------------------------------------------------------------
# TPC-H-ish relational coverage (grouped aggregates, joins, sort+limit)
# --------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape over lineitem: 6 fixed (flag, status) cells, so the
    aggregate runs through the shuffle-free partial-groupby (pyarrow
    group_by per block + fanout combine) instead of Ray's sort-shuffle —
    the map-side combiner discipline (G6-style two-pass)."""

    def disc_price(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "disc_price", pa.array(ep * (1.0 - disc), type=pa.float64())
        )

    ds = _partial_groupby(
        _read(sf_dir, "lineitem")
        .select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
        )
        .map_batches(disc_price, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [
            ("sum", "l_quantity", "sum_qty"),
            ("sum", "l_extendedprice", "sum_base_price"),
            ("sum", "disc_price", "sum_disc_price"),
            ("mean", "l_quantity", "avg_qty"),
            ("mean", "l_discount", "avg_disc"),
            ("count", "", "count_order"),
        ],
    )

    def roundcols(t: pa.Table) -> pa.Table:
        for col, nd in [
            ("sum_qty", 2),
            ("sum_base_price", 2),
            ("sum_disc_price", 2),
            ("avg_qty", 6),
            ("avg_disc", 6),
        ]:
            t = t.set_column(
                t.column_names.index(col),
                col,
                _round_col(t[col].to_numpy(zero_copy_only=False), nd),
            )
        return t

    return ds.map_batches(roundcols, batch_format="pyarrow")


def orders_per_customer(sf_dir: str):
    """customer ⋈ orders as a BROADCAST map-side join (J1 analogue — content
    keys, not positional df.iloc like faiss_bert_similarity.py:175): the
    customer dimension table is small-side (``ray.put`` once, sorted-array
    searchsorted lookup inside map_batches over the distributed orders
    aggregate) — no per-partition aggregator actors. The per-customer
    aggregate itself is ONE coarse-partition exchange + a segmented
    lexsort/reduceat per partition (the repo's standard keyed-exchange
    shape) instead of Ray's native sort-shuffle."""
    p = _coarse_parts()
    _AGG_SCHEMA = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("n_orders", pa.int64()),
            ("total_spent", pa.float64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ck_ = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(ck_, p),
                "o_custkey": pa.array(ck_, type=pa.int64()),
                "o_totalprice": batch["o_totalprice"],
            }
        )

    def agg_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _AGG_SCHEMA.empty_table()
        ck_ = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tp = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.argsort(ck_, kind="stable")
        ck_, tp = ck_[o], tp[o]
        first = np.ones(len(ck_), dtype=bool)
        first[1:] = ck_[1:] != ck_[:-1]
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "o_custkey": pa.array(ck_[starts], type=pa.int64()),
                "n_orders": pa.array(
                    np.diff(np.append(starts, len(ck_))).astype(np.int64)
                ),
                "total_spent": pa.array(np.add.reduceat(tp, starts), type=pa.float64()),
            }
        )

    orders_agg = (
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(agg_part, batch_format="pyarrow")
    )
    joined = _attach_dim(
        orders_agg,
        _read(sf_dir, "customer"),
        fact_key="o_custkey",
        dim_key="c_custkey",
        dim_val="c_mktsegment",
        out_val="c_mktsegment",
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["o_custkey"].cast(pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": t["n_orders"],
                "total_spent": _round_col(
                    t["total_spent"].to_numpy(zero_copy_only=False), 2
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------------------------
# events family (timestamp handling)
# --------------------------------------------------------------------------

def events_hourly(sf_dir: str):
    """Per (event_type, hour): counts + value sum; hour as epoch seconds.
    The (type, hour) domain is bounded by the crawl window, so this runs
    shuffle-free through the partial-groupby combiner."""

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)  # us
        hour = (ts // 3_600_000_000) * 3600
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour_epoch": pa.array(hour, type=pa.int64()),
                "value": batch["value"],
            }
        )

    ds = _partial_groupby(
        _read(sf_dir, "events").map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "hour_epoch"],
        [("count", "", "n_events"), ("sum", "value", "sum_value")],
    )
    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("sum_value"),
            "sum_value",
            _round_col(t["sum_value"].to_numpy(zero_copy_only=False), 4),
        ),
        batch_format="pyarrow",
    )


def events_user_stats(sf_dir: str):
    """Per user: event count, value sum, first/last event time (epoch us)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "value": batch["value"],
            }
        )

    ds = (
        _read(sf_dir, "events")
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="total_value"),
            Min("ts_us", alias_name="first_ts_us"),
            Max("ts_us", alias_name="last_ts_us"),
        )
    )
    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total_value"),
            "total_value",
            _round_col(t["total_value"].to_numpy(zero_copy_only=False), 4),
        ),
        batch_format="pyarrow",
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Windowed sessionization — split each user's event stream into sessions
    at inactivity gaps > ``gap_minutes``; one row per session with count,
    bounds and value sum. A streaming-window operator the reference lacks.

    Scale shape: ONE hash exchange on the coarse key ``splitmix64(user_id)
    & (P-1)`` (never the raw unbounded user_id — that would be one Python
    ``map_groups`` call per user); each partition task lexsorts its rows by
    (user, ts) and resolves every user's sessions in one segmented-numpy
    pass, exactly the discipline of the LSH tier (stages/lsh.py)."""
    gap_us = gap_minutes * 60_000_000
    p = _coarse_parts()

    _SCHEMA = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("start_ts_us", pa.int64()),
            ("end_ts_us", pa.int64()),
            ("sum_value", pa.float64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(uid, p),
                "user_id": pa.array(uid, type=pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
                "value": batch["value"],
            }
        )

    def sessionize_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        val = group["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        brk = new_user.copy()
        brk[1:] |= np.diff(ts) > gap_us
        starts = np.flatnonzero(brk)  # one entry per session
        # 1-based session id within each user, in start-time order
        sess_user_first = np.flatnonzero(new_user[starts])
        offs = np.repeat(
            sess_user_first, np.diff(np.append(sess_user_first, len(starts)))
        )
        sid = np.arange(len(starts), dtype=np.int64) - offs + 1
        n_ev = np.diff(np.append(starts, n))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "session_id": pa.array(sid, type=pa.int64()),
                "n_events": pa.array(n_ev, type=pa.int64()),
                "start_ts_us": pa.array(ts[starts], type=pa.int64()),
                "end_ts_us": pa.array(ts[np.append(starts[1:], n) - 1], type=pa.int64()),
                "sum_value": _round_col(np.add.reduceat(val, starts), 4),
            }
        )

    return (
        _read(sf_dir, "events")
        .select_columns(["user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(sessionize_part, batch_format="pyarrow")
    )


def events_orders_asof(sf_dir: str):
    """As-of join: for every event, the most recent order timestamp of the
    same customer at or before the event time (orders ⟵asof events on
    user_id). A custom temporal-join operator Ray Data lacks.

    Scale shape: tag-union → ONE hash exchange on the coarse key
    ``splitmix64(user_id) & (P-1)`` (no broadcast — both sides corpus-sized
    at web scale, and never a Python call per user). Each partition task
    lexsorts the merged rows by (key, ts, side) with order rows winning ties
    (asof is "at or before"), then a single ``maximum.accumulate`` carry of
    order-row indices answers every event at once; a carried index before
    the event's key segment means "no earlier order" → -1 sentinels (the
    SQL twin's COALESCE)."""
    p = _coarse_parts()

    _SCHEMA = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("last_order_ts_us", pa.int64()),
            ("lag_sec", pa.float64()),
        ]
    )

    def prep_events(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(key, p),
                "key": pa.array(key, type=pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"].cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),  # events after orders at tie
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(key, p),
                "key": pa.array(key, type=pa.int64()),
                "ts_us": batch["o_orderdate"].cast(pa.int64()),
                "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    ev = (
        _read(sf_dir, "events")
        .select_columns(["user_id", "ts", "event_id"])
        .map_batches(prep_events, batch_format="pyarrow")
    )
    od = (
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_orderdate"])
        .map_batches(prep_orders, batch_format="pyarrow")
    )

    def asof_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        key = group["key"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ts, key))
        key, ts, eid, side = key[order], ts[order], eid[order], side[order]
        is_order = side == 0
        # most recent order ROW INDEX at or before each row (global carry)
        carried = np.maximum.accumulate(
            np.where(is_order, np.arange(n, dtype=np.int64), np.int64(-1))
        )
        # reset at key boundaries: a carried index before this key's first row
        # belongs to another customer
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        np.not_equal(key[1:], key[:-1], out=new_key[1:])
        seg_starts = np.flatnonzero(new_key)
        seg_start_of_row = np.repeat(
            seg_starts, np.diff(np.append(seg_starts, n))
        )
        valid = carried >= seg_start_of_row
        ev_rows = ~is_order
        e_valid = valid[ev_rows]
        last = np.where(e_valid, ts[np.maximum(carried[ev_rows], 0)], np.int64(-1))
        lag = np.where(e_valid, (ts[ev_rows] - last) / 1_000_000.0, -1.0)
        return pa.table(
            {
                "event_id": pa.array(eid[ev_rows], type=pa.int64()),
                "user_id": pa.array(key[ev_rows], type=pa.int64()),
                "last_order_ts_us": pa.array(last, type=pa.int64()),
                "lag_sec": _round_col(lag, 6),
            }
        )

    return ev.union(od).groupby("_part").map_groups(asof_part, batch_format="pyarrow")


def q3_shipping_priority(sf_dir: str, topk: int = 10):
    """Revenue top-k orders with customer segment — a 3-way join
    (lineitem ⋈ orders ⋈ customer) shaped for scale: the fact table
    pre-aggregates per order BEFORE any join (combiner on the wide side),
    the orders bridge joins via the hash-partitioned ``Dataset.join``, and
    the customer dimension attaches map-side from a broadcast sorted array
    (small side, ``ray.put`` once)."""
    from ray.data.aggregate import Sum

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
                "rev": pa.array(p * (1.0 - d), type=pa.float64()),
            }
        )

    per_order = (
        _read(sf_dir, "lineitem")
        .select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(rev, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def prep_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "o_custkey": batch["o_custkey"].cast(pa.int64()),
            }
        )

    orders = (
        _read(sf_dir, "orders")
        .select_columns(["o_orderkey", "o_custkey"])
        .map_batches(prep_orders, batch_format="pyarrow")
    )
    joined = per_order.join(
        orders, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    with_seg = _attach_dim(
        joined,
        _read(sf_dir, "customer"),
        fact_key="o_custkey",
        dim_key="c_custkey",
        dim_val="c_mktsegment",
        out_val="c_mktsegment",
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": _round_col(
                    t["revenue"].to_numpy(zero_copy_only=False), 2
                ),
                "c_mktsegment": t["c_mktsegment"],
            }
        )

    out = with_seg.map_batches(finalize, batch_format="pyarrow")
    return (
        out.sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(topk)
        .to_pandas()
    )


# --------------------------------------------------------------------------
# embeddings family (similarity search, SURVEY.md §2.3 A4 replaced)
# --------------------------------------------------------------------------

def knn_cosine(sf_dir: str, n_queries: int = 10, k: int = 10):
    """Brute-force cosine top-k of the first ``n_queries`` vectors against the
    whole embeddings table: broadcast query matrix (``ray.put`` once, zero-copy
    ``ray.get`` per task), per-batch float64 matmul, per-batch partial top-k,
    tiny global reduce (A4 FAISS IndexFlatIP analogue,
    improved_faiss_detector.py:297-317). Task-mode map_batches — the scan
    parallelizes across all cores. Equal-cosine ties break by neighbor_id
    ascending at BOTH the per-batch and global reduce, matching the oracle's
    ``ORDER BY cos DESC, neighbor_id``."""
    emb = _read(sf_dir, "embeddings")
    q_tbl = (
        emb.filter(expr=f"vec_id < {n_queries}")
        .select_columns(["vec_id", "embedding"])
        .to_pandas()
    )
    Q = np.stack(q_tbl["embedding"].to_numpy()).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = q_tbl["vec_id"].to_numpy().astype(np.int64)
    q_ref = ray.put((q_ids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids_, Qm = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        M = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        M = M.reshape(len(ids), -1)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        S = Qm @ M.T  # (nq, nbatch)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_)):
            row = S[qi]
            cand = np.flatnonzero(ids != q_ids_[qi])
            if len(cand) == 0:
                continue
            # ties by neighbor_id ascending: lexsort keys, primary = -cosine
            top = cand[np.lexsort((ids[cand], -row[cand]))[:k]]
            out_q.append(np.full(len(top), q_ids_[qi], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(row[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    partials = emb.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    # global reduce: tiny (n_queries * k * n_blocks rows)
    out = (
        partials.sort_values(
            ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = _round_col(out["cosine"].to_numpy(), 6).to_numpy()
    return out


# --------------------------------------------------------------------------
# dedup family over documents-as-pages (rows-only driver check; the SQL
# engine cannot reproduce blake2b signatures)
# --------------------------------------------------------------------------

def _documents_as_pages(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls = pa.array([f"doc://{i}" for i in ids], type=pa.string())
        n = batch.num_rows
        return pa.table(
            {
                "url": urls,
                "warc_ts": pa.nulls(n, pa.timestamp("us")),
                "html": pa.nulls(n, pa.binary()),
                "text": batch["text"],
                "lang": batch["lang"],
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


_DEDUP_CACHE: dict = {}


def _run_dedup_cached(sf_dir: str, cfg: DedupConfig):
    """One pipeline run shared by the queries that all consume it
    (dedup_clusters / cluster report / substring spans) — the driver invokes
    them sequentially in one process, so re-running extract→sign→LSH→verify
    per query would triple the work. Intermediates are materialized Datasets;
    cache is process-local and config-keyed."""
    from imagededupx_ray.pipelines.dedup import run_dedup

    key = (sf_dir, cfg.config_hash)
    if key not in _DEDUP_CACHE:
        _DEDUP_CACHE.clear()  # hold at most one corpus's intermediates
        _DEDUP_CACHE[key] = run_dedup(_documents_as_pages(sf_dir), cfg)
    return _DEDUP_CACHE[key]


def dedup_clusters(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG):
    """Flagship: full near-dup pipeline over documents-as-pages."""
    return _run_dedup_cached(sf_dir, cfg).clusters


def docs_weighted_dup_pairs(sf_dir: str, threshold: float = 0.5):
    """All doc pairs with TERM-FREQUENCY-weighted jaccard >= threshold
    (J_w = sum min(tf) / sum max(tf) over unigram tokens): ICWS weighted
    minhash sketches (Ioffe 2010) band through the production LSH exchange
    for candidates, exact weighted verify via the bag-expansion reduction
    (stages/wminhash.py). DuckDB exact twin + engine equality gated in
    tests/test_wminhash.py."""
    from imagededupx_ray.stages.wminhash import weighted_dup_pairs

    return weighted_dup_pairs(_read(sf_dir, "documents"), threshold=threshold)


def oph_dedup_clusters(sf_dir: str):
    """Flagship pipeline under the one-permutation-hashing signer
    (config.signer == "oph": one hash per shingle binned into 128
    partitions + optimal densification, vs 128 permutation hashes — the
    10^12-doc signing path). Same cluster schema and LSH/verify semantics;
    recall >= 0.99 on planted truth pairs gated in tests/test_oph.py.
    Runs LAST in the suite (the dedup cache holds one config at a time)."""
    from dataclasses import replace

    return _run_dedup_cached(sf_dir, replace(DEFAULT_CONFIG, signer="oph")).clusters


def dedup_cluster_report(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG, top: int = 100):
    """Size-ordered duplicate-community report: the reference's
    community_detection output semantics (utils/util.py:237-305 — communities
    sorted by size, centroid/canonical first) over the full dedup pipeline.
    Distributed size aggregate → top-N sort; only the N-row report plus the
    N canonical urls ever reach the driver. Rows-only (blake2b cluster ids)."""
    from ray.data.aggregate import Count

    clusters = _run_dedup_cached(sf_dir, cfg).clusters
    report = (
        clusters.groupby("cluster_id")
        .aggregate(Count(alias_name="n_members"))
        .sort(["n_members", "cluster_id"], descending=[True, False])
        .limit(top)
        .to_pandas()
    )
    want = np.sort(report["cluster_id"].to_numpy().astype(np.int64))
    want_ref = ray.put(want)

    def canon_urls(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        ids = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_can = t["is_canonical"].to_numpy(zero_copy_only=False)
        if len(w) == 0:
            keep = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.searchsorted(w, ids)
            pos[pos >= len(w)] = 0
            keep = (w[pos] == ids) & is_can
        return pa.table(
            {
                "cluster_id": pa.array(ids[keep], type=pa.int64()),
                "canonical_url": t["url"].filter(pa.array(keep)),
            }
        )

    urls = clusters.map_batches(canon_urls, batch_format="pyarrow").to_pandas()
    out = report.merge(urls, on="cluster_id", how="left")
    return out.sort_values(
        ["n_members", "cluster_id"], ascending=[False, True]
    ).reset_index(drop=True)


def minhash_signatures(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG):
    """Signature table over documents-as-pages (first 4 minhash components
    surfaced as scalar columns for a stable, narrow result)."""
    from imagededupx_ray.stages.extract import extract_stage
    from imagededupx_ray.stages.signatures import signature_stage, signatures_to_numpy

    sigs = signature_stage(extract_stage(_documents_as_pages(sf_dir)), cfg)

    def narrow(batch: pa.Table) -> pa.Table:
        ids, mh, sim, nsh = signatures_to_numpy(batch, cfg.num_perms)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "mh0": pa.array(mh[:, 0].astype(np.int64) & np.int64((1 << 63) - 1), type=pa.int64()),
                "mh1": pa.array(mh[:, 1].astype(np.int64) & np.int64((1 << 63) - 1), type=pa.int64()),
                "simhash": pa.array(sim.astype(np.int64) & np.int64((1 << 63) - 1), type=pa.int64()),
                "n_shingles": pa.array(nsh.astype(np.int64), type=pa.int64()),
            }
        )

    return sigs.map_batches(narrow, batch_format="pyarrow")


def lsh_pairs(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG):
    """LSH candidate pairs over documents-as-pages."""
    from imagededupx_ray.stages.extract import extract_stage
    from imagededupx_ray.stages.lsh import lsh_candidate_pairs
    from imagededupx_ray.stages.signatures import signature_stage

    sigs = signature_stage(extract_stage(_documents_as_pages(sf_dir)), cfg)
    return lsh_candidate_pairs(sigs.materialize(), cfg)


# --------------------------------------------------------------------------
# text-analysis family (quality, langid, fingerprints)
# --------------------------------------------------------------------------

def docs_quality(sf_dir: str):
    """Per-doc quality stats (C4/Gopher-style curation heuristics): char
    counts + digit/upper/space ratios, all Arrow-kernel vectorized."""
    from imagededupx_ray.functions.textstats import quality_stats

    def fn(batch: pa.Table) -> pa.Table:
        stats = quality_stats(batch["text"])
        return pa.table({"doc_id": batch["doc_id"], **{c: stats[c] for c in stats.column_names}})

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


def docs_fingerprint_md5(sf_dir: str):
    """Exact content fingerprint (md5 hex) per doc — the SQL-oracle-able
    fingerprint twin (reference MD5 file hash, improved_faiss_detector.py:41-50)."""
    from imagededupx_ray.functions.textstats import content_md5

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "md5": pa.array(content_md5(batch["text"].to_pylist()), type=pa.string()),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


def docs_langid(sf_dir: str):
    """Heuristic language-ID (stopword-profile + CJK codepoint test) — the
    n-gram-heuristic langid of web-corpus curation; rows-only (no SQL twin)."""
    from imagededupx_ray.functions.textstats import langid_batch

    def fn(batch: pa.Table) -> pa.Table:
        langs, conf = langid_batch(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs, type=pa.string()),
                "confidence": pa.array(conf, type=pa.float64()),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


def docs_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprint summary per doc (Schleimer et al.): count and
    xor-fold of the fingerprint set (order-independent, deterministic)."""
    from imagededupx_ray.functions.textstats import winnow_fingerprints

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        th = H.token_hash_flat(flat)
        fps, counts = winnow_fingerprints(th, offsets)
        xor_fold = np.zeros(batch.num_rows, dtype=np.uint64)
        pos = 0
        for i, c in enumerate(counts):
            seg = fps[pos : pos + int(c)]
            pos += int(c)
            if len(seg):
                xor_fold[i] = np.bitwise_xor.reduce(seg)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array(counts, type=pa.int64()),
                "fp_xor": pa.array(
                    (xor_fold & np.uint64((1 << 63) - 1)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


def simhash_dup_pairs(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG):
    """All doc pairs within simhash hamming distance <= cfg.simhash_hamming_max
    (the SimHash dedup tier; reference hamming similarity
    literal_similarity.py:119-125). Hamming-band LSH — the code splits into
    hamming_max+1 bit blocks, a within-distance pair must match exactly in
    some block (pigeonhole), so banding → bucket groupby → popcount verify is
    EXACT and replaces the former driver O(n²) pair grid; equality vs brute
    force is gated in tests (test_simhash_pairs_match_bruteforce)."""
    from imagededupx_ray.stages.extract import extract_stage
    from imagededupx_ray.stages.signatures import signature_stage, signatures_to_numpy
    from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

    sigs = signature_stage(extract_stage(_documents_as_pages(sf_dir)), cfg)

    def codes(batch: pa.Table) -> pa.Table:
        ids, _, sim, nsh = signatures_to_numpy(batch, cfg.num_perms)
        keep = nsh > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "simhash": pa.array(sim[keep].view(np.int64), type=pa.int64()),
            }
        )

    code_ds = sigs.map_batches(codes, batch_format="pyarrow").materialize()
    return hamming_band_pairs(
        code_ds,
        id_col="doc_id",
        code_col="simhash",
        hamming_max=cfg.simhash_hamming_max,
    )


# --------------------------------------------------------------------------
# embedding similarity family (ANN + near-dup)
# --------------------------------------------------------------------------

def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4, block: int = 1024):
    """Embedding-cosine near-duplicate pairs (>= threshold), exact two-sided
    block-tiled matmul — the embedding tier of dedup. The corpus streams
    through the driver ONE BLOCK AT A TIME into per-block object-store
    entries (never a single n×d matrix anywhere), and the upper-triangle
    (row-block × col-block) tiles fan out as tasks, each fetching exactly
    two block objects. Exhaustive O(n²) compute by design — the oracle-exact
    twin of the IVF scale path (embedding_dup_pairs_ann)."""
    emb_ds = _read(sf_dir, "embeddings")

    block_refs: list = []
    for b in emb_ds.select_columns(["vec_id", "embedding"]).iter_batches(
        batch_size=block, batch_format="pyarrow"
    ):
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        M = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        M = M.reshape(len(ids), -1)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        block_refs.append(ray.put((ids, np.ascontiguousarray(M))))

    nb = len(block_refs)
    tiles = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    def pairs_for_tile(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, Mi = ray.get(block_refs[i])
            ids_j, Mj = ray.get(block_refs[j])
            S = Mi @ Mj.T
            ii, jj = np.nonzero(S >= threshold)
            if i == j:
                # square tile holds both orientations: keep the a < b one
                keep = ids_i[ii] < ids_j[jj]
                out_a.append(ids_i[ii[keep]])
                out_b.append(ids_j[jj[keep]])
                out_c.append(S[ii[keep], jj[keep]])
            else:
                # cross tile holds each unordered pair once: orient by id
                ai, bj = ids_i[ii], ids_j[jj]
                out_a.append(np.minimum(ai, bj))
                out_b.append(np.maximum(ai, bj))
                out_c.append(S[ii, jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        c = np.concatenate(out_c) if out_c else np.empty(0, np.float64)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "cosine": _round_col(c, 6),
            }
        )

    if not tiles:
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        )
    return rd.from_items(tiles).map_batches(
        pairs_for_tile, batch_format="pyarrow", batch_size=1
    )


def embedding_dup_pairs_ann(sf_dir: str, threshold: float = 0.4):
    """IVF-bucketed embedding near-dup pairs — the 10^12-vector scale path of
    embedding_dup_pairs (one centroid-bucketed shuffle, exact within-bucket
    mining, multi-assignment for boundary recall); rows-only — recall vs the
    exact miner is gated in tests (test_ivf_dup_pairs_recall_and_precision)."""
    from imagededupx_ray.stages.ann import ivf_dup_pairs

    pairs = ivf_dup_pairs(_read(sf_dir, "embeddings"), threshold=threshold)

    def roundc(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("cosine"),
            "cosine",
            _round_col(t["cosine"].to_numpy(zero_copy_only=False), 6),
        )

    return pairs.map_batches(roundc, batch_format="pyarrow")


def docs_substring_cleanup(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG):
    """ExactSubstr corpus cleanup (Lee et al. 2021, arXiv:2107.06499): every
    duplicated exact span found by the suffix-array stage is EXCISED from
    its higher-doc_id occurrence; the min-id occurrence stays. Returns one
    row per doc (doc_id, n_spans_removed, bytes_removed, text_md5) — the
    rewritten text rides as its md5 so the evidence row is narrow. Rows-only
    (excision/UTF-8/idempotence gates in tests/test_spans.py)."""
    from imagededupx_ray.stages.spans import substring_cleanup, substring_spans

    res = _run_dedup_cached(sf_dir, cfg)
    spans = substring_spans(
        res.verified_pairs, res.docs_unique.select_columns(["doc_id", "text"]), cfg
    )
    cleaned = substring_cleanup(
        res.docs_unique.select_columns(["doc_id", "text"]), spans
    )
    return cleaned.map_batches(_cleanup_digest, batch_format="pyarrow")


def _cleanup_digest(batch: pa.Table) -> pa.Table:
    """Narrow evidence rows for a cleanup output: text rides as its md5."""
    import hashlib

    md5s = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_spans_removed": batch["n_spans_removed"],
            "bytes_removed": batch["bytes_removed"],
            "text_md5": pa.array(md5s, type=pa.string()),
        }
    )


def docs_exactsubstr_cleanup(sf_dir: str):
    """Corpus-level ExactSubstr cleanup (Lee et al. 2021): every repeated
    byte run >= ~95 bytes ANYWHERE in the corpus (cross-doc boilerplate or
    intra-doc repetition, near-dup pair or not) excised from all but its
    first (doc_id, start) occurrence — winnowed-anchor exchange, no corpus
    suffix array (stages/exactsubstr.py). Rows-only (kernel exactness,
    anchor guarantee, planted-boilerplate/intra-doc/no-false-positive gates
    in tests/test_exactsubstr.py)."""
    from imagededupx_ray.stages.exactsubstr import corpus_substring_cleanup

    cleaned = corpus_substring_cleanup(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    )
    return cleaned.map_batches(_cleanup_digest, batch_format="pyarrow")


def _lined_docs_batch(batch: pa.Table, tokens_per_line: int = 12) -> pa.Table:
    """Deterministic LINED view of the single-line sf documents corpus:
    each doc's tokens wrapped into ``tokens_per_line``-token lines, plus
    planted boilerplate (a cookie banner on even doc_ids, a digit-bearing
    copyright footer on doc_id % 3 == 0) so the derived corpus has the
    CCNet-style cross-document repeated lines that line-level dedup exists
    to remove. Pure Arrow/numpy: token list offsets -> line ListArray ->
    binary_join, no per-row Python."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(pc.cast(batch["text"], pa.string()), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    tok_offsets = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offsets[1:])
    pos = np.arange(len(doc_idx), dtype=np.int64) - tok_offsets[doc_idx]
    # one line per tokens_per_line run within each doc
    line_starts = np.flatnonzero((pos % tokens_per_line) == 0)
    line_offsets = np.append(line_starts, len(doc_idx)).astype(np.int64)
    lines = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(line_offsets, type=pa.int64()), flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat),
        " ",
    )
    n_lines_per_doc = (counts + tokens_per_line - 1) // tokens_per_line
    doc_line_offsets = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n_lines_per_doc, out=doc_line_offsets[1:])
    wrapped = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(doc_line_offsets, type=pa.int64()), lines),
        "\n",
    )
    pre = np.where(ids % 2 == 0, "Cookie Consent Accept All Tracking Technologies\n", "")
    suf = np.where(ids % 3 == 0, "\nCopyright 2024 Example Site All Rights Reserved", "")
    text = pc.binary_join_element_wise(
        pa.array(pre, type=pa.string()), wrapped, pa.array(suf, type=pa.string()), ""
    )
    return pa.table({"doc_id": batch["doc_id"], "text": text})


def lined_documents(sf_dir: str):
    """The derived lined-documents view feeding docs_line_dedup (shared with
    the DuckDB oracle twin in tests/test_linededup.py)."""
    return (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(_lined_docs_batch, batch_format="pyarrow")
    )


def docs_line_dedup(sf_dir: str, min_doc_rep: int = 4):
    """CCNet/RefinedWeb line-level boilerplate removal (Wenzek et al. 2019
    §4.1; Penedo et al. 2023 §3.3) — the pre-step web pipelines run BEFORE
    document-level near-dedup, removing every line whose normalized form
    (lowercase, digits stripped, whitespace collapsed) repeats across >=
    min_doc_rep distinct documents. The reference dedups whole files only
    (improved_faiss_detector.py:259-295); line granularity is the web-text
    extension. Runs over a deterministic lined view of the documents table
    (the sf corpora are single-line; see _lined_docs_batch). Evidence row:
    per-doc line counts, removal counts, removed chars and cleaned length —
    all integers, so the suite md5 is float-noise-free. Exact DuckDB twin
    (including the cleaned text itself) gated in tests/test_linededup.py."""
    from imagededupx_ray.stages.linededup import dedup_lines

    clean, _n_hot = dedup_lines(lined_documents(sf_dir), min_doc_rep=min_doc_rep)

    def digest(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": batch["n_lines"],
                "n_lines_removed": batch["n_lines_removed"],
                "line_chars_removed": batch["line_chars_removed"],
                "clean_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return clean.map_batches(digest, batch_format="pyarrow")


def dedup_tiers(sf_dir: str):
    """Tiered dedup cascade report (exact → MinHash-LSH near → loose-SimHash
    template → SemDeDup semantic), each tier over the previous tier's
    survivors — the orchestration shape of a web-scale corpus build
    (pipelines/tiers.py). Shares tiers 1+2 with dedup_clusters via the
    process-local pipeline cache; embeddings align to the pipeline's
    hash64(url) doc_id domain before entering tier 4. Rows-only (per-tier
    invariants + planted-tier attribution gated in tests/test_tiers.py)."""
    from imagededupx_ray.pipelines.tiers import dedup_tier_cascade
    from imagededupx_ray.stages.extract import _hash64_column

    def remap(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        urls = pa.array([f"doc://{i}" for i in ids], type=pa.string())
        return pa.table(
            {
                "vec_id": pa.array(_hash64_column(urls), type=pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    emb = _read(sf_dir, "embeddings").map_batches(remap, batch_format="pyarrow")
    return dedup_tier_cascade(
        _documents_as_pages(sf_dir),
        emb_ds=emb,
        dedup_result=_run_dedup_cached(sf_dir, DEFAULT_CONFIG),
    )


def semdedup_prune(sf_dir: str, eps: float = 0.4):
    """SemDeDup semantic-dedup verdicts (arXiv:2303.09540): per-vector
    (vec_id, semdup_id, keep) where duplicate components come from the IVF
    bucket exchange at cosine >= eps and each component keeps its lowest-
    centroid-similarity member. Rows-only — the keep-rule/grouping gates
    live in tests/test_ops.py (planted duplicate groups)."""
    from imagededupx_ray.stages.semdedup import semdedup_verdicts

    return semdedup_verdicts(_read(sf_dir, "embeddings"), eps=eps)


def lsa_semdedup(sf_dir: str, dim: int = 32, vocab: int = 1024, eps: float = 0.95):
    """End-to-end LEARNED-encoder semantic text dedup: fit the distributed
    LSA model over the documents table (stages/lsa.py — hashed-TF-IDF Gram
    tree-reduce, fixed V x V global state), embed every doc through it, and
    run SemDeDup verdicts over the learned embeddings. This is the
    reference's deep-encoder dedup story (bert_similarity.py:50-58 ->
    paraphrase mining) with a corpus-learned numpy encoder instead of a
    torch checkpoint; all-integer output (doc_id, semdup_id, keep) so the
    suite fingerprint is float-noise-free. Encoder/verdict gates live in
    tests/test_lsa.py and tests/test_ops.py."""
    from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit
    from imagededupx_ray.stages.semdedup import semdedup_verdicts

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    if docs.count() == 0:  # centroid fit needs >= 1 vector
        return pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"),
             "semdup_id": pd.Series(dtype="int64"),
             "keep": pd.Series(dtype="bool")}
        )
    model = lsa_fit(docs, dim=dim, vocab=vocab)
    emb = lsa_embed(docs, model).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    out = semdedup_verdicts(emb, eps=eps)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    return df.sort_values("vec_id").reset_index(drop=True)


def lsa_search(sf_dir: str, k: int = 10, dim: int = 32, vocab: int = 1024, model=None):
    """Learned-encoder semantic STRING search — the reference's
    ``most_similar`` with a deep encoder (bert_similarity.py:105-160) run
    end-to-end on the corpus-learned LSA model: fit over the documents
    table, embed the corpus (streaming scan), project the fixed query
    strings through the same model, brute-force cosine top-k per query via
    a broadcast query matrix (the exact baseline; IVF/HNSW are the
    registered scale twins). Output (query_id, doc_id, rank) is
    integer-only, so the suite fingerprint is float-noise-free; ranking
    gates live in tests/test_lsa.py."""
    from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit, lsa_project_texts

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    if model is None:
        model = lsa_fit(docs, dim=dim, vocab=vocab)
    Q = lsa_project_texts(ENSEMBLE_QUERIES, model)
    q_ref = ray.put(Q)

    def score_topk(batch: pa.Table) -> pa.Table:
        """Per-batch PARTIAL top-k per query (nq*k rows max per batch) —
        the collected partials are block-count-bounded, never
        corpus-bounded."""
        q = ray.get(q_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        S = E @ q.T  # (n, nq)
        n, nq = S.shape
        kk = min(k, n)
        top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, nq)
        qs = np.repeat(np.arange(nq, dtype=np.int64), kk)
        di = ids[top.T.reshape(-1)]
        cs = S[top.T.reshape(-1), qs]
        return pa.table(
            {
                "query_id": pa.array(qs),
                "doc_id": pa.array(di, type=pa.int64()),
                "cosine": pa.array(cs, type=pa.float64()),
            }
        )

    df = (
        lsa_embed(docs, model)
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["query_id", "cosine", "doc_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df[["query_id", "doc_id", "rank"]]


def ann_cosine(sf_dir: str, n_queries: int = 10, k: int = 10):
    """IVF approximate top-k (scale path of knn_cosine); rows-only — recall
    vs brute force is gated in tests/test_ann.py."""
    from imagededupx_ray.stages.ann import IVFIndex

    emb = _read(sf_dir, "embeddings")
    q = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    idx = IVFIndex(n_clusters=16, nprobe=6).build(emb)
    out = idx.search(Q, q["vec_id"].to_numpy(), k=k)
    out["cosine"] = out["cosine"].round(6)
    return out


def ann_hnsw(sf_dir: str, n_queries: int = 10, k: int = 10):
    """Graph-ANN (HNSW) approximate top-k — the reference's Hnswlib tier
    (fast_bert_similarity.py:40-58), sharded per-partition graphs built in
    ``map_groups``; rows-only — recall vs brute force is gated in
    tests/test_hnsw.py."""
    from imagededupx_ray.stages.hnsw import hnsw_topk

    emb = _read(sf_dir, "embeddings")
    q = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    out = hnsw_topk(emb, Q, q["vec_id"].to_numpy(), k=k)
    out["cosine"] = out["cosine"].round(6)
    return out


def pq_search_topk(sf_dir: str, n_queries: int = 10, k: int = 10, m: int = 16):
    """Product-quantized ANN top-k (stages/pq.py) — the memory-scale path of
    knn_cosine: fit per-subspace codebooks, encode the embeddings table to
    m-byte codes (16x compression at d=64), ADC-shortlist each query over
    the codes-only scan, then exact-rerank the bounded shortlist (the faiss
    refine discipline; the reference's autofaiss factory picks IVF*,PQ*
    layouts at this corpus scale, faiss_bert_similarity.py:98-130).
    Rows-only — recall gates live in tests/test_pq.py."""
    from imagededupx_ray.stages.pq import pq_encode, pq_fit, pq_search_rerank

    emb = _read(sf_dir, "embeddings")
    q = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    cb = pq_fit(emb, m=m)
    codes = pq_encode(emb, cb).materialize()
    return pq_search_rerank(codes, emb, cb, Q, q["vec_id"].to_numpy(), k=k)


def docs_bpe_subwords(sf_dir: str, n_merges: int = 200, n_docs: int = 50):
    """Train a BPE subword vocabulary over the documents table (distributed
    word counts → bounded driver merge loop, stages/bpe.py) and encode the
    first ``n_docs`` docs with the learned merges through the stateful
    actor-pool encoder. Evidence row per encoded doc: token count + the
    space-joined subword string (full segmentation, md5-stable). Rows-only
    — trainer parity, blocking invariance and round-trip gates live in
    tests/test_bpe.py."""
    from imagededupx_ray.stages.bpe import bpe_encode, bpe_train

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    merges = bpe_train(docs, n_merges=n_merges)
    enc = (
        bpe_encode(docs.filter(expr=f"doc_id < {n_docs}"), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    enc["subwords"] = enc["tokens"].map(lambda t: " ".join(t))
    return enc[["doc_id", "n_tokens", "subwords"]]


def image_decode_features(sf_dir: str):
    """Multimodal decode: mixed PNG/JPEG/GIF payloads through the
    actor-pool decode stage — (width, height, mean_luma) come from the REAL
    stdlib codecs; only the deep-feature vector is the declared
    deterministic fake (no torch in the container)."""
    from imagededupx_ray.stages.multimodal import decode_images

    return decode_images(_mixed_codec_dataset(200), concurrency=None, batch_size=8).map_batches(
        lambda t: t.drop_columns(["feature"]), batch_format="pyarrow"
    )


def image_perceptual_hashes(sf_dir: str):
    """Real perceptual hashes (pHash DCT / dHash / aHash / wHash / colorhash,
    reference utils/imagehash.py:159-347) over GENUINE encoded images —
    mixed PNG (stdlib-zlib, functions/png.py), baseline JPEG (numpy
    Huffman+IDCT, functions/jpeg.py) and GIF (LZW, functions/gif.py); the
    reference's input shape, utils/image_util.py:23-107 — via the
    actor-pool stage; rows-only —
    kernel parity vs per-pixel oracles is gated in tests/test_imagehash.py,
    codec correctness in tests/test_png.py and tests/test_jpeg.py."""
    from imagededupx_ray.stages.multimodal import perceptual_hashes

    return perceptual_hashes(_mixed_codec_dataset(200), concurrency=None, batch_size=8)


def _mixed_codec_dataset(n: int, n_blocks: int = 16):
    """PNG / JPEG / GIF / TIFF / WebP rotating by index over the SAME
    raster corpus (one encode per image — every driver run exercises all
    five real stdlib codecs, and planted near-dup pairs span codecs), pre-split
    into Dataset blocks so the actor-pool hash stage parallelizes from the
    first batch. The encoded corpus is /tmp-cached by generation key (the
    pure-python encoders dominate the query wall otherwise); decode — the
    operator under test — still runs live every time."""
    from imagededupx_ray.stages.multimodal import synthetic_mixed_images
    from imagededupx_ray.util import cached_corpus_ds

    # v6: 5-codec rotation (PNG / JPEG baseline+progressive+multiscan /
    # GIF / TIFF / WebP lossless+lossy-VP8-when-libwebp-present); the key
    # encodes the generation recipe (incl. lossy availability) so stale
    # caches never serve
    from imagededupx_ray.stages.multimodal import _lossy_webp

    tag = "v6l" if _lossy_webp() else "v6"
    return cached_corpus_ds(
        f"mixed_images_n{n}_s42_d5_{tag}", lambda: synthetic_mixed_images(n), n_blocks
    )


def image_feature_dup_pairs(sf_dir: str, threshold: float = 0.99, n: int = 150):
    """Feature-cosine image dup mining over the REAL classical features
    (4³ RGB joint hist + folded LBP, functions/imagefeat.py) — the
    reference's FAISS IndexFlatIP image-dedup flow
    (improved_faiss_detector.py:297-353) re-expressed as the IVF bucket
    exchange. The corpus plants the reference's actual use case: the SAME
    raster re-encoded under a different lossless codec (PNG→TIFF→VP8L
    rotation), so every planted pair doubles as a cross-codec
    decode-consistency gate (measured: dup cosine >= 0.9999 iff all three
    codecs round-trip bit-identically; non-dup max 0.845). Planted-pair
    recall is gated in tests/test_imagefeat.py; rows-only here."""
    from imagededupx_ray.stages.ann import ivf_dup_pairs
    from imagededupx_ray.stages.multimodal import decode_images, synthetic_recode_images
    from imagededupx_ray.util import cached_corpus_ds

    ds = cached_corpus_ds(
        f"recode_images_n{n}_s42_d5_v1", lambda: synthetic_recode_images(n), 16
    )
    feats = decode_images(ds, concurrency=None, batch_size=8)
    emb = feats.map_batches(
        lambda t: pa.table({"vec_id": t["image_id"], "embedding": t["feature"]}),
        batch_format="pyarrow",
    )
    out = ivf_dup_pairs(emb, threshold=threshold)
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("cosine"),
            "cosine",
            _round_col(t["cosine"].to_numpy(zero_copy_only=False), 6),
        ),
        batch_format="pyarrow",
    )


def image_phash_dup_pairs(sf_dir: str, hamming_max: int = 10):
    """Image near-dup pairs: phash-band LSH (4x16-bit bands over the 64-bit
    code → bucket groupby → popcount verify) — the namesake image-dedup
    pipeline at LSH scale over genuine PNG + baseline-JPEG + GIF files
    (mixed codecs, stdlib decode all three); planted near-dups in the
    synthetic corpus are the expected output (rows-only)."""
    from imagededupx_ray.stages.multimodal import perceptual_hashes
    from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

    # task mode (per-process cached stage): the stdlib decode wall is
    # sub-second across workers; the (2,8) actor pool's cold start was the
    # dominant cost in the driver bench (VERDICT r4 #7)
    hashes = perceptual_hashes(_mixed_codec_dataset(200), concurrency=None, batch_size=8)
    return hamming_band_pairs(
        hashes.select_columns(["image_id", "phash"]),
        id_col="image_id",
        code_col="phash",
        hamming_max=hamming_max,
    )


def audio_clip_features(sf_dir: str):
    """Audio-modality features (duration / RMS / ZCR / spectral centroid,
    bandwidth, rolloff) + Wang-2003 landmark fingerprints over GENUINE WAV
    files (stdlib RIFF decode, functions/wav.py) via the actor-pool stage —
    the reference's multimodal feature extraction
    (improved_faiss_detector.py:145-257) generalized to audio; rows-only —
    kernel correctness vs analytical signals is gated in
    tests/test_audio.py."""
    from imagededupx_ray.stages.audio import audio_features

    return audio_features(_wav_corpus(120), concurrency=None, batch_size=8).drop_columns(
        ["fingerprints"]
    )


def _wav_corpus(n: int):
    """/tmp-cached synthetic WAV corpus as a pinned-block Dataset (see
    _mixed_codec_dataset)."""
    from imagededupx_ray.stages.audio import synthetic_wav_clips
    from imagededupx_ray.util import cached_corpus_ds

    return cached_corpus_ds(
        f"wav_clips_n{n}_s42_d5_r8000", lambda: synthetic_wav_clips(n)
    )


def _video_corpus(n: int):
    """/tmp-cached synthetic MJV1 corpus as a pinned-block Dataset (see
    _mixed_codec_dataset)."""
    from imagededupx_ray.stages.video import synthetic_video_clips
    from imagededupx_ray.util import cached_corpus_ds

    return cached_corpus_ds(
        f"video_clips_n{n}_s42_d5_f10", lambda: synthetic_video_clips(n)
    )


def audio_dup_pairs(sf_dir: str):
    """Audio near-dup pairs via the landmark-hash bucket join (exact-match
    groupby — the same exchange shape as MinHash LSH banding; no O(n²)
    stage); planted re-gained+noised copies in the synthetic WAV corpus are
    the expected output (rows-only; full-recall/zero-false gate in
    tests/test_audio.py)."""
    from imagededupx_ray.stages.audio import audio_features, fingerprint_dup_pairs

    feats = audio_features(_wav_corpus(120), concurrency=None, batch_size=8)
    return fingerprint_dup_pairs(feats)


def video_dup_pairs(sf_dir: str):
    """Video near-dup pairs: sample every 2nd frame from MJV1 (length-
    prefixed baseline-JPEG frames — real numpy codec decode), pHash each
    sampled frame, mine frame pairs with the image tier's hamming-band LSH,
    lift to video level by matched-frame fraction. Planted
    re-encoded-at-lower-quality copies are the expected output (rows-only;
    full-recall/zero-false gate in tests/test_video.py)."""
    from imagededupx_ray.stages.video import (
        video_dup_pairs as _vdp,
        video_frame_hashes,
    )

    fh = video_frame_hashes(_video_corpus(60), every_k=2, concurrency=None)
    return _vdp(fh)


def bm25_search(sf_dir: str, k: int = 10):
    """BM25 Okapi top-k over documents for fixed deterministic queries
    (reference A3 rank_bm25 rebuilt distributed; rows-only — exact-score
    parity vs a pure-python BM25 is gated in tests/test_bm25.py)."""
    from imagededupx_ray.stages.bm25 import bm25_topk

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    queries_ = [
        "key value hash table scan",
        "window stream batch merge",
        "sort order join part",
    ]
    out = bm25_topk(docs, queries_, k=k)
    out["score"] = out["score"].round(6)
    return out


ENSEMBLE_QUERIES = [
    "key value hash table scan",
    "window stream batch merge",
    "sort order join part",
]


def ensemble_search(sf_dir: str, k: int = 10):
    """End-to-end ensemble retrieval: BM25 and TF-IDF-cosine both rank the
    corpus for the same queries, fused by Reciprocal Rank Fusion c=60 — the
    reference's EnsembleSimilarity (ensemble_similarity.py:27-170) with two
    REAL distributed retrievers; rows-only (golden-gated in
    tests/test_ensemble.py)."""
    from imagededupx_ray.functions.fusion import reciprocal_rank_fusion
    from imagededupx_ray.stages.bm25 import bm25_topk
    from imagededupx_ray.stages.tfidf import tfidf_topk

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"]).materialize()
    r_bm25 = bm25_topk(docs, ENSEMBLE_QUERIES, k=30)
    r_tfidf = tfidf_topk(docs, ENSEMBLE_QUERIES, k=30)
    fused = reciprocal_rank_fusion([r_bm25, r_tfidf], k=k)
    fused["score"] = fused["score"].round(6)
    return fused


def tfidf_search(sf_dir: str, k: int = 10):
    """TF-IDF cosine top-k for fixed string queries (M3 retrieval tier;
    rows-only — the doc-as-query variant tfidf_cosine_topk is the
    hash-gated twin)."""
    from imagededupx_ray.stages.tfidf import tfidf_topk

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = tfidf_topk(docs, ENSEMBLE_QUERIES, k=k)
    out["score"] = out["score"].round(6)
    return out


def substring_spans_docs(sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG):
    """Suffix-array exact substring spans over the near-dup candidate pairs
    of the documents corpus (north-rule span operator; rows-only — exact
    parity vs difflib longest-match is gated in tests/test_spans.py)."""
    from imagededupx_ray.stages.spans import substring_spans

    res = _run_dedup_cached(sf_dir, cfg)
    return substring_spans(
        res.verified_pairs, res.docs_unique.select_columns(["doc_id", "text"]), cfg
    )

# --------------------------------------------------------------------------
# round-3 additions: wordcount / quantile / filter-agg / grouped top-k
# (large-scale curation staples; each with a DuckDB oracle twin)
# --------------------------------------------------------------------------

def _batch_bigrams(batch: pa.Table) -> pa.Array:
    """All within-doc word bigrams of a batch as one flat string array
    (adjacent-token join, document-boundary pairs dropped)."""
    flat, offsets = tokenize_batch(batch["text"])
    if len(flat) < 2:
        return pa.array([], type=pa.string())
    joined = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " "
    )
    # drop pairs that straddle a document boundary: the last token of each
    # doc (index offsets[d+1]-1) has no successor within its doc
    keep = np.ones(len(flat) - 1, dtype=bool)
    bad = offsets[1:] - 1
    keep[bad[(bad >= 0) & (bad < len(flat) - 1)]] = False
    out = joined.filter(pa.array(keep))
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def docs_top_ngrams(sf_dir: str, topk: int = 50):
    """Corpus-wide top-k word bigrams — the distributed-wordcount pattern:
    per-batch partial counts inside map_batches (vectorized adjacent-token
    join + Arrow value_counts) shrink the exchange to distinct-ngram rows,
    then a small groupby-sum and a top-k sort. At 100 TB the exchange volume
    is the distinct-bigram table, never the token stream (see
    docs_top_ngrams_mg for the sketch that bounds even that)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vc = _batch_bigrams(batch).value_counts()
        if len(vc) == 0:
            return pa.table(
                {
                    "ngram": pa.array([], type=pa.string()),
                    "partial_n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "ngram": vc.field("values"),
                "partial_n": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents")
        .select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "ngram"], descending=[True, False])
        .limit(topk)
    )


def docs_length_quantiles(sf_dir: str):
    """Exact per-lang length percentiles (p50/p90/p99, percentile_cont
    linear-interpolation semantics) via counting histograms: the shuffle
    carries only (lang, n_chars) -> count rows — bounded by the value domain,
    not the corpus — and the quantile interpolation runs over the tiny
    histogram on the driver. The scalable exact-quantile pattern (a t-digest
    would be the approximate path for unbounded domains)."""
    hist = _partial_groupby(
        _read(sf_dir, "documents").select_columns(["lang", "n_chars"]),
        ["lang", "n_chars"],
        [("count", "", "cnt")],
    ).to_pandas()  # histogram-sized: O(langs x distinct lengths)

    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy(dtype=np.float64)
        cnt = g["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])

        def q_at(q: float) -> float:
            h = (n - 1) * q
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            v_lo = vals[np.searchsorted(cum, lo, side="right")]
            v_hi = vals[np.searchsorted(cum, hi, side="right")]
            return v_lo + (h - lo) * (v_hi - v_lo)

        rows.append((lang, q_at(0.5), q_at(0.9), q_at(0.99), n))

    out = pd.DataFrame(rows, columns=["lang", "p50", "p90", "p99", "n_docs"])
    for c in ("p50", "p90", "p99"):
        out[c] = _round_col(out[c].to_numpy(), 6).to_numpy(zero_copy_only=False)
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 — selective filter + global aggregate with the predicate
    pushed into the parquet read (row-group pruning on l_shipdate stats,
    columns pruned to the four used); per-batch partial sums collapse to one
    scalar, so nothing shuffles."""
    import datetime

    import pyarrow.dataset as pads

    f = (
        (pads.field("l_shipdate") >= pa.scalar(datetime.datetime(1996, 1, 1)))
        & (pads.field("l_shipdate") < pa.scalar(datetime.datetime(1997, 1, 1)))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=f,
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = float(
            np.dot(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                batch["l_discount"].to_numpy(zero_copy_only=False),
            )
        )
        return pa.table({"rev": pa.array([rev], type=pa.float64())})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("rev")
    out = pd.DataFrame({"revenue": [float(total or 0.0)]})
    out["revenue"] = _round_col(out["revenue"].to_numpy(), 2).to_numpy(
        zero_copy_only=False
    )
    return out


def events_top_users_per_type(sf_dir: str, k: int = 3):
    """Grouped top-k: per event_type, the k users with the highest total
    value. Stage 1 partial-aggregates (event_type, user_id) sums — the only
    corpus-sized exchange; stage 2 is a per-type map_groups top-k over
    aggregate-sized groups. Rank ties break on rounded total then user_id
    (identical in the SQL twin, so the gate is deterministic)."""
    from ray.data.aggregate import Count, Sum

    agg = (
        _read(sf_dir, "events")
        .select_columns(["event_type", "user_id", "value"])
        .groupby(["event_type", "user_id"])
        .aggregate(
            Sum("value", alias_name="total_value"),
            Count(alias_name="n_events"),
        )
    )

    def topk(group: pa.Table) -> pa.Table:
        tv = _round_col(
            group["total_value"].to_numpy(zero_copy_only=False), 4
        ).to_numpy(zero_copy_only=False)
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        ne = group["n_events"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -tv))[:k]
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()] * len(order)
                ),
                "user_id": pa.array(uid[order], type=pa.int64()),
                "total_value": pa.array(tv[order], type=pa.float64()),
                "n_events": pa.array(ne[order], type=pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            }
        )

    return agg.groupby("event_type").map_groups(topk, batch_format="pyarrow")


def docs_repetition_stats(sf_dir: str):
    """Per-doc repetition / lexical-diversity stats — the Gopher-style
    quality filters (Rae et al. 2021 §A1.1): type-token ratio and
    most-common-token ratio flag template/boilerplate pages for removal.
    Pure per-batch map (stats are per-doc), so the stage has NO exchange at
    all — it scales with read bandwidth at 100 TB. Empty docs are dropped
    (no tokens → ratios undefined), matching the SQL twin's WHERE."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        n_tok = np.diff(offsets)
        doc_idx = np.repeat(np.arange(batch.num_rows), n_tok)
        per = (
            pd.DataFrame({"d": doc_idx, "t": flat.to_pandas()})
            .groupby(["d", "t"])
            .size()
            .groupby(level=0)
            .agg(["size", "max"])
        )
        n_uniq = np.zeros(batch.num_rows, dtype=np.int64)
        top = np.zeros(batch.num_rows, dtype=np.int64)
        if len(per):
            n_uniq[per.index.to_numpy()] = per["size"].to_numpy()
            top[per.index.to_numpy()] = per["max"].to_numpy()
        keep = n_tok > 0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        nt = n_tok[keep].astype(np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n_tok[keep].astype(np.int64)),
                "n_distinct": pa.array(n_uniq[keep]),
                "ttr": _round_col(n_uniq[keep] / nt, 6),
                "top_token_ratio": _round_col(top[keep] / nt, 6),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


def docs_quality_verdicts(sf_dir: str):
    """Composite quality-filter VERDICTS — the actual keep/drop decision of
    a C4/Gopher-style curation pass (Rae et al. 2021 §A1.1; Raffel et al.
    2020 §2.2), not just the stats: each doc gets a boolean ``keep`` plus a
    comma-joined ``reasons`` string naming every failed rule in a fixed
    rule order (too_short, too_long, word_len, repetitive, low_diversity).
    Thresholds are tuned to this corpus' profile so the verdict set is a
    real mix (measured at sf0.01: n_tokens 10-99, top-token ratio
    0.065-0.16, TTR 0.31-0.80). One narrow per-batch scan, no exchange;
    the reasons column is assembled fully vectorized (flag matrix ->
    ListArray of names -> ``binary_join``), never a per-row Python loop."""
    from imagededupx_ray.functions.textstats import quality_verdict_batch

    return _read(sf_dir, "documents").map_batches(
        quality_verdict_batch, batch_format="pyarrow"
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def docs_pii_scrub(sf_dir: str):
    """PII redaction — the CCNet/Dolma-style scrub pass every released web
    corpus runs: emails, phone numbers and IPv4 literals are replaced with
    <EMAIL>/<PHONE>/<IP> tokens, applied in that fixed order (each count is
    taken on the text AFTER the previous rule's replacement, so overlapping
    matches are never double-counted). Pure per-batch Arrow RE2 kernels
    (``count_substring_regex`` + ``replace_substring_regex``) — no exchange,
    scales with read bandwidth. Both Arrow and DuckDB compile RE2, so the
    DuckDB ``regexp_replace(..., 'g')`` twin in tests/test_queries_extra.py
    is an exact gate (planted-PII corpus; this sf corpus is PII-free, which
    the suite row evidences as an all-zero pass-through)."""
    RULES = [("<EMAIL>", PII_EMAIL), ("<PHONE>", PII_PHONE), ("<IP>", PII_IP)]

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        counts = {}
        for token, pat in RULES:
            counts[token] = pc.count_substring_regex(text, pat)
            text = pc.replace_substring_regex(text, pat, token)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": text,
                "n_emails": counts["<EMAIL>"].cast(pa.int64()),
                "n_phones": counts["<PHONE>"].cast(pa.int64()),
                "n_ips": counts["<IP>"].cast(pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
    )


def docs_dedup_consecutive_tokens(sf_dir: str):
    """In-document repetition CLEANUP (not just scoring): rewrite each doc
    with consecutive duplicate tokens collapsed to one occurrence — the
    within-page templating/stutter removal step of web-text curation
    pipelines (the transform counterpart to docs_repetition_stats'
    Gopher-style filters). Emits (doc_id, clean_text, n_removed).

    Scale shape: stateless per-batch map, NO exchange — the keep-mask is one
    vectorized Arrow equality over the flat token array (token i survives iff
    it starts its doc or differs from token i-1), and the rewrite is one
    ``binary_join`` over a rebuilt list array. Scales with read bandwidth."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        n = len(flat)
        n_tok = np.diff(offsets)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            eq = pc.equal(flat.slice(1), flat.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            keep[1:] = ~eq
        # tokens at doc starts always survive (a doc never inherits its
        # predecessor's trailing token); empty docs have no start token
        keep[offsets[:-1][n_tok > 0]] = True
        doc_idx = np.repeat(np.arange(batch.num_rows), n_tok)
        kept_counts = np.bincount(
            doc_idx[keep], minlength=batch.num_rows
        ).astype(np.int64)
        new_offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=new_offsets[1:])
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offsets), flat.filter(pa.array(keep))
        )
        clean = pc.binary_join(kept_list, " ")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_removed": pa.array((n_tok - kept_counts).astype(np.int64)),
            }
        )

    return (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
    )


def orders_cumulative_revenue(sf_dir: str):
    """Running-total windowed aggregate (SUM OVER PARTITION BY ... ORDER BY
    ... ROWS UNBOUNDED PRECEDING): per customer, cumulative o_totalprice in
    (o_orderdate, o_orderkey) order.

    Scale shape: ONE hash exchange on the coarse key ``splitmix64(custkey)
    & (P-1)``; each partition task lexsorts by (custkey, date, orderkey) and
    computes every customer's running total at once as a segment-reset
    cumsum (global prefix sum minus the prefix at the customer's first row)
    — no per-customer Python dispatch. The accumulation runs in integer
    CENTS (o_totalprice is 2-decimal data), so the running total is exact
    and independent of partition composition — bit-equal to the DuckDB
    window oracle after the 2-decimal round."""
    p = _coarse_parts()

    _SCHEMA = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("cum_revenue", pa.float64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(ck, p),
                "o_custkey": pa.array(ck, type=pa.int64()),
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "o_totalprice": batch["o_totalprice"],
            }
        )

    def cum_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        ck = group["o_custkey"].to_numpy(zero_copy_only=False)
        ok = group["o_orderkey"].to_numpy(zero_copy_only=False)
        od = group["o_orderdate"].to_numpy(zero_copy_only=False)
        price = group["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od, ck))
        ck, ok, od, price = ck[order], ok[order], od[order], price[order]
        cents = np.round(price * 100.0).astype(np.int64)
        cumr = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        base = np.repeat(
            cumr[starts] - cents[starts], np.diff(np.append(starts, n))
        )
        return pa.table(
            {
                "o_custkey": pa.array(ck, type=pa.int64()),
                "o_orderkey": pa.array(ok, type=pa.int64()),
                "o_orderdate": pa.array(od, type=pa.timestamp("us")),
                "cum_revenue": _round_col((cumr - base) / 100.0, 2),
            }
        )

    return (
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(cum_part, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# sketch-backed queries: constant-size per-block summaries instead of
# key-domain-sized exchanges (functions/sketches.py — HLL / Misra-Gries /
# equi-rank quantiles). The exact twins above shuffle the distinct-key
# table; at 100 TB that table is itself enormous, so these are the scale
# path for cardinality / heavy-hitter / quantile questions.
# --------------------------------------------------------------------------


def _sketch_tree_reduce(summaries: "rd.Dataset", merge_rows, fanout: int = 64):
    """Associative tree reduce over fixed-size sketch summary rows. Each
    level packs ~``fanout`` rows per block (cheap repartition of tiny rows)
    and merges every block to ONE row, until <= fanout rows remain; those
    are returned for the caller's final driver merge. Driver traffic is
    bounded by fanout x summary size at any corpus size — the flat
    ``take_all()`` alternative ships block-count-many summaries to one
    process (e.g. 800k blocks x 16 KB HLL rows = 13 GB on the driver).
    Three levels at fanout 64 cover a quarter-million blocks."""
    ds = summaries.materialize()
    n = ds.count()
    while n > fanout:
        ds = (
            ds.repartition(max(1, -(-n // fanout)))
            .map_batches(merge_rows, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        new_n = ds.count()
        if new_n >= n:  # safety: a level must strictly shrink
            ds = ds.repartition(1).map_batches(
                merge_rows, batch_format="pyarrow", batch_size=None
            ).materialize()
            return ds.take_all()
        n = new_n
    return ds.take_all()


def docs_top_ngrams_mg(sf_dir: str, topk: int = 50, k_counters: int = 4096):
    """CERTIFIED-exact top-k bigrams with a bounded exchange: per-block
    Misra-Gries summaries (fixed 64 KB each, any corpus size) merge into a
    candidate set + a provable max-undercount ``deficit``; one narrow
    recount pass restricted to the broadcast candidates yields exact counts,
    and ``count[topk] > deficit`` certifies the true top-k is inside the
    candidate set (Misra-Gries 1982; mergeable-summaries form of Agarwal et
    al. 2012). Unlike docs_top_ngrams, NOTHING here scales with the
    distinct-bigram domain — only with topk and block count. Hash-gated
    against the same SQL oracle as the exact query."""
    from ray.data.aggregate import Sum

    from imagededupx_ray.functions import sketches as SK
    from imagededupx_ray.functions.hashing import token_hash_flat

    docs = _read(sf_dir, "documents").select_columns(["text"])

    def partial(batch: pa.Table) -> pa.Table:
        h = token_hash_flat(_batch_bigrams(batch)).astype(np.uint64)
        keys, counts = np.unique(h, return_counts=True)
        keys, counts, off = SK.mg_truncate(keys, counts.astype(np.int64), k_counters)
        return pa.table(
            {
                "keys": pa.array([keys.tobytes()], type=pa.binary()),
                "counts": pa.array([counts.tobytes()], type=pa.binary()),
                "deficit": pa.array([off], type=pa.int64()),
            }
        )

    def _rows_to_summaries(rows):
        return [
            (
                np.frombuffer(r["keys"], dtype=np.uint64),
                np.frombuffer(r["counts"], dtype=np.int64),
                int(r["deficit"]),
            )
            for r in rows
        ]

    def merge_rows(batch: pa.Table) -> pa.Table:
        keys, counts, deficit = SK.mg_merge(
            _rows_to_summaries(batch.to_pylist()), k_counters
        )
        return pa.table(
            {
                "keys": pa.array([keys.tobytes()], type=pa.binary()),
                "counts": pa.array([counts.tobytes()], type=pa.binary()),
                "deficit": pa.array([deficit], type=pa.int64()),
            }
        )

    top_rows = _sketch_tree_reduce(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_rows,
    )
    cand, _, deficit = SK.mg_merge(_rows_to_summaries(top_rows), k_counters)
    cand_ref = ray.put(np.sort(cand))

    def recount(batch: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        grams = _batch_bigrams(batch)
        empty = pa.table(
            {
                "ngram": pa.array([], type=pa.string()),
                "partial_n": pa.array([], type=pa.int64()),
            }
        )
        if len(grams) == 0 or len(want) == 0:
            return empty
        h = token_hash_flat(grams).astype(np.uint64)
        pos = np.searchsorted(want, h)
        pos[pos >= len(want)] = 0
        vc = grams.filter(pa.array(want[pos] == h)).value_counts()
        if len(vc) == 0:
            return empty
        return pa.table(
            {
                "ngram": vc.field("values"),
                "partial_n": vc.field("counts").cast(pa.int64()),
            }
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow", batch_size=None)
        .groupby("ngram")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "ngram"], descending=[True, False])
        .limit(topk)
        .to_pandas()
    )
    # certification: every bigram NOT in the candidate set has true count
    # <= deficit, so count[topk-1] > deficit proves containment of the true
    # top-k. On pathological inputs (no frequency separation) raise rather
    # than return a silently-unproven answer.
    if len(exact) == topk and int(exact["n"].iloc[-1]) <= deficit:
        raise ValueError(
            f"MG top-{topk} not certifiable: count_k={exact['n'].iloc[-1]} "
            f"<= deficit={deficit}; raise k_counters"
        )
    return exact


def docs_distinct_bigrams_hll(sf_dir: str):
    """Distinct-bigram cardinality via HyperLogLog (p=14, std err 0.81%):
    each block emits one 16 KB register row; the merge is an elementwise max
    over block-count rows. The exact twin (`unique`) is a full all-to-all
    shuffle of the key domain. Returns one row (n_distinct_est, hll_p);
    gated in pytest against the exact distinct count at <= 3% error."""
    from imagededupx_ray.functions import sketches as SK
    from imagededupx_ray.functions.hashing import token_hash_flat

    def partial(batch: pa.Table) -> pa.Table:
        h = token_hash_flat(_batch_bigrams(batch)).astype(np.uint64)
        return pa.table(
            {"regs": pa.array([SK.hll_partial(h).tobytes()], type=pa.binary())}
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        merged = SK.hll_merge(
            [np.frombuffer(b, dtype=np.uint8) for b in batch["regs"].to_pylist()]
        )
        return pa.table({"regs": pa.array([merged.tobytes()], type=pa.binary())})

    top_rows = _sketch_tree_reduce(
        _read(sf_dir, "documents")
        .select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_rows,
    )
    regs = SK.hll_merge(
        [np.frombuffer(r["regs"], dtype=np.uint8) for r in top_rows]
    )
    return pd.DataFrame(
        {
            "n_distinct_est": [float(SK.hll_estimate(regs))],
            "hll_p": [int(SK.HLL_P)],
        }
    )


def docs_length_quantiles_sketch(sf_dir: str, buckets: int = 512):
    """Global n_chars quantiles (p50/p90/p99) via two-level equi-rank
    compression: each block sorts its values and emits <= ``buckets``
    (mean, weight) centroids; the merge is a weighted quantile over the
    union. The worst-case rank error (sum of per-block half-bucket widths)
    is computed, RETURNED, and gated in pytest — the honest contract the
    exact histogram (docs_length_quantiles) can't keep once the value
    domain is unbounded (floats, token counts at 100 TB)."""
    from imagededupx_ray.functions import sketches as SK

    def partial(batch: pa.Table) -> pa.Table:
        means, weights, err = SK.rank_compress(
            batch["n_chars"].to_numpy(zero_copy_only=False), buckets
        )
        return pa.table(
            {
                "means": pa.array([means.tobytes()], type=pa.binary()),
                "weights": pa.array([weights.tobytes()], type=pa.binary()),
                "err": pa.array([err], type=pa.float64()),
            }
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        means = np.concatenate(
            [np.frombuffer(b, dtype=np.float64) for b in batch["means"].to_pylist()]
        )
        weights = np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in batch["weights"].to_pylist()]
        )
        err_in = float(np.sum(batch["err"].to_numpy(zero_copy_only=False)))
        m, w, added = SK.rank_recompress(means, weights, buckets)
        return pa.table(
            {
                "means": pa.array([m.tobytes()], type=pa.binary()),
                "weights": pa.array([w.tobytes()], type=pa.binary()),
                "err": pa.array([err_in + added], type=pa.float64()),
            }
        )

    rows = _sketch_tree_reduce(
        _read(sf_dir, "documents")
        .select_columns(["n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_rows,
    )
    est, err = SK.rank_quantiles(
        [np.frombuffer(r["means"], dtype=np.float64) for r in rows],
        [np.frombuffer(r["weights"], dtype=np.int64) for r in rows],
        [float(r["err"]) for r in rows],
        [0.5, 0.9, 0.99],
    )
    return pd.DataFrame(
        {
            "p50": [est[0]],
            "p90": [est[1]],
            "p99": [est[2]],
            "max_rank_err": [err],
        }
    )


# --------------------------------------------------------------------------
# semi-join / anti-join / keyed range join — the three join shapes the suite
# did not yet exercise as first-class distributed operators (TPC-H Q4 is the
# semi-join archetype; the anti-join is its complement; the range join is
# the interval-predicate member of the custom-join family next to
# events_orders_asof). Reference analogue for all three: the delta
# anti-join classes of improved_faiss_detector.py:269-295, generalized.
# --------------------------------------------------------------------------


def orders_bulk_semijoin(sf_dir: str, min_qty: float = 45.0):
    """Orders with AT LEAST ONE lineitem above ``min_qty``, counted per
    o_orderpriority (TPC-H Q4 shape = EXISTS semi-join). Scale plan: the
    fact side collapses to DISTINCT qualifying orderkeys before anything
    moves (per-block unique inside map_batches, then a narrow one-column
    groupby — the combiner pattern), and the orders side joins via the
    hash-partitioned ``Dataset.join``; neither side is ever broadcast, so
    both sides may be corpus-sized."""
    from ray.data.aggregate import Count

    def qual_keys(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_orderkey": pa.array(np.unique(k[q > min_qty]), type=pa.int64())})

    qual = (
        _read(sf_dir, "lineitem")
        .select_columns(["l_orderkey", "l_quantity"])
        .map_batches(qual_keys, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["l_orderkey"])
    )
    orders = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_orderpriority"])
    return _partial_groupby(
        orders.join(qual, "inner", 8, on=("o_orderkey",), right_on=("l_orderkey",)),
        ["o_orderpriority"],
        [("count", "", "n_orders")],
    )


def orders_bulk_antijoin(sf_dir: str, min_qty: float = 45.0):
    """Orders with NO lineitem above ``min_qty`` per priority (NOT EXISTS =
    anti-join), as ONE hash shuffle: tag-union the orders rows (side 0,
    carrying the priority) with the qualifying lineitem keys (side 1),
    shuffled on the coarse key ``splitmix64(orderkey) & (P-1)`` — never the
    raw orderkey, which would cost one Python call per order. Each partition
    task sorts by (key, side) and keeps order rows whose key segment holds
    no side-1 row, pre-counting per priority so the final groupby is
    priority-cardinality-small. Same machinery as events_orders_asof, with
    anti semantics."""
    from ray.data.aggregate import Sum

    parts = _coarse_parts()

    def prep_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(key, parts),
                "key": pa.array(key, type=pa.int64()),
                "o_orderpriority": batch["o_orderpriority"],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def prep_quals(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.unique(k[q > min_qty])  # local combiner; group does the rest
        return pa.table(
            {
                "_part": _coarse_part_col(k, parts),
                "key": pa.array(k, type=pa.int64()),
                "o_orderpriority": pa.array([""] * len(k), type=pa.string()),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    od = (
        _read(sf_dir, "orders")
        .select_columns(["o_orderkey", "o_orderpriority"])
        .map_batches(prep_orders, batch_format="pyarrow")
    )
    li = (
        _read(sf_dir, "lineitem")
        .select_columns(["l_orderkey", "l_quantity"])
        .map_batches(prep_quals, batch_format="pyarrow")
    )

    _PARTIAL = pa.schema([("o_orderpriority", pa.string()), ("n_orders", pa.int64())])

    def anti_part(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m == 0:
            return _PARTIAL.empty_table()
        key = group["key"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        prio = group["o_orderpriority"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side, prio = key[order], side[order], prio[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        has_qual = np.add.reduceat(side.astype(np.int64), starts) > 0
        keep_seg = np.repeat(~has_qual, np.diff(np.append(starts, m)))
        keep = keep_seg & (side == 0)
        if not keep.any():
            return _PARTIAL.empty_table()
        uniq, counts = np.unique(prio[keep], return_counts=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(uniq, type=pa.string()),
                "n_orders": pa.array(counts.astype(np.int64)),
            }
        )

    return _partial_groupby(
        od.union(li).groupby("_part").map_groups(anti_part, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("sum", "n_orders", "n_orders")],
    )


def events_signup_followups(sf_dir: str, window_hours: int = 6):
    """Keyed INTERVAL (range) join: for every signup event, the count and
    value-sum of the same user's events inside (ts, ts + window]. Composed
    as tag-union → one hash shuffle on user_id → per-group sort + two
    searchsorted edges (count = hi - lo; sum via prefix-sum difference) —
    the partitioning assumption is per-key locality, the same contract as
    events_orders_asof; no side is broadcast. The SQL twin is the interval
    LEFT JOIN with the identical open/closed edges.

    Scale shape: ONE hash exchange on the coarse key ``splitmix64(user_id)
    & (P-1)``; each partition task lexsorts by (user, ts) and answers every
    signup's (lo, hi] window edges at once via a merge-rank segmented
    searchsorted (``_seg_searchsorted_right``) — count = hi - lo, sum via a
    global prefix-sum difference. No per-user Python dispatch."""
    w_us = np.int64(window_hours) * 3_600_000_000
    p = _coarse_parts()

    _SCHEMA = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("n_follow", pa.int64()),
            ("follow_value", pa.float64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        key = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(key, p),
                "key": pa.array(key, type=pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"].cast(pa.int64()),
                "value": batch["value"].cast(pa.float64()),
                "is_signup": pa.array(et == "signup"),
            }
        )

    ev = (
        _read(sf_dir, "events")
        .select_columns(["user_id", "ts", "event_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
    )

    def followups_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        key = group["key"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        val = group["value"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        su = group["is_signup"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, key))
        key, ts, val, eid, su = key[order], ts[order], val[order], eid[order], su[order]
        csum = np.concatenate(([0.0], np.cumsum(val)))
        q_key, q_ts, q_id = key[su], ts[su], eid[su]
        lo = _seg_searchsorted_right(key, ts, q_key, q_ts)
        hi = _seg_searchsorted_right(key, ts, q_key, q_ts + w_us)
        return pa.table(
            {
                "event_id": pa.array(q_id, type=pa.int64()),
                "user_id": pa.array(q_key, type=pa.int64()),
                "n_follow": pa.array(hi - lo, type=pa.int64()),
                "follow_value": _round_col(csum[hi] - csum[lo], 2),
            }
        )

    return ev.groupby("_part").map_groups(followups_part, batch_format="pyarrow")


# --------------------------------------------------------------------------
# outer-join zero-fill, argmin join, grouped distinct-count, rollup — four
# more distributed shapes the suite did not yet exercise as first-class
# operators, each with a DuckDB oracle twin. All four keep the combiner
# discipline: per-block partials inside map_batches, then one narrow
# grouped exchange.
# --------------------------------------------------------------------------


def customers_order_fill(sf_dir: str):
    """Per c_mktsegment: customer count, INACTIVE customers (zero orders —
    the rows only an OUTER join can see), order count, and rounded spend.
    One tag-union hash shuffle: customer rows (side 0, carrying the
    segment) union per-block (custkey, n, spend) order partials (side 1);
    the per-key group fills missing order sides with zero — LEFT OUTER
    semantics without a broadcast, both sides corpus-sized. Reference
    analogue: the qrels ⋈ results eval join generalized (J4).

    Scale shape: ONE hash exchange on the coarse key ``splitmix64(custkey)
    & (P-1)``; each partition task lexsorts by (key, side) — customer row
    first in its segment — and fills every key's missing order side in one
    segmented ``reduceat`` pass, emitting per-SEGMENT partials so the final
    groupby is segment-cardinality-small. No per-customer Python dispatch."""
    from ray.data.aggregate import Sum

    parts = _coarse_parts()

    def prep_cust(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": _coarse_part_col(key, parts),
                "key": pa.array(key, type=pa.int64()),
                "c_mktsegment": batch["c_mktsegment"],
                "n": pa.array(np.zeros(n, dtype=np.int64)),
                "spend": pa.array(np.zeros(n, dtype=np.float64)),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(k, kind="stable")
        k, p = k[order], p[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        keys = k[starts]
        n = np.diff(np.r_[starts, len(k)])
        spend = np.add.reduceat(p, starts) if len(k) else np.empty(0)
        return pa.table(
            {
                "_part": _coarse_part_col(keys, parts),
                "key": pa.array(keys, type=pa.int64()),
                "c_mktsegment": pa.array([""] * len(keys), type=pa.string()),
                "n": pa.array(n.astype(np.int64)),
                "spend": pa.array(spend, type=pa.float64()),
                "side": pa.array(np.ones(len(keys), dtype=np.int8)),
            }
        )

    cust = (
        _read(sf_dir, "customer")
        .select_columns(["c_custkey", "c_mktsegment"])
        .map_batches(prep_cust, batch_format="pyarrow")
    )
    orders = (
        _read(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(prep_orders, batch_format="pyarrow")
    )

    _PARTIAL = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("n_customers", pa.int64()),
            ("n_inactive", pa.int64()),
            ("n_orders_sum", pa.int64()),
            ("total_spend", pa.float64()),
        ]
    )

    def fill_part(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m == 0:
            return _PARTIAL.empty_table()
        key = group["key"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        spend = group["spend"].to_numpy(zero_copy_only=False)
        seg_col = group["c_mktsegment"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side, n, spend, seg_col = (
            key[order], side[order], n[order], spend[order], seg_col[order]
        )
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        has_cust = side[starts] == 0  # customer row sorts first in its key
        n_ord = np.add.reduceat(n, starts)
        spend_tot = np.add.reduceat(spend, starts)
        # keys without a customer row are inner-dropped (orphan orders)
        keep = np.flatnonzero(has_cust)
        seg = seg_col[starts[keep]]
        n_ord, spend_tot = n_ord[keep], spend_tot[keep]
        # per-segment partials (segments are low-cardinality)
        uniq, inv = np.unique(seg, return_inverse=True)
        return pa.table(
            {
                "c_mktsegment": pa.array(uniq, type=pa.string()),
                "n_customers": pa.array(np.bincount(inv).astype(np.int64)),
                "n_inactive": pa.array(
                    np.bincount(inv, weights=(n_ord == 0)).astype(np.int64)
                ),
                "n_orders_sum": pa.array(
                    np.bincount(inv, weights=n_ord).astype(np.int64)
                ),
                "total_spend": pa.array(
                    np.bincount(inv, weights=spend_tot), type=pa.float64()
                ),
            }
        )

    ds = _partial_groupby(
        cust.union(orders).groupby("_part").map_groups(fill_part, batch_format="pyarrow"),
        ["c_mktsegment"],
        [
            ("sum", "n_customers", "n_customers"),
            ("sum", "n_inactive", "n_inactive"),
            ("sum", "n_orders_sum", "n_orders_sum"),
            ("sum", "total_spend", "total_spend"),
        ],
    )
    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total_spend"),
            "total_spend",
            _round_col(t["total_spend"].to_numpy(zero_copy_only=False), 2),
        ),
        batch_format="pyarrow",
    )


def part_cheapest_lineitem(sf_dir: str):
    """Per l_partkey: the lexicographically smallest (extendedprice,
    suppkey, orderkey, linenumber) lineitem — the ARGMIN-join shape (TPC-H
    Q2's min-supplycost-per-part core). Per-block combiner: np.lexsort +
    first-per-key keeps one candidate row per (partkey, block), so the
    grouped exchange carries at most one row per part per block; the
    exchange groups on the coarse key ``splitmix64(partkey) & (P-1)``
    (never the raw partkey — one Python call per PARTITION, not per part)
    and each partition task repeats the same segmented lexicographic min
    over all its parts at once. Fully tie-broken, so the hash gate is
    exact."""
    p = _coarse_parts()

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ln, ok, sk, price, pk))
        pk, price, sk, ok, ln = (a[order] for a in (pk, price, sk, ok, ln))
        first = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        pk = pk[first]
        return pa.table(
            {
                "_part": _coarse_part_col(pk, p),
                "l_partkey": pa.array(pk),
                "min_price": pa.array(price[first], type=pa.float64()),
                "l_suppkey": pa.array(sk[first]),
                "l_orderkey": pa.array(ok[first]),
                "l_linenumber": pa.array(ln[first]),
            }
        )

    _SCHEMA = pa.schema(
        [
            ("l_partkey", pa.int64()),
            ("min_price", pa.float64()),
            ("l_suppkey", pa.int64()),
            ("l_orderkey", pa.int64()),
            ("l_linenumber", pa.int64()),
        ]
    )

    def reduce_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SCHEMA.empty_table()
        pk = group["l_partkey"].to_numpy(zero_copy_only=False)
        price = group["min_price"].to_numpy(zero_copy_only=False)
        sk = group["l_suppkey"].to_numpy(zero_copy_only=False)
        ok = group["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = group["l_linenumber"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, ok, sk, price, pk))
        pk, price, sk, ok, ln = (a[order] for a in (pk, price, sk, ok, ln))
        first = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        return pa.table(
            {
                "l_partkey": pa.array(pk[first], type=pa.int64()),
                "min_price": pa.array(price[first], type=pa.float64()),
                "l_suppkey": pa.array(sk[first], type=pa.int64()),
                "l_orderkey": pa.array(ok[first], type=pa.int64()),
                "l_linenumber": pa.array(ln[first], type=pa.int64()),
            }
        )

    return (
        _read(sf_dir, "lineitem")
        .select_columns(
            ["l_partkey", "l_extendedprice", "l_suppkey", "l_orderkey", "l_linenumber"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def events_daily_distinct_users(sf_dir: str):
    """Per day: COUNT(DISTINCT user_id) + total events — the grouped
    distinct-count exchange. Per-block combiner dedups (day, user) pairs
    and pre-sums the event count, the narrow (day, user) groupby finishes
    the dedup, and a second tiny groupby per day counts the survivors; the
    exchange is bounded by distinct (day, user) pairs, never raw events."""
    from ray.data.aggregate import Count, Sum

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)  # us
        day = (ts // 86_400_000_000) * 86400
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([day, uid], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "day_epoch": pa.array(uniq[:, 0], type=pa.int64()),
                "user_id": pa.array(uniq[:, 1], type=pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    return _partial_groupby(
        _read(sf_dir, "events")
        .select_columns(["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["day_epoch", "user_id"])
        .aggregate(Sum("n", alias_name="n_ev")),
        ["day_epoch"],
        [("count", "", "n_users"), ("sum", "n_ev", "n_events")],
    )


def parts_rollup(sf_dir: str):
    """ROLLUP (p_brand, p_type): part counts + rounded avg retail price at
    three grouping levels, coarser levels derived by RE-AGGREGATING the
    finest level's (count, sum) partials — the classic rollup-from-partials
    plan, so the corpus is scanned once and the extra levels cost only the
    domain-bounded finest table. 'ALL' marks the rolled-up column (DuckDB
    ROLLUP emits NULL; both sides coalesce to 'ALL' for the hash gate)."""
    finest = _partial_groupby(
        _read(sf_dir, "part").select_columns(["p_brand", "p_type", "p_retailprice"]),
        ["p_brand", "p_type"],
        [("count", "", "n"), ("sum", "p_retailprice", "s")],
    ).to_pandas()  # domain-bounded: |brands| x |types| rows
    brand = finest.groupby("p_brand", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    brand["p_type"] = "ALL"
    total = pd.DataFrame(
        {"p_brand": ["ALL"], "p_type": ["ALL"], "n": [finest["n"].sum()], "s": [finest["s"].sum()]}
    )
    out = pd.concat([finest, brand, total], ignore_index=True)
    avg = np.asarray(out["s"], dtype=np.float64) / np.asarray(out["n"], dtype=np.float64)
    p = 100.0
    out["avg_price"] = np.copysign(np.floor(np.abs(avg) * p + 0.5) / p, avg)
    out["n_parts"] = out["n"].astype("int64")
    return out[["p_brand", "p_type", "n_parts", "avg_price"]]


def docs_stratified_sample(sf_dir: str, k: int = 20, seed: int = 42):
    """Seeded deterministic stratified (per-group quota) sample — the data
    mixing / eval-subset op of corpus curation: the ``k`` docs per language
    with the smallest md5("s{seed}:" + doc_id) rank keys, i.e. a uniform
    seeded sample that is identical at any parallelism or cluster size
    (reference O5's seeded sampling, benchmark_bm25.py:19, made
    reproducible and distributed). The per-group k-smallest set is a
    MERGEABLE bounded summary: every block emits at most n_groups*k rows,
    partials combine through fanout-bounded repartition rounds (the
    partial_groupby discipline), so neither the exchange nor driver traffic
    grows with the corpus — only with n_groups*k. Exact DuckDB
    ROW_NUMBER() twin gated in tests/test_queries_extra.py."""
    import hashlib

    FANOUT = 64

    def k_smallest(batch: pa.Table, final: bool = False) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rk = batch["rk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, rk, lang))
        lang, ids, rk = lang[order], ids[order], rk[order]
        starts = np.flatnonzero(np.r_[True, lang[1:] != lang[:-1]])
        rank = np.arange(len(lang)) - np.repeat(starts, np.diff(np.r_[starts, len(lang)]))
        keep = rank < k
        cols = {
            "lang": pa.array(lang[keep], type=pa.string()),
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "rk": pa.array(rk[keep], type=pa.string()),
        }
        if final:
            cols["sample_rank"] = pa.array((rank[keep] + 1).astype(np.int64))
        return pa.table(cols)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rk = [hashlib.md5(f"s{seed}:{i}".encode()).hexdigest() for i in ids]
        t = pa.table(
            {
                "lang": batch["lang"],
                "doc_id": pa.array(ids, type=pa.int64()),
                "rk": pa.array(rk, type=pa.string()),
            }
        )
        return k_smallest(t)

    parts = (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "lang"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    nb = parts.num_blocks()
    while nb > 1:
        parts = (
            parts.repartition(max(1, -(-nb // FANOUT)))
            .map_batches(k_smallest, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        new_nb = parts.num_blocks()
        if new_nb >= nb:
            break
        nb = new_nb
    tabs = [t for t in (ray.get(r) for r in parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.schema(
            [("lang", pa.string()), ("doc_id", pa.int64()), ("sample_rank", pa.int64())]
        ).empty_table()
    out = k_smallest(pa.concat_tables(tabs), final=True)
    return out.select(["lang", "doc_id", "sample_rank"])


def docs_ppl_buckets(sf_dir: str, lam: float = 0.8, V1: int = 1 << 16, V2: int = 1 << 18):
    """CCNet-style perplexity tertiles (Wenzek et al. 2019,
    arXiv:1911.00359 §4.3) — fit a hashed interpolated bigram LM on the
    corpus (two fixed-size integer tree-reduces, bit-identical at any
    parallelism), score every doc's mean token NLL in one broadcast scan,
    and bucket into head/middle/tail by EXACT quantized-histogram tertile
    cutoffs (no sketch, no sample; stages/ngramlm.py). The quality gate
    CommonCrawl curation runs between dedup and release; reference parity:
    improved_faiss_detector.py's per-file score-threshold filters. Pure-
    python LM/score oracle gated in tests/test_ngramlm.py."""
    from imagededupx_ray.stages.ngramlm import (
        bigram_lm_counts,
        bigram_logppl,
        ppl_bucket,
        ppl_cutoffs,
    )

    docs = _read(sf_dir, "documents")
    counts = bigram_lm_counts(docs, V1, V2)
    scores = bigram_logppl(docs, counts, lam=lam).materialize()
    cutoffs = ppl_cutoffs(scores)
    return ppl_bucket(scores, cutoffs)


def docs_dsir_weights(sf_dir: str, target_lang: str | None = None, vocab: int = 4096):
    """DSIR importance-resampling weights (Xie et al. 2023,
    arXiv:2302.03169) — score every doc by hashed-ngram target-vs-raw
    log-likelihood ratio, the data-SELECTION op of pre-training pipelines.
    Target domain = the corpus' most frequent language (or
    ``target_lang``); raw = everything. Two integer count tree-reduces +
    one broadcast scan (stages/dsir.py); per-doc sums are flat-order
    deterministic, so the suite md5 is stable. Pure-python model/weight
    oracle gated in tests/test_dsir.py."""
    from imagededupx_ray.stages.dsir import dsir_counts, dsir_weights

    docs = _read(sf_dir, "documents")
    if target_lang is None:
        langs = _partial_groupby(
            docs.select_columns(["lang"]), ["lang"], [("count", "lang", "n")]
        ).to_pandas()
        if len(langs) == 0:
            return docs.select_columns(["doc_id"]).map_batches(
                lambda t: pa.table(
                    {
                        "doc_id": t["doc_id"],
                        "logw": pa.nulls(0, pa.float64()),
                        "logw_sum": pa.nulls(0, pa.float64()),
                    }
                ),
                batch_format="pyarrow",
            )
        target_lang = langs.sort_values(["n", "lang"], ascending=[False, True])[
            "lang"
        ].iloc[0]
    target = docs.filter(expr=f"lang == '{target_lang}'")
    t_counts = dsir_counts(target, V=vocab)
    r_counts = dsir_counts(docs, V=vocab)
    return dsir_weights(docs, t_counts, r_counts)


_JUNK_VOCAB = np.array(
    ["zx%02dq" % i for i in range(64)], dtype=object
)  # 64 gibberish tokens disjoint from any real corpus vocabulary


def docs_quality_classifier(
    sf_dir: str,
    V: int = 4096,
    iters: int = 80,
    holdout_mod: int = 5,
    junk_tokens: int = 40,
):
    """Fasttext-style learned quality filter (Joulin et al. 2016,
    arXiv:1607.01759; the GPT-3 / LLaMA "quality classifier" stage): train
    stages/qualityclf's hashed-ngram logistic model to separate clean pages
    from junk, then score the whole corpus in one broadcast scan. The junk
    class is PLANTED deterministically (odd-doc_id docs get their text
    replaced by seeded gibberish drawn from a disjoint 64-token vocabulary
    — the spam/boilerplate class a production filter separates; the suite's
    planting pattern, like pages_url_dedup's recrawls), the fit sees only
    ``doc_id % holdout_mod != 0``, and _component_ok requires >= 0.9
    accuracy on the held-out docs — evidence the TRAINED model, not a rule,
    does the separating. Training is full-batch Adagrad over exact
    fixed-point int64 gradient tree-reduces (bit-identical fit at any
    parallelism — stages/qualityclf docstring). Output: (doc_id, prob
    [6dp], pred, label, holdout). Planted-separation / bit-parity / oracle
    gates live in tests/test_qualityclf.py."""
    from imagededupx_ray.functions.hashing import splitmix64
    from imagededupx_ray.stages.qualityclf import (
        fit_quality_classifier,
        score_quality,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def label_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        junk = ids % 2 == 1
        texts = batch["text"]
        if junk.any():
            jn = int(junk.sum())
            # per-junk-doc gibberish: token i of doc d indexes the junk
            # vocabulary by splitmix64(d * 257 + i) — deterministic, no RNG
            base = np.repeat(ids[junk] * 257, junk_tokens) + np.tile(
                np.arange(junk_tokens, dtype=np.int64), jn
            )
            idx = (splitmix64(base.astype(np.uint64)) % np.uint64(64)).astype(
                np.int64
            )
            flat = pa.array(_JUNK_VOCAB[idx], type=pa.string())
            offs = pa.array(
                np.arange(jn + 1, dtype=np.int32) * junk_tokens, type=pa.int32()
            )
            junk_texts = pc.binary_join(
                pa.ListArray.from_arrays(offs, flat), " "
            ).to_numpy(zero_copy_only=False)
            out = texts.to_numpy(zero_copy_only=False).copy()
            out[junk] = junk_texts
            texts = pa.array(out, type=pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": texts,
                "label": pa.array((~junk).astype(np.int8)),
            }
        )

    labeled = docs.map_batches(label_batch, batch_format="pyarrow").materialize()

    def train_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % holdout_mod != 0))

    w = fit_quality_classifier(
        labeled.map_batches(train_rows, batch_format="pyarrow"), V=V, iters=iters
    )
    scored = score_quality(labeled, w)

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        prob = batch["prob"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "prob": batch["prob"],
                "pred": pa.array((prob >= 0.5).astype(np.int64)),
                "label": pc.cast(batch["label"], pa.int64()),
                "holdout": pa.array((ids % holdout_mod == 0).astype(np.int64)),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def _synth_pages_ds(n: int, seed: int, n_blocks: int = 16):
    """/tmp-cached synthetic pages corpus as a pinned-block Dataset (same
    caching discipline as the media corpora)."""
    from imagededupx_ray.util import cached_corpus_ds

    def build():
        import glob
        import tempfile

        import pyarrow.parquet as pq

        from imagededupx_ray.sources.synthetic import write_pages_corpus

        d = tempfile.mkdtemp()
        write_pages_corpus(d, n_pages=n, seed=seed)
        return pa.concat_tables(
            pq.read_table(f) for f in sorted(glob.glob(f"{d}/pages/*.parquet"))
        )

    return cached_corpus_ds(f"pages_n{n}_s{seed}_v1", build, n_blocks)


def pages_url_dedup(sf_dir: str, n: int = 800, seed: int = 42, n_recrawls: int = 50):
    """URL-canonicalization dedup over a synthetic pages corpus with
    ``n_recrawls`` planted tracked-url recrawls (same pages re-fetched
    under `?utm_source=...` urls — the canonical-form collapse case):
    output must hold exactly ``n`` rows with every recrawl url absent.
    Evidence row for the CC-pipeline pre-step; rule gates live in
    tests/test_urlfilter.py."""
    from imagededupx_ray.stages.urlfilter import url_dedup

    pages = _synth_pages_ds(n, seed)

    def recrawl(batch: pa.Table) -> pa.Table:
        k = min(n_recrawls, batch.num_rows)
        head = batch.slice(0, k)
        urls = pc.binary_join_element_wise(
            head["url"], pa.array(["?utm_source=recrawl"] * k), ""
        )
        return head.set_column(head.column_names.index("url"), "url", urls)

    dups = pages.map_batches(recrawl, batch_format="pyarrow").limit(n_recrawls)
    out = url_dedup(pages.union(dups))
    df = (
        out.select_columns(["url", "canonical_url"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert not df["url"].str.contains("utm_source=recrawl").any()
    return df


def pages_domain_cap(sf_dir: str, n: int = 800, seed: int = 42, max_per_host: int = 20):
    """Per-domain volume cap over a synthetic pages corpus (the hot
    'boiler' site holds every boilerplate page, far above the cap): keep at
    most ``max_per_host`` pages per url host, earliest crawl first
    (stages/urlfilter.host_cap — one coarse hash(host) exchange). Evidence
    row = per-host attrition (host, n_in, n_kept), host domain bounded by
    the corpus's site count; the keep-rule's ROW_NUMBER DuckDB twin gates
    in tests/test_urlfilter.py."""
    from imagededupx_ray.stages.urlfilter import extract_hosts, host_cap
    from imagededupx_ray.util import partial_groupby

    pages = _synth_pages_ds(n, seed)

    def host_col(t: pa.Table) -> pa.Table:
        return pa.table({"host": extract_hosts(t["url"])})

    def counts(ds, alias):
        return partial_groupby(
            ds.map_batches(host_col, batch_format="pyarrow"),
            ["host"],
            [("count", "host", alias)],
        ).to_pandas()

    kept = host_cap(pages, max_per_host).materialize()
    df = counts(pages, "n_in").merge(counts(kept, "n_kept"), on="host", how="left")
    df["n_kept"] = df["n_kept"].fillna(0).astype(np.int64)
    assert (df["n_kept"] <= max_per_host).all() and (df["n_kept"] <= df["n_in"]).all()
    assert (df["n_in"] > max_per_host).any(), "corpus must plant a hot host"
    return df.sort_values("host").reset_index(drop=True)


def pages_snapshot_dup_report(sf_dir: str, n: int = 1200, seed: int = 6):
    """Cross-snapshot duplicate attribution over a synthetic multi-snapshot
    crawl (FineWeb's finding, Penedo et al. 2024 §3.1: web duplicates live
    mostly ACROSS crawl snapshots): run the flagship dedup pipeline, attach
    each doc's crawl snapshot, and report per snapshot how many docs sit in
    a duplicate cluster and how many of those clusters span snapshots.

    The corpus's planted truth makes the attribution checkable: the
    generator puts the LAST member of every >= 3-member dup group in
    snapshot 1 and the rest in snapshot 0 (sources/synthetic.py), so every
    snapshot-1 dup is cross-snapshot while snapshot 0 keeps within-snapshot
    dups (2-member groups) too — _component_ok asserts exactly that.

    Scale shape: snapshot attach is the broadcast/union-exchange
    ``_attach_dim`` crossover on doc_id; attribution is one coarse
    hash(cluster_id) exchange + bounded-key partial groupby
    (stages/dedup.snapshot_dup_attribution). DuckDB window twin:
    tests/test_snapshot_attribution.py."""
    from imagededupx_ray.pipelines.dedup import run_dedup
    from imagededupx_ray.stages.dedup import snapshot_dup_attribution
    from imagededupx_ray.stages.extract import _hash64_column

    pages = _synth_pages_ds(n, seed)
    res = run_dedup(pages, DEFAULT_CONFIG)

    def snap_rows(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        return pa.table(
            {
                "doc_id": pa.array(_hash64_column(url), type=pa.int64()),
                "snapshot": batch["snapshot"].cast(pa.int64()),
            }
        )

    assign = _attach_dim(
        res.clusters.select_columns(["doc_id", "cluster_id"]),
        pages.map_batches(snap_rows, batch_format="pyarrow"),
        "doc_id",
        "doc_id",
        "snapshot",
        "snapshot",
    )
    rep = snapshot_dup_attribution(assign).to_pandas()
    return rep.sort_values("snapshot").reset_index(drop=True)


def docs_softdedup_weights(sf_dir: str):
    """Soft dedup over the flagship near-dup clusters: every member of a
    k-doc duplicate community gets sampling weight 1/k (downweight instead
    of drop — each community contributes one doc-equivalent to the training
    mix; see stages/dedup.softdedup_weights for the scale shape: one
    coarse hash(cluster_id) exchange, no driver aggregate). Rows-only —
    weight/cluster-size identities gate in _component_ok and
    tests/test_softdedup.py (planted groups + window-COUNT DuckDB twin)."""
    from imagededupx_ray.stages.dedup import softdedup_weights

    clusters = _run_dedup_cached(sf_dir, DEFAULT_CONFIG).clusters
    out = softdedup_weights(
        clusters.select_columns(["doc_id", "cluster_id"])
    ).to_pandas()
    return out.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)


def docs_topic_clusters(sf_dir: str, k: int = 8, n_iter: int = 10):
    """Corpus topic clustering for training-mix analysis: distributed
    spherical k-means over the embeddings table (stages/kmeans.py — one
    fixed-size k x d tree-reduced partial per iteration, one assignment
    scan; nothing corpus-sized ever reaches the driver). Evidence row =
    the k-row cluster report (n_members, mean cosine to centroid),
    canonically relabeled by (size desc, mean_sim) so label permutation
    across environments cannot move the md5; Lloyd/recovery gates live in
    tests/test_kmeans.py."""
    from imagededupx_ray.stages.kmeans import kmeans_assign, kmeans_fit_distributed
    from imagededupx_ray.util import partial_groupby

    emb = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    centroids, history = kmeans_fit_distributed(emb, n_clusters=k, n_iter=n_iter)
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:])), history
    assigned = kmeans_assign(emb, centroids)
    rep = partial_groupby(
        assigned,
        ["cluster"],
        [("count", "cluster", "n_members"), ("mean", "sim", "mean_sim")],
    ).to_pandas()
    rep["mean_sim"] = rep["mean_sim"].round(3)
    rep = (
        rep.sort_values(["n_members", "mean_sim"], ascending=[False, True])
        .reset_index(drop=True)
        .drop(columns=["cluster"])
    )
    rep.insert(0, "cluster_rank", np.arange(len(rep), dtype=np.int64))
    return rep


def corpus_refine_report(sf_dir: str, n: int = 800, seed: int = 42):
    """End-to-end corpus-refinement ATTRITION REPORT (pipelines/refine.py):
    url dedup → extract → line boilerplate dedup → quality filter → dedup
    tiers → decontamination, over a synthetic pages corpus with every
    failure mode planted so each stage shows real attrition — 40 tracked-url
    recrawls (url tier), a nav paragraph prepended and a copyright footer
    appended to EVERY page plus 60 boilerplate-only pages (line tier: the
    shared paragraphs span all docs and are removed; the boilerplate-only
    pages fall under the 30 % retention rule), a min-token quality floor the
    corpus's short tail fails, and a 40-page held-out slice re-urled as the
    contamination target. All-integer rows (stage, docs_in, docs_out,
    removed); stage semantics gated in tests/test_refine.py."""
    from imagededupx_ray.pipelines.refine import refine_corpus

    pages = _synth_pages_ds(n, seed)
    NAV = "site nav home about contact"
    FOOT = "copyright footer example site all rights reserved"

    def plant(batch: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            pa.scalar(NAV + " . "), batch["text"], pa.scalar(" . " + FOOT), ""
        )
        out = batch.set_column(batch.column_names.index("text"), "text", text)
        # extraction prefers html; null it so the planted text IS the doc
        return out.set_column(
            out.column_names.index("html"),
            "html",
            pa.nulls(batch.num_rows, pa.binary()),
        )

    planted = pages.map_batches(plant, batch_format="pyarrow")

    def recrawl(batch: pa.Table) -> pa.Table:
        k = min(40, batch.num_rows)
        head = batch.slice(0, k)
        urls = pc.binary_join_element_wise(
            head["url"], pa.array(["?utm_source=recrawl"] * k), ""
        )
        return head.set_column(head.column_names.index("url"), "url", urls)

    recrawls = planted.map_batches(recrawl, batch_format="pyarrow").limit(40)

    def boiler_only(batch: pa.Table) -> pa.Table:
        k = min(60, batch.num_rows)
        head = batch.slice(0, k)
        urls = pc.binary_join_element_wise(
            pa.array([f"http://boiler.example/{i:04d}-" for i in range(k)]),
            head["url"],
            "",
        )
        n_rows = len(urls)
        return pa.table(
            {
                "url": urls,
                "warc_ts": head["warc_ts"],
                "html": pa.nulls(n_rows, pa.binary()),
                "text": pa.array([f"{NAV} . only{i} . {FOOT}" for i in range(k)]),
                "lang": head["lang"],
                "snapshot": head["snapshot"],
            }
        )

    boiler = planted.map_batches(boiler_only, batch_format="pyarrow").limit(60)

    def heldout(batch: pa.Table) -> pa.Table:
        k = min(40, batch.num_rows)
        head = batch.slice(40, k)  # distinct from the recrawl rows
        urls = pc.binary_join_element_wise(
            pa.array(["http://heldout.example/"] * len(head["url"])), head["url"], ""
        )
        return head.set_column(head.column_names.index("url"), "url", urls)

    held = planted.map_batches(heldout, batch_format="pyarrow").limit(40)

    _, report = refine_corpus(
        planted.union(recrawls).union(boiler),
        line_min_doc_rep=30,
        quality_kwargs={"min_tok": 70},
        decontam_ds=held,
    )
    return report.astype(
        {"docs_in": "int64", "docs_out": "int64", "removed": "int64"}
    )


def cross_dedup_report(sf_dir: str, n_a: int = 600, n_b: int = 200):
    """Cross-corpus decontamination report (pipelines/cross.py) over two
    synthetic pages corpora with different seeds — one (metric, value)
    evidence row per bounded count; semantics gates live in
    tests/test_cross.py."""
    from imagededupx_ray.pipelines.cross import cross_dedup

    _, report = cross_dedup(
        _synth_pages_ds(n_a, 42), _synth_pages_ds(n_b, 9, n_blocks=8)
    )
    return pd.DataFrame(
        sorted(report.items()), columns=["metric", "value"]
    ).astype({"value": "int64"})


def corpus_datasheet(sf_dir: str):
    """Corpus DATASHEET — the summary-statistics table a released corpus
    publishes (Datasheets for Datasets, Gebru et al. 2021): doc/lang/token/
    char totals, exact-distinct content count, quality keep-rate, and
    top-language share, as (metric, value) rows. Composition of the repo's
    bounded shapes only: one keyless partial_groupby scan for the totals
    (token counts + quality flags + chars in a single tokenized pass), one
    bounded-key partial_groupby for languages, and one narrow md5 sort-
    shuffle for the exact distinct count — nothing corpus-sized reaches
    the driver. Exact DuckDB twin gated in tests/test_queries_extra.py."""
    from imagededupx_ray.functions.textstats import content_md5

    def partial(batch: pa.Table) -> pa.Table:
        _, offsets = tokenize_batch(batch["text"])
        n_tok = np.diff(offsets).astype(np.int64)
        chars = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], type=pa.int64()),
                "total_tokens": pa.array([int(n_tok.sum())], type=pa.int64()),
                "total_chars": pa.array([int(chars.sum())], type=pa.int64()),
            }
        )

    totals = (
        _partial_groupby(
            _read(sf_dir, "documents")
            .select_columns(["text"])
            .map_batches(partial, batch_format="pyarrow"),
            [],
            [
                ("sum", "n_docs", "n_docs"),
                ("sum", "total_tokens", "total_tokens"),
                ("sum", "total_chars", "total_chars"),
            ],
        )
        .to_pandas()
        .iloc[0]
    )

    langs = _partial_groupby(
        _read(sf_dir, "documents").select_columns(["lang"]),
        ["lang"],
        [("count", "lang", "n")],
    ).to_pandas()

    def md5_col(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"md5": pa.array(content_md5(batch["text"].to_pylist()), type=pa.string())}
        )

    n_distinct = (
        _read(sf_dir, "documents")
        .select_columns(["text"])
        .map_batches(md5_col, batch_format="pyarrow")
        .groupby("md5")
        .count()
        .count()
    )

    keep = docs_quality_verdicts(sf_dir)
    n_keep = keep.filter(expr="keep == True").count()

    n = float(totals["n_docs"])
    rows = [
        ("n_docs", n),
        ("n_langs", float(len(langs))),
        ("total_tokens", float(totals["total_tokens"])),
        ("total_chars", float(totals["total_chars"])),
        ("n_distinct_texts", float(n_distinct)),
        ("exact_dup_rate", round(1.0 - n_distinct / max(n, 1.0), 6)),
        ("quality_keep_rate", round(n_keep / max(n, 1.0), 6)),
        ("top_lang_share", round(float(langs["n"].max()) / max(n, 1.0), 6) if len(langs) else 0.0),
    ]
    return pd.DataFrame(rows, columns=["metric", "value"])


def docs_chunk(sf_dir: str, chunk: int = 64, overlap: int = 8):
    """Context-window CHUNKING — split every doc into ``chunk``-token
    windows advancing by stride = chunk - overlap (the training-data prep
    step before tokenized packing; each window keeps ``overlap`` tokens of
    left context). Row-EXPANDING per-batch map, fully vectorized: chunk
    token indices are built with repeat/cumsum arithmetic and gathered from
    the flat token array into a ListArray joined per chunk — no per-doc or
    per-chunk Python loop. Emits (doc_id, chunk_idx, n_tokens, chunk_text)
    over normalized tokens; chunk count for n tokens =
    1 + ceil(max(0, n - chunk) / stride) for non-empty docs (ADVICE r4: the
    old ceil(n / stride) emitted a final window fully contained in its
    predecessor whenever the tail length <= overlap, duplicating tail
    tokens as a standalone training chunk). Exact DuckDB generate_series +
    list_slice twin gated in tests/test_queries_extra.py."""
    assert 0 <= overlap < chunk
    stride = chunk - overlap

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_batch(batch["text"])
        n_tok = np.diff(offsets).astype(np.int64)
        # 0 chunks for empty docs; else no window may be a subset of the
        # previous one: last start must be < n - overlap (i.e. the final
        # window contributes at least one token beyond the shared overlap)
        counts = np.where(n_tok == 0, 0, 1 + -(-np.maximum(n_tok - chunk, 0) // stride))
        total = int(counts.sum())
        if total == 0:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("chunk_idx", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("chunk_text", pa.string()),
                ]
            ).empty_table()
        doc_rep = np.repeat(np.arange(batch.num_rows), counts)
        chunk_idx = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        start = chunk_idx * stride  # within-doc token start
        doc_n = n_tok[doc_rep]
        length = np.minimum(start + chunk, doc_n) - start
        # gather flat token indices: doc base offset + start + arange(length)
        base = offsets[:-1].astype(np.int64)[doc_rep] + start
        idx = np.repeat(base, length) + (
            np.arange(int(length.sum()))
            - np.repeat(np.concatenate([[0], np.cumsum(length)[:-1]]), length)
        )
        chunk_offsets = np.concatenate([[0], np.cumsum(length)]).astype(np.int32)
        toks = pc.take(flat, pa.array(idx, type=pa.int64()))
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(chunk_offsets), toks), " "
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_rep], type=pa.int64()),
                "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
                "n_tokens": pa.array(length, type=pa.int64()),
                "chunk_text": text,
            }
        )

    return (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
    )


_PACK_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("bin_id", pa.int64())]
)


@ray.remote
def _block_tok_sum(t: pa.Table) -> int:
    # Ray skips the count UDF on 0-row blocks, so empties may lack the column
    if t.num_rows == 0 or "n_tokens" not in t.column_names:
        return 0
    return int(np.sum(t["n_tokens"].to_numpy(zero_copy_only=False)))


@ray.remote
def _pack_assign(t: pa.Table, offset: int, budget: int) -> pa.Table:
    if t.num_rows == 0 or "n_tokens" not in t.column_names:
        return _PACK_SCHEMA.empty_table()
    n_tok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum_before = offset + np.cumsum(n_tok) - n_tok
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "bin_id": pa.array(cum_before // budget),
        }
    )


def docs_pack_bins(sf_dir: str, budget: int = 2048):
    """Token-budget sequence packing — the shard/bin assignment step before
    tokenized training export: docs in deterministic doc_id order
    accumulate whitespace-token counts and each doc lands in the bin where
    its run starts (bin_id = floor(tokens_before_doc / budget)); identical
    at any parallelism. Scale shape = a distributed PREFIX-SUM scan: one
    narrow (doc_id, n_tokens) pass, a Ray range sort on doc_id, per-block
    token sums to the driver (BLOCK-COUNT-bounded, not corpus-bounded), an
    exclusive prefix over those P sums, and a per-block assignment task —
    the only all-to-all is the sort itself. Exact DuckDB window twin
    (SUM OVER ORDER BY ROWS UNBOUNDED PRECEDING) gated in
    tests/test_queries_extra.py."""

    def count(batch: pa.Table) -> pa.Table:
        _, offsets = tokenize_batch(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(np.diff(offsets).astype(np.int64)),
            }
        )

    ds = (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(count, batch_format="pyarrow")
        .sort("doc_id")
        .materialize()
    )
    refs = ds.to_arrow_refs()
    if not refs:
        return rd.from_arrow(_PACK_SCHEMA.empty_table())
    sums = ray.get([_block_tok_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums[:-1])]) if sums else np.array([0])
    out = [
        _pack_assign.remote(r, int(off), int(budget))
        for r, off in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(out)


def docs_train_test_split(sf_dir: str, test_pct: int = 10):
    """Deterministic content-keyed train/test split — the assignment every
    training-data pipeline needs before anything downstream: split(doc) =
    'test' iff the first 8 hex digits of md5(text) mod 100 < ``test_pct``.
    Content-keyed (not row-keyed) so exact duplicates always land in the
    SAME split (no train/test leakage through dup pairs), reproducible at
    any parallelism and cluster size, and embarrassingly parallel — one
    stateless map_batches, no exchange. Output: per (split, lang) doc
    counts + mean length. The SQL twin computes the identical md5 bucket,
    so the gate is exact."""
    from ray.data.aggregate import Count, Mean

    from imagededupx_ray.functions.textstats import content_md5

    def assign(batch: pa.Table) -> pa.Table:
        md5s = content_md5(batch["text"].to_pylist())
        bucket = np.array([int(m[:8], 16) % 100 for m in md5s], dtype=np.int64)
        split = np.where(bucket < test_pct, "test", "train")
        return pa.table(
            {
                "split": pa.array(split, type=pa.string()),
                "lang": batch["lang"],
                "n_chars": batch["n_chars"],
            }
        )

    ds = _partial_groupby(
        _read(sf_dir, "documents")
        .select_columns(["text", "lang", "n_chars"])
        .map_batches(assign, batch_format="pyarrow"),
        ["split", "lang"],
        [("count", "", "n_docs"), ("mean", "n_chars", "avg_chars")],
    )
    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("avg_chars"),
            "avg_chars",
            _round_col(t["avg_chars"].to_numpy(zero_copy_only=False), 4),
        ),
        batch_format="pyarrow",
    )


def docs_decontaminate(sf_dir: str, k: int = 5, bench_mod: int = 97):
    """Benchmark decontamination — flag every document that shares ANY
    k-token shingle with a held-out benchmark set (here: the deterministic
    ``doc_id % bench_mod == 0`` subset standing in for an eval suite). This
    is the pre-training hygiene op every LLM data pipeline runs before
    training (shingle-overlap decontamination à la GPT-3 appendix C).

    Scale shape: benchmark suites are small and FIXED (eval sets, not the
    corpus), so their distinct shingle-hash set is a broadcast — ``ray.put``
    once, ``searchsorted`` membership inside one stateless narrow scan of the
    corpus. No shuffle at any size; the corpus never materializes. The
    shingle kernel is the same vectorized sliding-window polynomial the
    MinHash tier uses (functions/hashing.py), with the short-doc fallback
    disabled so docs under k tokens contribute nothing (matching the SQL
    twin's ``len(ts) >= k`` guard). Reference analogue: qrels-join eval
    (similarities/similarities/evaluation.py) — same broadcast-small-side
    pattern.

    Output: one row per NON-benchmark doc — distinct overlapping shingle
    count + a 0/1 contaminated flag (ints on both sides so the driver's
    value-hash is stable)."""

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def _plain_shingles(texts: pa.Array):
        """(flat shingle u64 hashes, per-doc counts) with NO short-doc fallback."""
        flat, offsets = tokenize_batch(texts)
        th = H.token_hash_flat(flat)
        sh, counts = H.shingle_hashes(th, offsets, k)
        m = np.diff(offsets)
        short = (m > 0) & (m < k)
        if short.any():
            sh = sh[np.repeat(~short, counts)]
            counts = np.where(short, 0, counts)
        return sh, counts.astype(np.int64)

    def bench_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % bench_mod == 0))
        if sub.num_rows == 0:
            return pa.table({"sh": pa.array([], type=pa.uint64())})
        sh, _ = _plain_shingles(sub["text"])
        return pa.table({"sh": pa.array(np.unique(sh), type=pa.uint64())})

    bench_parts = docs.map_batches(bench_shingles, batch_format="pyarrow").take_all()
    bench_sorted = np.unique(
        np.concatenate([np.array([r["sh"] for r in bench_parts], dtype=np.uint64)])
        if bench_parts
        else np.empty(0, dtype=np.uint64)
    )
    bench_ref = ray.put(bench_sorted)

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % bench_mod != 0))
        n = sub.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_hit_shingles": pa.array([], type=pa.int64()),
                    "contaminated": pa.array([], type=pa.int64()),
                }
            )
        sh, counts = _plain_shingles(sub["text"])
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        if len(bench) and len(sh):
            pos = np.searchsorted(bench, sh)
            pos_c = np.minimum(pos, len(bench) - 1)
            hit = bench[pos_c] == sh
        else:
            hit = np.zeros(len(sh), dtype=bool)
        n_hits = np.zeros(n, dtype=np.int64)
        if hit.any():
            pairs = np.unique(
                np.stack((doc_idx[hit], sh[hit].view(np.int64)), axis=1), axis=0
            )
            n_hits = np.bincount(pairs[:, 0], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "n_hit_shingles": pa.array(n_hits, type=pa.int64()),
                "contaminated": pa.array((n_hits > 0).astype(np.int64), type=pa.int64()),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


def docs_decontaminate_bloom(
    sf_dir: str, k: int = 5, bench_mod: int = 97, m_bits: int = 1 << 22
):
    """Bloom-filter scale twin of docs_decontaminate: when the benchmark's
    distinct shingle set outgrows a comfortable exact broadcast (10^9+
    shingles = 8+ GB sorted u64 and growing with n), a FIXED-size Bloom
    bitmap keeps the build-partial → OR-merge → broadcast → scan shape with
    zero false negatives and a sizing-bounded false-positive rate
    (functions/bloom.py; >= 32 bits/element keeps doc-level flags clean —
    the default 2^22-bit / 512 KB bitmap covers ~130k benchmark shingles at
    that density). Per-batch partial bitmaps OR-merge through the same
    fanout-bounded tree the sketches use; no raw shingle ever reaches the
    driver. Output: (doc_id, contaminated) for non-benchmark docs; parity
    with the exact path at this sizing is gated in tests/test_bloom.py."""
    from imagededupx_ray.functions.bloom import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def _plain_shingles(texts: pa.Array):
        flat, offsets = tokenize_batch(texts)
        th = H.token_hash_flat(flat)
        sh, counts = H.shingle_hashes(th, offsets, k)
        m = np.diff(offsets)
        short = (m > 0) & (m < k)
        if short.any():
            sh = sh[np.repeat(~short, counts)]
            counts = np.where(short, 0, counts)
        return sh, counts.astype(np.int64)

    def bench_bloom(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % bench_mod == 0))
        sh = (
            _plain_shingles(sub["text"])[0]
            if sub.num_rows
            else np.empty(0, np.uint64)
        )
        return pa.table({"bloom": pa.array([bloom_build(sh, m_bits).tobytes()])})

    def merge_blooms(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bloom" not in batch.column_names:
            return pa.table({"bloom": pa.array([], type=pa.binary())})
        merged = bloom_merge(
            *[np.frombuffer(b, dtype=np.uint64) for b in batch["bloom"].to_pylist()]
        )
        return pa.table({"bloom": pa.array([merged.tobytes()])})

    parts = _sketch_tree_reduce(
        docs.map_batches(bench_bloom, batch_format="pyarrow"), merge_blooms
    )
    bloom = bloom_merge(
        *[np.frombuffer(r["bloom"], dtype=np.uint64) for r in parts]
    ) if parts else np.zeros(m_bits // 64, dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def flag(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % bench_mod != 0))
        n = sub.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "contaminated": pa.array([], type=pa.int64()),
                }
            )
        sh, counts = _plain_shingles(sub["text"])
        hit = bloom_contains(bf, sh)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        n_hits = np.bincount(doc_idx[hit], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "contaminated": pa.array(
                    (n_hits > 0).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


def docs_dup_rate_by_source(sf_dir: str):
    """Per-source duplication report: how much of each source is exact-dup
    mass — the first diagnostic a corpus-curation run reads (which crawls /
    dumps are redundant) before deciting per-source sampling weights.

    Scale shape: pass 1 groups by a 63-bit content hash (narrow u64 shuffle,
    same key as the exact-dedup tier) and keeps only hashes with count > 1 —
    the dup-hash set, which is bounded by the dup mass, not the corpus. That
    set broadcasts (``ray.put`` + searchsorted), and pass 2 is a stateless
    per-batch combiner emitting per-source partials that a tiny groupby
    sums. Above the broadcast crossover the same two passes run as a
    hash-partitioned join (the implemented dedup join fallback pattern,
    stages/dedup.py). Reference analogue: corpus stats G7 +
    value-dedup M9 (literal_similarity.py:66-74)."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents").select_columns(["source", "text"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = H.id_hash_array(batch["text"].to_pylist())
        return pa.table({"h": pa.array(h, type=pa.int64()), "source": batch["source"]})

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")

    dup_parts = (
        hashed.select_columns(["h"])
        .groupby("h")
        .count()
        .map_batches(
            lambda t: t.filter(pc.greater(t["count()"], 1)).select(["h"]),
            batch_format="pyarrow",
        )
        .take_all()
    )
    dup_sorted = np.sort(np.array([r["h"] for r in dup_parts], dtype=np.int64))
    dup_ref = ray.put(dup_sorted)

    def partials(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        h = batch["h"].to_numpy(zero_copy_only=False)
        if len(dup):
            pos = np.minimum(np.searchsorted(dup, h), len(dup) - 1)
            is_dup = (dup[pos] == h).astype(np.int64)
        else:
            is_dup = np.zeros(len(h), dtype=np.int64)
        df = pd.DataFrame(
            {"source": batch["source"].to_pandas(), "is_dup": is_dup, "one": 1}
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("one", "sum"), n_dup_docs=("is_dup", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _partial_groupby(
        hashed.map_batches(partials, batch_format="pyarrow"),
        ["source"],
        [("sum", "n_docs", "n_docs"), ("sum", "n_dup_docs", "n_dup_docs")],
    )

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        dd = t["n_dup_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(
                    t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "n_dup_docs": pa.array(
                    t["n_dup_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "dup_rate": _round_col(dd / np.maximum(nd, 1.0), 6),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def docs_lang_pivot(sf_dir: str):
    """Crosstab / conditional-aggregation pivot: one row per source with the
    per-lang doc counts as COLUMNS (the report shape corpus dashboards want).
    Shape: each batch emits a partial crosstab (pure numpy conditional sums —
    the pivot never exists as a wide shuffle, only as fixed-width partial
    rows), then a tiny groupby-source sum merges partials. The column set is
    the (small, known) lang domain; an unbounded pivot domain would instead
    keep the long (source, lang, n) form — documented trade."""
    from ray.data.aggregate import Sum

    langs = ["de", "en", "es", "fr", "zh"]

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pandas()
        lang = batch["lang"].to_pandas()
        df = pd.DataFrame({"source": src})
        for lg in langs:
            df[f"n_{lg}"] = (lang == lg).astype(np.int64)
        df["n_total"] = 1
        g = df.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    specs = [("sum", f"n_{lg}", f"n_{lg}") for lg in langs]
    specs.append(("sum", "n_total", "n_total"))
    ds = _partial_groupby(
        _read(sf_dir, "documents")
        .select_columns(["source", "lang"])
        .map_batches(partial, batch_format="pyarrow"),
        ["source"],
        specs,
    )

    def toint(t: pa.Table) -> pa.Table:
        cols = {"source": t["source"]}
        for c in t.column_names:
            if c != "source":
                cols[c] = pa.array(
                    t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                )
        return pa.table(cols)

    return ds.map_batches(toint, batch_format="pyarrow")


def docs_above_lang_avg(sf_dir: str):
    """Filter-by-group-aggregate: per lang, how many docs exceed their own
    language's mean length. Two passes: a tiny exact groupby (int64 char sum +
    count per lang — the mean is derived by ONE float division on both sides,
    so the > comparison is bit-reproducible vs the SQL twin) broadcasts to a
    stateless per-batch counter; partials merge in a 5-row groupby. The
    canonical 'compare each row to its group's statistic' shape without ever
    joining the corpus against itself."""
    from ray.data.aggregate import Count, Sum

    docs = _read(sf_dir, "documents").select_columns(["lang", "n_chars"])
    stats = _partial_groupby(
        docs, ["lang"], [("sum", "n_chars", "s"), ("count", "", "n")]
    ).to_pandas()
    mu = {
        r.lang: float(np.float64(int(r.s)) / np.float64(int(r.n)))
        for r in stats.itertuples()
    }
    mu_ref = ray.put(mu)

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(mu_ref)
        lang = batch["lang"].to_pandas()
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        thr = lang.map(m).to_numpy(dtype=np.float64)
        df = pd.DataFrame(
            {"lang": lang, "above": (nc > thr).astype(np.int64), "one": 1}
        )
        g = df.groupby("lang", as_index=False).agg(
            n_above=("above", "sum"), n_docs=("one", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _partial_groupby(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        [("sum", "n_above", "n_above"), ("sum", "n_docs", "n_docs")],
    )

    def finish(t: pa.Table) -> pa.Table:
        na = t["n_above"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": pa.array(nd),
                "n_above": pa.array(na),
                "frac_above": _round_col(
                    na.astype(np.float64) / np.maximum(nd, 1).astype(np.float64), 6
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def docs_shuffle_export_stats(sf_dir: str, seed: str = "42", n_shards: int = 16):
    """Per-shard stats of the deterministic training-shard export
    (pipelines/export.py): shard id, row count, min/max shuffle key. The
    shard assignment is content-keyed md5(seed||text) — reproducible at any
    parallelism — and the SQL twin computes the identical bucket, so the
    hash gate proves the export's assignment semantics exactly."""
    from ray.data.aggregate import Count, Max, Min

    from imagededupx_ray.pipelines.export import assign_shards

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return (
        assign_shards(docs, seed=seed, n_shards=n_shards)
        .select_columns(["shard", "shuffle_key"])
        .groupby("shard")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("shuffle_key", alias_name="key_min"),
            Max("shuffle_key", alias_name="key_max"),
        )
    )


def docs_unigram_logppl(sf_dir: str):
    """CCNet-style language-model quality scoring: per-doc mean negative
    log-likelihood under a unigram LM — the perplexity filter every
    CommonCrawl curation pipeline runs (CCNet / CC-100 fit a KenLM and
    drop the high-perplexity tail; here the LM is the corpus's own exact
    unigram distribution so the DuckDB twin can gate it bit-for-bit).

    Scale shape: pass 1 folds per-batch token value_counts through the
    partial-groupby combiner (the exchange is vocabulary-bounded —
    sublinear in the corpus by Heaps' law; a production run would instead
    ``ray.put`` a FIXED pretrained LM, which is the same broadcast);
    pass 2 is one stateless narrow scan — searchsorted token-hash lookup
    against the broadcast (hash, count) arrays, per-doc mean via
    ``reduceat``. No corpus-sized exchange anywhere."""
    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def tok_counts(batch: pa.Table) -> pa.Table:
        flat, _ = tokenize_batch(batch["text"])
        th = H.token_hash_flat(flat).astype(np.int64)
        t, c = np.unique(th, return_counts=True)
        return pa.table(
            {
                "t": pa.array(t, type=pa.int64()),
                "c": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )

    lm = _partial_groupby(
        docs.map_batches(tok_counts, batch_format="pyarrow"),
        ["t"],
        [("sum", "c", "c")],
    ).to_pandas()
    terms = lm["t"].to_numpy().astype(np.int64)
    order = np.argsort(terms)
    counts = lm["c"].to_numpy().astype(np.float64)[order]
    total = float(counts.sum())
    lm_ref = ray.put((terms[order], np.log(counts / max(total, 1.0))))

    def score(batch: pa.Table) -> pa.Table:
        t_sorted, logp = ray.get(lm_ref)
        flat, offsets = tokenize_batch(batch["text"])
        th = H.token_hash_flat(flat).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offsets)
        keep = n_tok > 0
        pos = np.searchsorted(t_sorted, th)
        pos[pos >= len(t_sorted)] = 0
        nll = -logp[pos]  # every corpus token exists in the corpus LM
        sums = np.add.reduceat(nll, offsets[:-1][keep]) if keep.any() else np.empty(0)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "logppl": _round_col(sums / n_tok[keep].astype(np.float64), 6),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def docs_hapax_ratio(sf_dir: str):
    """Vocabulary-novelty quality signal: per doc, the fraction of its
    DISTINCT tokens that are corpus hapax legomena (document frequency = 1).
    High hapax ratio flags gibberish/OCR noise; low flags boilerplate — a
    corpus-level quality filter the per-doc stats (docs_quality) can't see.

    Scale shape: rides the postings exchange (stages/tfidf.py) — explode to
    (doc, term) rows, term-keyed coarse-partition shuffle computes df where
    the term's occurrences co-locate, then ONE doc-keyed groupby folds the
    integer (n_terms, n_hapax) partials. All-integer until a single final
    division, so the hash gate vs the SQL twin is exact."""
    from ray.data.aggregate import Sum

    from imagededupx_ray.stages.tfidf import tfidf_postings

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    post = tfidf_postings(docs)

    def partial(t: pa.Table) -> pa.Table:
        df_ = t["df"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["d"],
                "n_terms": pa.array(np.ones(len(df_), dtype=np.int64)),
                "n_hapax": pa.array((df_ == 1).astype(np.int64)),
            }
        )

    agg = (
        post.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_terms", alias_name="n_terms"), Sum("n_hapax", alias_name="n_hapax"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nt = t["n_terms"].to_numpy(zero_copy_only=False).astype(np.int64)
        nh = t["n_hapax"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_terms": pa.array(nt),
                "n_hapax": pa.array(nh),
                "hapax_ratio": _round_col(
                    nh.astype(np.float64) / np.maximum(nt, 1).astype(np.float64), 6
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def knn_range_search(sf_dir: str, n_queries: int = 10, threshold: float = 0.25):
    """Radius (range) similarity search: ALL corpus vectors with cosine >=
    threshold per query — the reference's threshold mode
    (faiss range_search, faiss_bert_similarity.py:167-170 /
    improved_faiss_detector.py:785-788 threshold presets), vs knn_cosine's
    top-k mode. Streaming shape: broadcast query matrix, per-batch matmul,
    vectorized >= filter — NO reduce stage at all (unlike top-k), so the
    output streams straight through; selectivity is the only cost driver.
    Both sides threshold on the ROUNDED cosine so the gate is stable at the
    boundary."""
    emb = _read(sf_dir, "embeddings")
    q_tbl = (
        emb.filter(expr=f"vec_id < {n_queries}")
        .select_columns(["vec_id", "embedding"])
        .to_pandas()
    )
    Q = np.stack(q_tbl["embedding"].to_numpy()).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = q_tbl["vec_id"].to_numpy().astype(np.int64)
    q_ref = ray.put((q_ids, Q))

    def in_range(batch: pa.Table) -> pa.Table:
        q_ids_, Qm = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        M = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        M = M.reshape(len(ids), -1)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        S = Qm @ M.T  # (nq, nbatch)
        # half-away-from-zero round BEFORE thresholding (both sides identical)
        S = np.copysign(np.floor(np.abs(S) * 1e6 + 0.5) / 1e6, S)
        qi, ci = np.nonzero((S >= threshold) & (ids[None, :] != q_ids_[:, None]))
        return pa.table(
            {
                "query_id": pa.array(q_ids_[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[ci], type=pa.int64()),
                "cosine": pa.array(S[qi, ci], type=pa.float64()),
            }
        )

    return emb.map_batches(in_range, batch_format="pyarrow", batch_size=4096)


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5 shape: revenue by nation where the CUSTOMER and the SUPPLIER
    sit in the same nation of one region — the canonical 6-way join
    (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier). Scale plan:
    the three dimension sides (region⋈nation, supplier→nation,
    customer→nation) are broadcast sorted-array lookups (`ray.put` once,
    searchsorted per batch — dimensions, not facts); the fact⋈fact join
    (lineitem ⋈ orders on orderkey) runs as ONE coarse-partition union
    exchange — both sides hash by ``splitmix64(orderkey) & (P-1)``, each
    partition task sorts its order keys once and resolves every lineitem by
    searchsorted (the customers_order_fill machinery; no per-key Python,
    no join actor pool) — and emits nation-bounded revenue partials, so
    the final sum is a 5-row partial-groupby. (Date-window predicate of
    the official Q5 omitted: this corpus spans one generation epoch.)"""

    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"]
    nat = nat[nat["n_regionkey"].isin(set(rk))]
    nat_keys = np.sort(nat["n_nationkey"].to_numpy(dtype=np.int64))
    nat_names = nat.set_index("n_nationkey").loc[nat_keys, "n_name"].to_numpy()

    sup = _read(sf_dir, "supplier").select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy(dtype=np.int64)
    so = np.argsort(sk)
    cus = _read(sf_dir, "customer").select_columns(["c_custkey", "c_nationkey"]).to_pandas()
    ck = cus["c_custkey"].to_numpy(dtype=np.int64)
    co = np.argsort(ck)
    dims_ref = ray.put(
        (
            nat_keys,
            sk[so],
            sup["s_nationkey"].to_numpy(dtype=np.int64)[so],
            ck[co],
            cus["c_nationkey"].to_numpy(dtype=np.int64)[co],
        )
    )

    def _lookup(sorted_keys, vals, keys):
        pos = np.searchsorted(sorted_keys, keys)
        pos[pos >= len(sorted_keys)] = 0
        hit = sorted_keys[pos] == keys
        return vals[pos], hit

    def line_rev(batch: pa.Table) -> pa.Table:
        nk, sks, snat, _, _ = ray.get(dims_ref)
        keys = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat, hit = _lookup(sks, snat, keys)
        in_reg = hit & np.isin(s_nat, nk)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[in_reg]
        d = batch["l_discount"].to_numpy(zero_copy_only=False)[in_reg]
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[in_reg]
                ),
                "s_nat": pa.array(s_nat[in_reg], type=pa.int64()),
                "rev": pa.array(p * (1.0 - d), type=pa.float64()),
            }
        )

    parts = _coarse_parts()

    def li_rows(batch: pa.Table) -> pa.Table:
        t = line_rev(batch)
        key = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_part": _coarse_part_col(key, parts),
                "key": t["l_orderkey"],
                "nat": t["s_nat"],
                "rev": t["rev"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        nk, _, _, cks, cnat = ray.get(dims_ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_nat, hit = _lookup(cks, cnat, keys)
        in_reg = hit & np.isin(c_nat, nk)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[in_reg]
        return pa.table(
            {
                "_part": _coarse_part_col(okey, parts),
                "key": pa.array(okey, type=pa.int64()),
                "nat": pa.array(c_nat[in_reg], type=pa.int64()),
                "rev": pa.array(np.zeros(len(okey), dtype=np.float64)),
                "side": pa.array(np.zeros(len(okey), dtype=np.int8)),
            }
        )

    li = (
        _read(sf_dir, "lineitem")
        .select_columns(["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(li_rows, batch_format="pyarrow")
    )
    orders = (
        _read(sf_dir, "orders")
        .select_columns(["o_orderkey", "o_custkey"])
        .map_batches(order_rows, batch_format="pyarrow")
    )

    def join_part(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([("n_nat", pa.int64()), ("rev", pa.float64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = t["nat"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = t["rev"].to_numpy(zero_copy_only=False).astype(np.float64)
        side = t["side"].to_numpy(zero_copy_only=False)
        om = side == 0
        ok = key[om]
        o_ord = np.argsort(ok, kind="stable")
        ok_s, onat_s = ok[o_ord], nat[om][o_ord]
        lkey, lnat, lrev = key[~om], nat[~om], rev[~om]
        if len(ok_s) == 0 or len(lkey) == 0:
            return out_schema.empty_table()
        pos = np.searchsorted(ok_s, lkey)
        pos[pos >= len(ok_s)] = 0
        keep = (ok_s[pos] == lkey) & (onat_s[pos] == lnat)
        if not keep.any():
            return out_schema.empty_table()
        nats, inv = np.unique(lnat[keep], return_inverse=True)
        sums = np.bincount(inv, weights=lrev[keep], minlength=len(nats))
        return pa.table(
            {
                "n_nat": pa.array(nats, type=pa.int64()),
                "rev": pa.array(sums, type=pa.float64()),
            }
        )

    agg = _partial_groupby(
        li.union(orders).groupby("_part").map_groups(join_part, batch_format="pyarrow"),
        ["n_nat"],
        [("sum", "rev", "rev")],
    ).to_pandas()
    pos = np.searchsorted(nat_keys, agg["n_nat"].to_numpy(dtype=np.int64))
    out = pd.DataFrame(
        {
            "n_name": nat_names[pos],
            "revenue": _round_col(agg["rev"].to_numpy(dtype=np.float64), 2).to_numpy(
                zero_copy_only=False
            ),
        }
    )
    return out.sort_values("revenue", ascending=False).reset_index(drop=True)


# --------------------------------------------------------------------------
# driver-visibility suites: the driver's correctness artifact records at most
# 50 queries() entries (CORRECTNESS_r03 captured exactly the first 50 of 64),
# so the non-SQL similarity/sketch and multimodal families are exposed as two
# composite queries — ONE deterministic evidence row per component pipeline
# (row count, column count, order-insensitive value md5). Every component
# still runs end-to-end inside the suite; the granular functions remain
# first-class library APIs, pytest-gated (recall/parity/golden tests) and
# individually benchmarked in bench.py.
# --------------------------------------------------------------------------


def _component_ok(name: str, df: pd.DataFrame) -> bool:
    """Cheap structural invariants so a suite row distinguishes "changed"
    (different md5) from "broken" (VERDICT r4 #9): nonzero rows (every
    component produces rows at any sf — verified at sf0.01), finite floats,
    a < b ordering on pair miners, similarity scores within [-1, 1], and
    exactly one canonical per dedup cluster. Deeper gates (planted-pair
    recall, signature bit-parity) stay in pytest — these checks only need
    the component's own output frame."""
    if len(df) == 0:
        return False
    cols = set(df.columns)
    for c in df.columns:
        if df[c].dtype.kind == "f" and not np.isfinite(df[c].to_numpy()).all():
            return False
    if {"a", "b"} <= cols and not bool((df["a"] < df["b"]).all()):
        return False
    for c in ("jaccard", "cosine", "wjaccard"):
        if c in cols and len(df):
            v = df[c].to_numpy()
            if v.min() < -1.000001 or v.max() > 1.000001:
                return False
    if name in ("dedup_clusters", "oph_dedup_clusters") and {"cluster_id", "is_canonical"} <= cols:
        if not bool((df.groupby("cluster_id")["is_canonical"].sum() == 1).all()):
            return False
    if name == "corpus_refine_report" and {"docs_in", "docs_out", "removed"} <= cols:
        if (df["docs_out"] > df["docs_in"]).any() or (df["removed"] < 0).any():
            return False
        if int(df["removed"].sum()) == 0:  # every stage has planted attrition
            return False
    if name == "pages_domain_cap" and {"n_in", "n_kept"} <= cols:
        if (df["n_kept"] > df["n_in"]).any() or (df["n_kept"] < 0).any():
            return False
        if int((df["n_in"] - df["n_kept"]).sum()) == 0:  # hot host is planted
            return False
    if name == "docs_softdedup_weights" and {"n_members", "weight"} <= cols:
        w = df["weight"].to_numpy()
        m = df["n_members"].to_numpy()
        if (m < 1).any() or not np.allclose(w * m, 1.0):
            return False
    if name == "docs_ppl_buckets" and {"bucket", "logppl"} <= cols:
        counts = df["bucket"].value_counts()
        if set(counts.index) != {"head", "middle", "tail"}:
            return False
        # exact tertiles: no bucket may dominate (ties can shift a few rows)
        if counts.max() > 0.5 * len(df):
            return False
    if name == "docs_quality_classifier" and {"prob", "pred", "label", "holdout"} <= cols:
        p = df["prob"].to_numpy()
        if p.min() < 0.0 or p.max() > 1.0:
            return False
        if df["label"].nunique() < 2:  # a real verdict mix, not one class
            return False
        ho = df[df["holdout"] == 1]
        if len(ho) == 0:
            return False
        # distillation agreement on docs the fit never saw (a linear
        # bag-of-ngrams model can't represent the length rules exactly)
        if float((ho["pred"] == ho["label"]).mean()) < 0.70:
            return False
    if name == "pages_snapshot_dup_report" and {
        "snapshot",
        "n_docs",
        "n_dup_docs",
        "n_cross_dup_docs",
    } <= cols:
        if len(df) != 2 or int(df["n_docs"].sum()) == 0:
            return False
        if (df["n_cross_dup_docs"] > df["n_dup_docs"]).any():
            return False
        if (df["n_dup_docs"] > df["n_docs"]).any():
            return False
        r = df.set_index("snapshot")
        # planted truth: every snapshot-1 dup belongs to a >=3-member group
        # whose other members sit in snapshot 0 -> all its dups are cross;
        # snapshot 0 keeps within-snapshot dups (2-member groups) too
        if int(r.loc[1, "n_cross_dup_docs"]) != int(r.loc[1, "n_dup_docs"]):
            return False
        if not (
            0
            < int(r.loc[0, "n_cross_dup_docs"])
            < int(r.loc[0, "n_dup_docs"])
        ):
            return False
    if name == "pq_search_topk" and {"query_id", "vec_id", "score", "rank"} <= cols:
        s = df["score"].to_numpy()
        if len(df) == 0 or np.abs(s).max() > 1.0 + 1e-9:
            return False
        # reranked scores are true cosines: every query's rank-1 hit must be
        # itself (queries are corpus rows) with cosine 1.0
        top1 = df[df["rank"] == 1]
        if not (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all():
            return False
        if not np.allclose(top1["score"].to_numpy(), 1.0, atol=1e-6):
            return False
    if name == "docs_bpe_subwords" and {"doc_id", "n_tokens", "subwords"} <= cols:
        if len(df) == 0:
            return False
        nt = df["n_tokens"].to_numpy()
        # every token count matches its segmentation; every word closes
        # with the end-of-word marker
        for _, r in df.iterrows():
            toks = r["subwords"].split(" ") if r["subwords"] else []
            if len(toks) != r["n_tokens"]:
                return False
            if toks and not "".join(toks).endswith("▁"):
                return False
        if (nt <= 0).all():
            return False
    if name == "docs_line_dedup" and {"n_lines", "n_lines_removed"} <= cols:
        rm = df["n_lines_removed"].to_numpy()
        if (rm < 0).any() or (rm > df["n_lines"].to_numpy()).any():
            return False
        if int(rm.sum()) == 0:  # the lined view plants boilerplate; some must go
            return False
    return True


def _suite_summary(components: dict) -> pd.DataFrame:
    """One evidence row per component result: (component, n_rows, n_cols,
    result_md5, ok). The md5 normalizes exactly like the driver's hash gate
    (sorted columns, sorted rows) so a changed component result changes the
    recorded suite values; floats print at 6 significant digits (every
    component rounds its score columns upstream). ``ok`` carries the cheap
    structural invariants from _component_ok."""
    import hashlib

    rows = []
    for name, res in components.items():
        if isinstance(res, rd.Dataset) or isinstance(res, pa.Table):
            df = res.to_pandas()
        else:
            df = res
        df = df[sorted(df.columns)]
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
        h = hashlib.md5(
            df.to_csv(index=False, float_format="%.6g").encode()
        ).hexdigest()
        rows.append((name, len(df), df.shape[1], h, _component_ok(name, df)))
    return pd.DataFrame(
        rows, columns=["component", "n_rows", "n_cols", "result_md5", "ok"]
    )


def similarity_suite(sf_dir: str) -> pd.DataFrame:
    """Non-SQL similarity/sketch family, one evidence row per component:
    minhash signatures, LSH candidate pairs, simhash hamming-band pairs,
    winnowing fingerprints, IVF + HNSW ANN top-k, IVF embedding dup mining,
    suffix-span substring search, HLL distinct-count and quantile sketches.
    Correctness gates live in pytest (signature bit-parity, recall >= 0.99,
    sketch certification); this suite makes each component's execution and
    result fingerprint visible in the driver artifact."""
    return _suite_summary(
        {
            "minhash_signatures": minhash_signatures(sf_dir),
            "lsh_pairs": lsh_pairs(sf_dir),
            "simhash_dup_pairs": simhash_dup_pairs(sf_dir),
            "docs_winnow_fingerprints": docs_winnow_fingerprints(sf_dir),
            "ann_cosine": ann_cosine(sf_dir),
            "ann_hnsw": ann_hnsw(sf_dir),
            "pq_search_topk": pq_search_topk(sf_dir),
            "docs_bpe_subwords": docs_bpe_subwords(sf_dir),
            "embedding_dup_pairs_ann": embedding_dup_pairs_ann(sf_dir),
            "semdedup_prune": semdedup_prune(sf_dir),
            "lsa_semdedup": lsa_semdedup(sf_dir),
            "lsa_search": lsa_search(sf_dir),
            "dedup_tiers": dedup_tiers(sf_dir),
            "substring_spans_docs": substring_spans_docs(sf_dir),
            "docs_substring_cleanup": docs_substring_cleanup(sf_dir),
            "dedup_clusters": dedup_clusters(sf_dir),
            "docs_stratified_sample": docs_stratified_sample(sf_dir),
            "docs_pii_scrub": docs_pii_scrub(sf_dir),
            "docs_pack_bins": docs_pack_bins(sf_dir),
            "docs_chunk": docs_chunk(sf_dir),
            "corpus_datasheet": corpus_datasheet(sf_dir),
            "docs_dsir_weights": docs_dsir_weights(sf_dir),
            "docs_quality_classifier": docs_quality_classifier(sf_dir),
            "docs_ppl_buckets": docs_ppl_buckets(sf_dir),
            "pages_url_dedup": pages_url_dedup(sf_dir),
            "pages_domain_cap": pages_domain_cap(sf_dir),
            "pages_snapshot_dup_report": pages_snapshot_dup_report(sf_dir),
            "docs_softdedup_weights": docs_softdedup_weights(sf_dir),
            "docs_topic_clusters": docs_topic_clusters(sf_dir),
            "corpus_refine_report": corpus_refine_report(sf_dir),
            "cross_dedup_report": cross_dedup_report(sf_dir),
            "docs_exactsubstr_cleanup": docs_exactsubstr_cleanup(sf_dir),
            "docs_line_dedup": docs_line_dedup(sf_dir),
            "docs_distinct_bigrams_hll": docs_distinct_bigrams_hll(sf_dir),
            "docs_length_quantiles_sketch": docs_length_quantiles_sketch(sf_dir),
            "docs_decontaminate_bloom": docs_decontaminate_bloom(sf_dir),
            "docs_weighted_dup_pairs": docs_weighted_dup_pairs(sf_dir),
        }
    )


def multimodal_suite(sf_dir: str) -> pd.DataFrame:
    """Multimodal dedup family over genuine encoded media (stdlib PNG/JPEG/
    GIF/WAV/MJV1 codecs, /tmp-cached corpora), one evidence row per
    component: image decode features, perceptual hashes, phash-LSH dup
    pairs, audio features, landmark-fingerprint audio dups, frame-sampled
    video dups. Planted-dup recall gates live in pytest."""
    return _suite_summary(
        {
            "image_decode_features": image_decode_features(sf_dir),
            "image_perceptual_hashes": image_perceptual_hashes(sf_dir),
            "image_phash_dup_pairs": image_phash_dup_pairs(sf_dir),
            "image_feature_dup_pairs": image_feature_dup_pairs(sf_dir),
            "audio_clip_features": audio_clip_features(sf_dir),
            "audio_dup_pairs": audio_dup_pairs(sf_dir),
            "video_dup_pairs": video_dup_pairs(sf_dir),
        }
    )


def nonsql_suite(sf_dir: str) -> pd.DataFrame:
    """similarity_suite + multimodal_suite + the dedup cluster report as ONE
    driver-visible entry (the driver artifact records at most 50
    ``queries()`` rows; merging the rows-only family keeps all 44 component
    pipelines' evidence rows inside the cap while freeing slots for
    SQL-gated queries)."""
    return pd.concat(
        [
            similarity_suite(sf_dir),
            multimodal_suite(sf_dir),
            _suite_summary({"dedup_cluster_report": dedup_cluster_report(sf_dir)}),
            # LAST: signer="oph" re-keys the dedup cache; running it after
            # every kperm consumer avoids re-running the kperm pipeline
            _suite_summary({"oph_dedup_clusters": oph_dedup_clusters(sf_dir)}),
        ],
        ignore_index=True,
    )
