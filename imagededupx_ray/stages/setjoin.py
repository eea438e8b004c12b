"""Exact set-similarity self-join via prefix filtering (AllPairs / PPJoin
family — Bayardo et al. WWW'07, Xiao et al. WWW'08; distributed shape after
Vernica et al. SIGMOD'10's MapReduce set-similarity join).

The reference computes exact Jaccard only all-pairs
(/root/reference/similarities/similarities/utils/distance.py:129-134 inside
an O(n^2) loop); this stage is the subquadratic EXACT path for high
thresholds: every pair with J(x, y) >= t shares at least one element in both
docs' *prefixes* (the first ``|x| - ceil(t*|x|) + 1`` elements under any
single global element order), so grouping prefix rows by element generates a
complete candidate set that is tiny when t is high — at t=0.8 a doc exposes
~20% of its elements, and candidates must also pass the size-ratio filter
``t*max(|x|,|y|) <= min(|x|,|y|)`` before the exact verify.

Dataflow (all coarse-partition exchanges, one vectorized Python call per
partition — never per key):

1. explode sets -> (el, d, sz) rows, element-keyed exchange; df(el) computed
   in-partition and attached (the tfidf_postings pattern).
2. doc-keyed exchange; per partition one lexsort by (d, df, el) and a
   segmented slice takes each doc's prefix (rarest-first order minimizes
   candidates; ANY fixed order is correct, df order is the quality choice).
3. element-keyed exchange of prefix rows; per element segment, docs sorted by
   size pair only within the size-ratio window (two-sided bound via
   searchsorted) — pairs are deduped partition-locally before the exchange.
4. pair-keyed exchange -> global distinct candidates.
5. exact verify: candidate-member token sets gather into one broadcast
   (members are bounded by candidate volume, not the corpus — same discipline
   as the dedup pipeline's verify), intersection counts computed by one
   lexsort over (pair, token) per batch, J = inter / (|x|+|y|-inter) >= t.

Partitioning assumption (documented per the custom-operator contract): step 3
is quadratic per element GROUP; under df order, prefix elements are each
doc's globally rarest, so groups stay small unless a document consists
entirely of corpus-hot elements. The low-threshold / high-overlap regime
(where nearly all pairs qualify and candidate pruning cannot help) belongs to
the exhaustive tiled miner (queries._tiled_set_jaccard) or the MinHash/LSH
approximation — this operator targets t >= ~0.6.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.functions import hashing as H
from imagededupx_ray.util import seg_searchsorted_right

_EPS = 1e-9

# fanout for the verify-side task trees (member-id unique + picked-set
# assembly) — same discipline as pipelines/dedup._UNIQ_TREE_FANOUT
_TREE_FANOUT = 16


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )


def _gather_segments(
    flat: np.ndarray, off: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized variable-length segment gather: concatenation of
    ``flat[off[i]:off[i+1]]`` for each i in ``idx``. Returns (values,
    segment code per value)."""
    lens = (off[idx + 1] - off[idx]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, flat.dtype), np.empty(0, np.int64)
    codes = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
    starts = np.repeat(off[idx].astype(np.int64), lens)
    base = np.repeat((np.cumsum(lens) - lens), lens)
    pos = starts + (np.arange(total, dtype=np.int64) - base)
    return flat[pos], codes


def _explode_with_part(batch: pa.Table, p: int) -> pa.Table:
    """sets rows -> (``_part`` by element hash, el, d, sz)."""
    col = batch["toks"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    sizes = np.diff(offs)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = np.repeat(ids, sizes)
    sz = np.repeat(sizes.astype(np.int64), sizes)
    part = (H.splitmix64(flat.view(np.uint64)) & np.uint64(p - 1)).astype(np.int32)
    return pa.table(
        {
            "_part": pa.array(part, type=pa.int32()),
            "el": pa.array(flat, type=pa.int64()),
            "d": pa.array(d, type=pa.int64()),
            "sz": pa.array(sz, type=pa.int64()),
        }
    )


def _attach_df(t: pa.Table) -> pa.Table:
    els = t["el"].to_numpy(zero_copy_only=False).astype(np.int64)
    _, inv, counts = np.unique(els, return_inverse=True, return_counts=True)
    return pa.table(
        {
            "el": t["el"],
            "d": t["d"],
            "sz": t["sz"],
            "df": pa.array(counts[inv].astype(np.int64), type=pa.int64()),
        }
    )


def _ceil_t_sz(sz: np.ndarray, threshold: float) -> np.ndarray:
    """ceil(t*sz) with the ceil nudged DOWN by eps so float error can only
    weaken filters (extra candidates are harmless; lost pairs are not)."""
    c = np.ceil(threshold * sz.astype(np.float64) - _EPS).astype(np.int64)
    return np.maximum(c, 1)


def _prefix_len(sz: np.ndarray, threshold: float, q: int) -> np.ndarray:
    """q-extended prefix: L = min(sz, sz - ceil(t*sz) + q). With q = 1 this
    is the classic AllPairs prefix (>= 1 shared prefix element per
    qualifying pair); extending by q - 1 guarantees every qualifying pair
    shares >= min(q, ceil(t*max(|x|,|y|))) prefix elements (q-th-smallest
    shared-element pigeonhole, PPJoin+-family), which the candidate stage
    uses as an exact COUNT filter."""
    return np.minimum(sz, sz - _ceil_t_sz(sz, threshold) + q)


def prefix_rows_stage(sets_ds, threshold: float, p: int, q: int = 1):
    """Steps 1-2: sets -> (el, d, sz) prefix rows (df-ascending global
    order), as a Dataset keyed for the candidate exchange."""

    def rekey_doc(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (H.splitmix64(d.view(np.uint64)) & np.uint64(p - 1)).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(part, type=pa.int32()),
                "el": t["el"],
                "d": t["d"],
                "sz": t["sz"],
                "df": t["df"],
            }
        )

    thr = float(threshold)

    def take_prefix(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("_part", pa.int32()),
                ("el", pa.int64()),
                ("d", pa.int64()),
                ("sz", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        el = t["el"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = t["sz"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((el, df, d))  # by doc, then df asc, el as tiebreak
        el, d, sz, df = el[order], d[order], sz[order], df[order]
        _, seg_starts, seg_counts = np.unique(d, return_index=True, return_counts=True)
        plen = _prefix_len(sz[seg_starts], thr, q)
        rank = np.arange(len(d), dtype=np.int64) - np.repeat(seg_starts, seg_counts)
        keep = rank < np.repeat(plen, seg_counts)
        el, d, sz = el[keep], d[keep], sz[keep]
        part = (H.splitmix64(el.view(np.uint64)) & np.uint64(p - 1)).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(part, type=pa.int32()),
                "el": pa.array(el, type=pa.int64()),
                "d": pa.array(d, type=pa.int64()),
                "sz": pa.array(sz, type=pa.int64()),
            }
        )

    return (
        sets_ds.map_batches(
            lambda b: _explode_with_part(b, p), batch_format="pyarrow"
        )
        .groupby("_part")
        .map_groups(_attach_df, batch_format="pyarrow")
        .map_batches(rekey_doc, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(take_prefix, batch_format="pyarrow")
    )


def candidate_pairs_stage(prefix_ds, threshold: float, p: int, q: int = 1):
    """Steps 3-4: prefix rows -> globally distinct candidate (a, b) pairs
    (a < b), size-ratio AND shared-prefix-count filtered.

    The count filter (exact, from the q-extended prefix): a qualifying pair
    shares >= min(q, ceil(t*max(|x|,|y|))) prefix elements, so each element
    partition emits per-pair LOCAL match counts (one lexsort + reduceat, no
    dedup loss) and the pair-keyed exchange sums them and prunes below the
    bound — this is what kills the near-miss mass (pairs sharing a handful
    of rare elements) that pure prefix filtering admits."""

    def pairs_in_partition(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("_part", pa.int32()),
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("sza", pa.int64()),
                ("szb", pa.int64()),
                ("c", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        el = t["el"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = t["sz"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, sz, el))  # element segments, size-ascending
        el, d, sz = el[order], d[order], sz[order]
        # each row i pairs with rows (i, hi_i) of its segment where
        # sz_j <= sz_i / t (size-ratio filter; sizes ascending in-segment) —
        # all segments answered in ONE merge-rank pass, no per-element Python
        lim = sz.astype(np.float64) / float(threshold) + _EPS
        hi = seg_searchsorted_right(el, sz.astype(np.float64), el, lim)
        cnt = hi - np.arange(len(d), dtype=np.int64) - 1
        cnt = np.maximum(cnt, 0)
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        left = np.repeat(np.arange(len(d), dtype=np.int64), cnt)
        base = np.repeat(np.cumsum(cnt) - cnt, cnt)
        right = left + 1 + (np.arange(total, dtype=np.int64) - base)
        ai, bi = d[left], d[right]
        szl, szr = sz[left], sz[right]
        swap = ai > bi
        a = np.where(swap, bi, ai)
        b = np.where(swap, ai, bi)
        sza = np.where(swap, szr, szl)
        szb = np.where(swap, szl, szr)
        ok = a != b  # same doc can't pair with itself (distinct els, but guard)
        a, b, sza, szb = a[ok], b[ok], sza[ok], szb[ok]
        # partition-local aggregate: one row per pair with its LOCAL count of
        # shared prefix elements (multiplicity = matches within this element
        # partition; global count is the sum over partitions)
        o2 = np.lexsort((b, a))
        a, b, sza, szb = a[o2], b[o2], sza[o2], szb[o2]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        c = np.diff(np.concatenate([starts, [len(a)]])).astype(np.int64)
        a, b, sza, szb = a[starts], b[starts], sza[starts], szb[starts]
        part = (
            H.splitmix64(a.view(np.uint64) ^ H.splitmix64(b.view(np.uint64)))
            & np.uint64(p - 1)
        ).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(part, type=pa.int32()),
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "sza": pa.array(sza, type=pa.int64()),
                "szb": pa.array(szb, type=pa.int64()),
                "c": pa.array(c, type=pa.int64()),
            }
        )

    thr = float(threshold)

    def distinct_pairs(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sza = t["sza"].to_numpy(zero_copy_only=False).astype(np.int64)
        szb = t["szb"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((b, a))
        a, b, sza, szb, c = a[o], b[o], sza[o], szb[o], c[o]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        csum = np.add.reduceat(c, starts)
        a, b, sza, szb = a[starts], b[starts], sza[starts], szb[starts]
        # exact count filter: keep c_total >= min(q, ceil(t*max(sza, szb)))
        need = np.minimum(q, _ceil_t_sz(np.maximum(sza, szb), thr))
        keep = csum >= need
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
            }
        )

    return (
        prefix_ds.groupby("_part")
        .map_groups(pairs_in_partition, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(distinct_pairs, batch_format="pyarrow")
    )


@ray.remote
def _pack_picked(mem_ref, *tables):
    """Filter a GROUP of sets blocks to candidate members and pack them as
    one sorted-by-id (ids, offsets, flat) triple — worker-side, so the
    driver never concatenates token sets."""
    import numpy as _np
    import pyarrow as _pa

    want = mem_ref
    ids_parts, off_parts, flat_parts = [], [], []
    for b in tables:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            continue
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        pos = _np.minimum(_np.searchsorted(want, ids), len(want) - 1)
        sel = want[pos] == ids if len(want) else _np.zeros(len(ids), bool)
        if not sel.any():
            continue
        b = b.filter(_pa.array(sel))
        col = b["toks"]
        if isinstance(col, _pa.ChunkedArray):
            col = col.combine_chunks()
        ids_parts.append(b["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64))
        off_parts.append(col.offsets.to_numpy(zero_copy_only=False).astype(_np.int64))
        flat_parts.append(col.flatten().to_numpy(zero_copy_only=False).astype(_np.int64))
    return _merge_packed_impl(ids_parts, off_parts, flat_parts)


def _merge_packed_impl(ids_parts, off_parts, flat_parts):
    """Merge packed (ids, off, flat) triples into one sorted-by-id triple."""
    import numpy as _np

    if not ids_parts:
        return (_np.empty(0, _np.int64), _np.zeros(1, _np.int64), _np.empty(0, _np.int64))
    ids = _np.concatenate(ids_parts)
    lens = _np.concatenate([_np.diff(o) for o in off_parts])
    flat = _np.concatenate(flat_parts) if flat_parts else _np.empty(0, _np.int64)
    # rebase per-part offsets into the concatenated flat array
    off = _np.concatenate(([0], _np.cumsum(lens))).astype(_np.int64)
    o = _np.argsort(ids, kind="stable")
    g_flat, _ = _gather_segments(flat, off, o)
    g_off = _np.concatenate(([0], _np.cumsum(lens[o]))).astype(_np.int64)
    return (ids[o], g_off, g_flat)


@ray.remote
def _merge_packed(*triples):
    triples = [t for t in triples if len(t[0])]
    if len(triples) == 1:
        return triples[0]
    return _merge_packed_impl(
        [t[0] for t in triples],
        [t[1] for t in triples],
        [t[2] for t in triples],
    )


def verify_pairs_exact(cand_ds, sets_ds, threshold: float):
    """Step 5: exact Jaccard over candidates. Candidate-member token sets
    broadcast once (members bounded by candidate volume, the dedup-verify
    discipline); per batch ONE lexsort over (pair, token) counts
    intersections — no per-pair Python work.

    Both collection steps run as fanout-bounded task TREES (the
    pipelines/dedup.py pair-id-tree discipline, VERDICT r4 #2): member ids
    merge through _block_uniq/_merge_uniq groups and the picked token sets
    pack + merge worker-side through _pack_picked/_merge_packed — the
    driver holds one ObjectRef, never an all-blocks concat."""
    from imagededupx_ray.pipelines.dedup import _block_uniq, _merge_uniq
    from imagededupx_ray.util import block_group_size

    cand_mat = cand_ds.materialize()

    cand_refs = cand_mat.to_arrow_refs()
    _g = max(block_group_size(len(cand_refs)), 2)
    refs = [
        _block_uniq.remote(*cand_refs[i : i + _g])
        for i in range(0, len(cand_refs), _g)
    ]
    while len(refs) > 1:
        refs = [
            _merge_uniq.remote(*refs[i : i + _TREE_FANOUT])
            for i in range(0, len(refs), _TREE_FANOUT)
        ]
    members = ray.get(refs[0]) if refs else np.empty(0, np.int64)
    if len(members) == 0:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs())
    mem_ref = ray.put(members)

    set_refs = sets_ds.to_arrow_refs()
    _gs = max(block_group_size(len(set_refs)), 2)
    prefs = [
        _pack_picked.remote(mem_ref, *set_refs[i : i + _gs])
        for i in range(0, len(set_refs), _gs)
    ]
    while len(prefs) > 1:
        prefs = [
            _merge_packed.remote(*prefs[i : i + _TREE_FANOUT])
            for i in range(0, len(prefs), _TREE_FANOUT)
        ]
    # the packed broadcast stays in the object store; workers ray.get the ref
    state = prefs[0]

    thr = float(threshold)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pairs()
        mids, moff, mflat = ray.get(state)
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ia = np.searchsorted(mids, a)
        ib = np.searchsorted(mids, b)
        va, ca = _gather_segments(mflat, moff, ia)
        vb, cb = _gather_segments(mflat, moff, ib)
        toks = np.concatenate([va, vb])
        codes = np.concatenate([ca, cb])
        o = np.lexsort((toks, codes))
        toks, codes = toks[o], codes[o]
        dup = (codes[1:] == codes[:-1]) & (toks[1:] == toks[:-1])
        inter = np.bincount(codes[1:][dup], minlength=len(a)).astype(np.float64)
        sza = (moff[ia + 1] - moff[ia]).astype(np.float64)
        szb = (moff[ib + 1] - moff[ib]).astype(np.float64)
        union = sza + szb - inter
        jac = inter / np.maximum(union, 1.0)
        keep = jac >= thr
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return cand_mat.map_batches(verify, batch_format="pyarrow")


def set_similarity_join(
    sets_ds,
    threshold: float,
    num_partitions: int | None = None,
    q: int = 16,
):
    """Exact all-pairs Jaccard >= threshold over a sets Dataset (rows:
    doc_id int64, toks list<int64> of sorted distinct element hashes).
    Returns a Dataset (a, b, jaccard) with a < b, jaccard unrounded float64 —
    value-identical to queries._tiled_set_jaccard at any threshold
    (equality-tested), subquadratic when the threshold is selective.

    ``q`` trades prefix length (+q-1 rows per doc in the candidate exchange)
    against count-filter strength (candidates sharing < min(q,
    ceil(t*max(|x|,|y|))) prefix elements are pruned exactly) — any q >= 1
    is correct; higher q pays off when near-miss pairs share a few globally
    rare elements (templated web text)."""
    from imagededupx_ray.stages.lsh import _pow2
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    sets_mat = sets_ds.materialize()  # consumed by prefix build AND verify
    prefix_ds = prefix_rows_stage(sets_mat, threshold, p, q)
    cand_ds = candidate_pairs_stage(prefix_ds, threshold, p, q)
    return verify_pairs_exact(cand_ds, sets_mat, threshold)
