"""Incremental snapshot build + merge (SURVEY.md §3.2 "ours", §7.2 step 7).

The reference's incremental indexing — MD5 change detection against a pickle
cache, then a full index rebuild from cache
(/root/reference/improved_faiss_detector.py:269-295 delta classes, :413-469
update, :456-457 rebuild-everything) — reborn as CONTENT-KEYED, append-only
Parquet snapshot state:

Every persisted dedup structure is keyed by ``sig_id`` — a 63-bit hash of the
text's sha256 — instead of by (mutable) canonical doc ids. MinHash/SimHash are
pure functions of the text, so under content keys NOTHING already persisted
ever changes on a merge:

- ``signatures`` (sig_id, minhash, simhash, n_shingles): one row per distinct
  text EVER seen; a merge appends one delta part with only the never-seen
  texts' signatures (the expensive stage).
- ``lsh_index`` (bucket, sig_id): the persisted band-bucket table SURVEY
  §1.2/§3.2 promises (``index_partitions``) — a merge appends the delta's
  band rows and NEVER re-bands old signatures. Candidate pairs re-emit only
  inside buckets the delta touches; stored rows of touched buckets come from
  a narrow (bucket, sig_id) filter scan, not recomputation.
- ``verified_pairs`` (a, b = sig_ids): stable per pair; a merge appends the
  pairs newly emitted in touched buckets (minus those already persisted).
- ``docs_meta`` (doc_id, url, text_sha256): the corpus manifest; delta
  detection broadcasts ONLY the new snapshot's (doc_id, sig) combo keys and
  scans the parent parts once (reference M10 new/modified classes).
- deletes are sidecar filters, not rewrites: ``dead_row_keys`` (combo keys of
  tombstoned doc rows) and ``extinct_sig_ids`` (texts with zero surviving
  member docs) are small sorted arrays applied at read time. A tombstoned
  url/text that reappears later is *revived / resurrected* by removing its
  key from the sidecar — the stored meta row, signature, band rows and pairs
  become visible again with zero recompute (reference v3 tombstones,
  incremental_faiss_detector.py:74-75,:295-304, minus its rebuild).

Only ``clusters`` (the corpus-sized OUTPUT — one row per live doc) is fully
recomputed and rewritten per snapshot: union-find over the composed pair set
(pair-bounded driver DSU) + two narrow streaming passes over docs_meta.

Merge cost therefore scales with the DELTA plus the final clusters output,
not with re-processing the corpus: the per-merge corpus-sized work is limited
to narrow streaming scans (docs_meta for delta detection and cluster
assembly; the signature parts once, restricted to pair members, for verify;
the lsh_index parts once for the touched-bucket filter) — no corpus-sized
shuffle, no re-banding, no re-signing, no stage rewrite.

Equivalence contract (tested): build(A then merge B) produces the same
cluster partition as build(A ∪ B); tombstone merges equal rebuilds on the
surviving corpus; delete-then-re-add equals never-deleted
(tests/test_incremental.py).

sig_id collisions (two distinct texts hashing to one 63-bit id) follow the
same accepted budget as doc_id = hash64(url): ~2^-63 per pair.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.stages.cluster import DictDSU
from imagededupx_ray.stages.dedup import (
    doc_sig_combo,
    exact_dedup,
    i64_pair_to_key16,
    sha_to_i64_pair,
    sig_ids_from_sha,
)
from imagededupx_ray.stages.extract import extract_stage
from imagededupx_ray.stages.lsh import explode_bands, _emit_group, _pow2
from imagededupx_ray.stages.signatures import signature_stage, signatures_to_numpy
from imagededupx_ray.stages.verify import verify_pairs_broadcast_fused
from imagededupx_ray.state.checkpoint import (
    SnapshotStore,
    parquet_files,
    part_sorted_index_paths,
    write_part_meta_index,
    write_part_sig_index,
    write_part_sorted_index,
)
from imagededupx_ray.util import block_group_size, suggest_num_partitions

_EMPTY = np.empty(0, dtype=np.int64)


# module-scope remotes (closure-defined @ray.remote re-exports its pickled
# body to every worker on each merge call — the same fixed-cost leak the
# dedup pipeline's verify path had; the derive fns passed as ARGS pickle in
# bytes, the function export happens once per session)
@ray.remote
def _pick_uniq_multi(t: pa.Table, value_fn):
    if t.num_rows == 0:
        return _EMPTY, _EMPTY
    u, c = np.unique(value_fn(t), return_counts=True)
    return u, u[c >= 2]


@ray.remote
def _pick_uniq(t: pa.Table, value_fn):
    if t.num_rows == 0:
        return _EMPTY
    return np.unique(value_fn(t))


@ray.remote
def _index_lookup(kp: str, vp: str, want, key: str, val: str):
    """Memmapped binary-search point lookup into one part's sorted index.
    ``want`` arrives auto-dereferenced (the ObjectRef is a task arg)."""
    schema = pa.schema([(key, pa.int64()), (val, pa.int64())])
    k = np.load(kp, mmap_mode="r")
    if len(k) == 0 or len(want) == 0:
        return schema.empty_table()
    lo = np.searchsorted(k, want, side="left")
    hi = np.searchsorted(k, want, side="right")
    cnt = hi - lo
    nz = cnt > 0
    if not nz.any():
        return schema.empty_table()
    lo2, cnt2 = lo[nz], cnt[nz]
    total = int(cnt2.sum())
    excl = np.concatenate(([0], np.cumsum(cnt2)[:-1]))
    idx = np.repeat(lo2 - excl, cnt2) + np.arange(total)
    v = np.load(vp, mmap_mode="r")
    return pa.table(
        {
            key: pa.array(np.asarray(k[idx]), type=pa.int64()),
            val: pa.array(np.asarray(v[idx]), type=pa.int64()),
        }
    )


@ray.remote
def _meta_index_lookup(kp: str, cp: str, sp: str, want):
    """Memmapped multi-hit point lookup into one docs_meta part's sorted
    (doc_id → combo, sig) index: returns the (combo, sig) rows of every
    physical row whose doc_id is in ``want`` (a url may own several
    physical rows across snapshots — all are returned, like the scan)."""
    schema = pa.schema([("combo", pa.int64()), ("sig", pa.int64())])
    k = np.load(kp, mmap_mode="r")
    if len(k) == 0 or len(want) == 0:
        return schema.empty_table()
    lo = np.searchsorted(k, want, side="left")
    hi = np.searchsorted(k, want, side="right")
    cnt = hi - lo
    nz = cnt > 0
    if not nz.any():
        return schema.empty_table()
    lo2, cnt2 = lo[nz], cnt[nz]
    total = int(cnt2.sum())
    excl = np.concatenate(([0], np.cumsum(cnt2)[:-1]))
    idx = np.repeat(lo2 - excl, cnt2) + np.arange(total)
    c = np.load(cp, mmap_mode="r")
    s = np.load(sp, mmap_mode="r")
    return pa.table(
        {
            "combo": pa.array(np.asarray(c[idx]), type=pa.int64()),
            "sig": pa.array(np.asarray(s[idx]), type=pa.int64()),
        }
    )


def _meta_index_paths(dirs: list[str]) -> list[tuple[str, str, str]] | None:
    """(_idx_doc_id, _idx_combo, _idx_sig) per docs_meta part dir, or None
    if ANY part lacks them (caller falls back to the parquet scan)."""
    out = []
    for d in dirs:
        ps = tuple(
            os.path.join(d, f"_idx_{n}.npy") for n in ("doc_id", "combo", "sig")
        )
        if not all(os.path.exists(p) for p in ps):
            return None
        out.append(ps)
    return out


@ray.remote
def _index_member(kp: str, want):
    """Memmapped membership probe into one part's sorted key index: the
    subset of ``want`` (sorted i64) present in the part."""
    k = np.load(kp, mmap_mode="r")
    if len(k) == 0 or len(want) == 0:
        return np.empty(0, np.int64)
    pos = np.searchsorted(k, want)
    pos[pos >= len(k)] = 0
    return np.asarray(want[k[pos] == want], dtype=np.int64)


@ray.remote
def _index_gather(ip: str, pp: str, want, width: int):
    """``want`` arrives auto-dereferenced (the ObjectRef is a task arg)."""
    ids = np.load(ip, mmap_mode="r")
    if len(ids) == 0 or len(want) == 0:
        return np.empty(0, np.int64), np.empty((0, width), np.uint8)
    pos = np.searchsorted(ids, want)
    pos[pos >= len(ids)] = 0
    hit = ids[pos] == want
    idx = pos[hit]
    pl = np.load(pp, mmap_mode="r")
    return np.asarray(ids[idx]), np.asarray(pl[idx])


@ray.remote
def _sig_tuple_assemble(nperm: int, width: int, *cells):
    ids = np.concatenate([c[0] for c in cells]) if cells else np.empty(0, np.int64)
    pl = (
        np.concatenate([c[1] for c in cells])
        if cells
        else np.empty((0, width), np.uint8)
    )
    order = np.argsort(ids).astype(np.int64)
    n = len(ids)
    mh = np.ascontiguousarray(pl[:, : nperm * 4]).view(np.uint32).reshape(n, nperm)
    sim = np.ascontiguousarray(pl[:, nperm * 4 :]).view(np.uint64).reshape(n)
    return ids[order], order, mh, sim


# ------------------------------------------------------------ small helpers
def _sig_of(t: pa.Table) -> np.ndarray:
    return sig_ids_from_sha(t["text_sha256"])


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if len(sorted_arr) == 0 or len(vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_arr, vals)
    pos[pos >= len(sorted_arr)] = 0
    return sorted_arr[pos] == vals


def _filter_ds(ds, value_fn, sorted_arr: np.ndarray, keep_members: bool):
    """Vectorized broadcast membership filter: keep rows whose ``value_fn``
    result is (keep_members=True) / is not (False) in the sorted array."""
    ref = ray.put(np.ascontiguousarray(sorted_arr, dtype=np.int64))

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t  # 0-row blocks may carry no schema at all
        arr = ray.get(ref)
        m = _in_sorted(arr, value_fn(t))
        return t.filter(pa.array(m if keep_members else ~m))

    return ds.map_batches(fn, batch_format="pyarrow")


def _col_i64(name: str):
    def fn(t: pa.Table) -> np.ndarray:
        return t[name].to_numpy(zero_copy_only=False).astype(np.int64)

    return fn


def _uniq_and_multi(ds, value_fn) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique values, the subset occurring >= 2 times globally) in one
    pass of block tasks — the driver merge is bounded by the dataset's
    distinct count (delta-bounded at every call site)."""

    _t = time.monotonic()
    res = [
        r
        for r in ray.get(
            [_pick_uniq_multi.remote(b, value_fn) for b in ds.to_arrow_refs()]
        )
        if len(r[0])
    ]
    MERGE_PAIR_WALLS["um_tasks_sec"] = round(time.monotonic() - _t, 3)
    _t = time.monotonic()
    if not res:
        return _EMPTY, _EMPTY
    # each block contributes its (sorted-unique values, locally-multi values);
    # a value is globally multi iff locally multi somewhere OR present in >= 2
    # blocks — detectable from a plain sort of the per-block uniques, no
    # argsort/inverse (np.unique(return_inverse) measured 3x slower here)
    v = np.sort(np.concatenate([r[0] for r in res]))
    first = np.empty(len(v), dtype=bool)
    first[0] = True
    np.not_equal(v[1:], v[:-1], out=first[1:])
    u = v[first]
    cross = np.unique(v[~first])
    local = [r[1] for r in res if len(r[1])]
    multi = np.union1d(cross, np.concatenate(local)) if local else cross
    MERGE_PAIR_WALLS["um_merge_sec"] = round(time.monotonic() - _t, 3)
    return u, multi


def _collect_unique_i64(ds, value_fn) -> np.ndarray:
    """Sorted unique int64s of a derived column: plain ray tasks over the
    dataset's blocks (to_arrow_refs is free on materialized inputs — no
    Dataset-execution latency; lazy inputs execute once, as before). The
    driver only ever holds the distinct set."""

    parts = [
        p
        for p in ray.get([_pick_uniq.remote(r, value_fn) for r in ds.to_arrow_refs()])
        if len(p)
    ]
    return np.unique(np.concatenate(parts)) if parts else _EMPTY


def _min_per_key(ds, key_fn, val_fn, want: np.ndarray) -> dict[int, int]:
    """Per key in the broadcast ``want`` set: min of ``val_fn`` over rows with
    that key. One narrow streaming pass; the result is want-bounded."""
    want_ref = ray.put(np.ascontiguousarray(want, dtype=np.int64))

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"k": pa.array([], type=pa.int64()), "m": pa.array([], type=pa.int64())}
            )
        w = ray.get(want_ref)
        k = key_fn(t)
        v = val_fn(t)
        sel = _in_sorted(w, k)
        kk, inv = np.unique(k[sel], return_inverse=True)
        mins = np.full(len(kk), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, v[sel])
        return pa.table(
            {"k": pa.array(kk, type=pa.int64()), "m": pa.array(mins, type=pa.int64())}
        )

    ks: list[np.ndarray] = []
    ms: list[np.ndarray] = []
    for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        ks.append(b["k"].to_numpy(zero_copy_only=False).astype(np.int64))
        ms.append(b["m"].to_numpy(zero_copy_only=False).astype(np.int64))
    if not ks:
        return {}
    k = np.concatenate(ks)
    m = np.concatenate(ms)
    # vectorized min-reduce by key (was a per-row python dict loop)
    order = np.lexsort((m, k))
    k, m = k[order], m[order]
    first = np.empty(len(k), dtype=bool)
    first[0] = True
    np.not_equal(k[1:], k[:-1], out=first[1:])
    return dict(zip(k[first].tolist(), m[first].tolist()))


@ray.remote
def _sigmin_block(*tables):
    """Per-block (sorted unique sig, min doc_id) partial over meta rows."""
    ks, vs = [], []
    for t in tables:
        if t.num_rows == 0 or "text_sha256" not in t.column_names:
            continue
        s = _sig_of(t)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        first = np.ones(len(s), dtype=bool)
        first[1:] = s[1:] != s[:-1]
        ks.append(s[first])
        vs.append(d[first])
    return _sigmin_merge_arrays(ks, vs)


def _sigmin_merge_arrays(ks: list, vs: list):
    if not ks:
        return (_EMPTY, _EMPTY)
    k = np.concatenate(ks)
    v = np.concatenate(vs)
    o = np.lexsort((v, k))
    k, v = k[o], v[o]
    first = np.ones(len(k), dtype=bool)
    first[1:] = k[1:] != k[:-1]
    return (k[first], v[first])


@ray.remote
def _sigmin_merge(*pairs):
    return _sigmin_merge_arrays([p[0] for p in pairs], [p[1] for p in pairs])


def _sigmin_of_ds(meta_ds) -> tuple[np.ndarray, np.ndarray]:
    """(sorted sigs, min doc per sig) over a meta Dataset — per-block ray
    tasks + fanout-bounded tree merge (output is distinct-text-bounded)."""
    refs = meta_ds.to_arrow_refs()
    if not refs:
        return (_EMPTY, _EMPTY)
    g = max(block_group_size(len(refs)), 2)
    parts = [_sigmin_block.remote(*refs[i : i + g]) for i in range(0, len(refs), g)]
    while len(parts) > 1:
        parts = [_sigmin_merge.remote(*parts[i : i + 16]) for i in range(0, len(parts), 16)]
    return ray.get(parts[0])


def _incremental_labels(
    store,
    snapshot: str,
    parent: str,
    docs_new_meta,
) -> "tuple | None":
    """Mutation-free merge: maintain the (sig → component label) map
    INCREMENTALLY instead of re-running the DSU over every stored pair and
    the canonical scan over every meta row (VERDICT r4 #8). Components are
    append-monotone without tombstones — parent components can only merge
    or gain lower canonicals — so a DSU over (delta pairs + one virtual
    node per touched parent component label) reproduces the full result:

    - every delta-pair endpoint already in the parent map unions with its
      component's label node; so do labeled sigs that gained delta docs
      (their component minimum may drop);
    - per-component new label = min(member label values, updated per-sig
      min docs) — per-sig minima ride the ``sig_min_doc`` sidecar, merged
      with the delta's minima (delta-bounded work; the sidecar write is
      distinct-text-bounded);
    - parent map entries remap vectorized where their label changed; new
      paired sigs append.

    Returns (new_keys, new_labels, changed_sigs, n_pairs_total, usk, usv,
    delta_sigmin) or None when a precondition (sidecars present) fails —
    caller falls back to the full DSU path."""
    if not (
        store.has_sidecar(parent, "cluster_sig_labels")
        and store.has_sidecar(parent, "sig_min_doc")
    ):
        return None
    pl = store.read_sidecar_cols(parent, "cluster_sig_labels")
    pk = pl.get("sig", _EMPTY)
    plab = pl.get("label", _EMPTY)
    sm = store.read_sidecar_cols(parent, "sig_min_doc")
    sk = sm.get("sig", _EMPTY)
    sv = sm.get("min_doc", _EMPTY)

    dsig, dmin = _sigmin_of_ds(docs_new_meta)
    usk, usv = _sigmin_merge_arrays([sk, dsig], [sv, dmin])

    pairs_own = store.read_stage_own(snapshot, "verified_pairs")
    a_parts, b_parts = [], []
    n_own = 0
    for b in pairs_own.select_columns(["a", "b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        n_own += b.num_rows
        a_parts.append(b["a"].to_numpy(zero_copy_only=False).astype(np.int64))
        b_parts.append(b["b"].to_numpy(zero_copy_only=False).astype(np.int64))
    pa_arr = np.concatenate(a_parts) if a_parts else _EMPTY
    pb_arr = np.concatenate(b_parts) if b_parts else _EMPTY

    # DSU over python ints (unbounded): sig node = s*2, label node = L*2+1
    dsu = DictDSU()
    for x, y in zip(pa_arr.tolist(), pb_arr.tolist()):
        dsu.union(x * 2, y * 2)
    endpoints = (
        np.unique(np.concatenate([pa_arr, pb_arr])) if len(pa_arr) else _EMPTY
    )
    attach = np.union1d(endpoints, dsig)  # sigs whose component min may drop
    if len(pk) and len(attach):
        pos = np.searchsorted(pk, attach)
        pos_c = np.minimum(pos, len(pk) - 1)
        hit = pk[pos_c] == attach
        for s, L in zip(attach[hit].tolist(), plab[pos_c[hit]].tolist()):
            dsu.union(s * 2, L * 2 + 1)

    # component minima over all touched nodes
    rootmin: dict[int, int] = {}
    node_root: dict[int, int] = {}
    for n in list(dsu.p.keys()):
        r = dsu.find(n)
        node_root[n] = r
        if n & 1:
            val = n >> 1  # label value = parent component canonical
        else:
            s = n >> 1
            p_ = np.searchsorted(usk, s)
            val = int(usv[min(p_, len(usv) - 1)]) if len(usk) and usk[min(p_, len(usk) - 1)] == s else None
        if val is not None:
            rootmin[r] = min(rootmin.get(r, val), val)

    # label remap: old parent label L -> component minimum
    remap_old, remap_new = [], []
    for n, r in node_root.items():
        if n & 1:
            L = n >> 1
            nl = rootmin.get(r, L)
            if nl != L:
                remap_old.append(L)
                remap_new.append(nl)
    new_plab = plab
    changed_parent_sigs = _EMPTY
    if remap_old:
        ro = np.array(remap_old, dtype=np.int64)
        rn = np.array(remap_new, dtype=np.int64)
        o = np.argsort(ro)
        ro, rn = ro[o], rn[o]
        pos = np.searchsorted(ro, plab)
        pos_c = np.minimum(pos, len(ro) - 1)
        hit = ro[pos_c] == plab
        new_plab = plab.copy()
        new_plab[hit] = rn[pos_c[hit]]
        changed_parent_sigs = pk[hit]

    # new map entries: paired sigs not in the parent map
    new_sigs_l, new_labs_l = [], []
    for n, r in node_root.items():
        if n & 1:
            continue
        s = n >> 1
        if len(pk):
            p_ = np.searchsorted(pk, s)
            if p_ < len(pk) and pk[p_] == s:
                continue
        if r in rootmin:
            new_sigs_l.append(s)
            new_labs_l.append(rootmin[r])
    add_k = np.array(new_sigs_l, dtype=np.int64)
    add_v = np.array(new_labs_l, dtype=np.int64)
    all_k = np.concatenate([pk, add_k])
    all_v = np.concatenate([new_plab, add_v])
    o = np.argsort(all_k, kind="stable")
    new_keys, new_labels = all_k[o], all_v[o]
    changed_sigs = np.union1d(changed_parent_sigs, add_k)

    parent_rows = store.manifest(parent)["stages"]["verified_pairs"]["rows"]
    n_pairs_total = int(parent_rows) + n_own

    # disjoint-crawl short-circuit evidence: the delta shares no text with
    # the parent (no sig collision) and every new pair stays inside the
    # delta — then no parent doc's cluster row can change and the caller
    # may assign over docs_new_meta ALONE (fully delta-bounded clusters)
    shares_text = bool(len(sk)) and bool(_in_sorted(sk, dsig).any())
    crosses = bool(len(endpoints)) and not bool(_in_sorted(dsig, endpoints).all())
    delta_disjoint = not shares_text and not crosses
    return (
        new_keys,
        new_labels,
        changed_sigs,
        n_pairs_total,
        usk,
        usv,
        delta_disjoint,
    )


def _meta_of(docs_ds):
    return docs_ds.select_columns(["doc_id", "url", "text_sha256"])


def _arrow(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _packed_schema(nperm: int) -> pa.Schema:
    """Persisted signature layout: minhash components stored as their LOW 32
    BITS (verify compares by 32-bit equality everywhere — see
    stages/verify.broadcast_signatures — so the high halves never matter
    after banding, and banding always runs on the in-memory u64 matrix
    BEFORE compaction). Halves the dominant snapshot-store column."""
    return pa.schema(
        [
            ("doc_id", pa.int64()),  # = sig_id (content key)
            ("minhash", pa.binary(nperm * 4)),
            ("simhash", pa.int64()),
            ("n_shingles", pa.int32()),
        ]
    )


_META_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("url", pa.string()), ("text_sha256", pa.string())]
)
_LSH_SCHEMA = pa.schema([("bucket", pa.int64()), ("doc_id", pa.int64())])
_PAIRS_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("est_jaccard", pa.float32()),
        ("hamming", pa.uint8()),
    ]
)
_CLUSTERS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("cluster_id", pa.int64()),
        ("is_canonical", pa.bool_()),
    ]
)


def _nonempty(ds, schema: pa.Schema):
    """0-row datasets may write zero parquet files; substitute a schema-typed
    empty table so every stage part dir has a readable file."""
    if ds.count() == 0:
        return rd.from_arrow(schema.empty_table())
    return ds


def _pack_sigs(sig_ds, nperm: int):
    """Signed delta reps → in-memory snapshot layout: doc_id := sig_id
    (content key), minhash as fixed-width u64 binary (banding needs the full
    values), simhash bit-cast to int64."""

    def fn(t: pa.Table) -> pa.Table:
        _, mh, sim, nsh = signatures_to_numpy(t, nperm)
        sg = sig_ids_from_sha(t["text_sha256"])
        mh_bin = pa.Array.from_buffers(
            pa.binary(nperm * 8),
            len(sg),
            [None, pa.py_buffer(np.ascontiguousarray(mh).tobytes())],
        )
        return pa.table(
            {
                "doc_id": pa.array(sg, type=pa.int64()),
                "minhash": mh_bin,
                "simhash": pa.array(sim.view(np.int64), type=pa.int64()),
                "n_shingles": pa.array(nsh.astype(np.int32), type=pa.int32()),
            }
        )

    return sig_ds.map_batches(fn, batch_format="pyarrow")


def _compact_sigs_u32(sig_ds, nperm: int):
    """In-memory u64 packed signatures → persisted u32 layout (low halves;
    equality semantics preserved — see _packed_schema)."""

    def fn(t: pa.Table) -> pa.Table:
        ids, mh, sim, nsh = signatures_to_numpy(t, nperm)
        mh32 = np.ascontiguousarray(mh.astype(np.uint32))
        mh_bin = pa.Array.from_buffers(
            pa.binary(nperm * 4), len(ids), [None, pa.py_buffer(mh32.tobytes())]
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "minhash": mh_bin,
                "simhash": pa.array(sim.view(np.int64), type=pa.int64()),
                "n_shingles": pa.array(nsh.astype(np.int32), type=pa.int32()),
            }
        )

    return sig_ds.map_batches(fn, batch_format="pyarrow")


def _decorate_part(p: int):
    """(bucket, sig_id) rows → + coarse shuffle key (recomputed at use time:
    the persisted index stores no partition count)."""

    def fn(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": pa.array(
                    (b & np.int64(p - 1)).astype(np.int32), type=pa.int32()
                ),
                "bucket": t["bucket"],
                "doc_id": t["doc_id"],
            }
        )

    return fn


def _lookup_sorted_parts(dirs: list[str], key: str, val: str, wanted: np.ndarray):
    """Point-lookup of ``wanted`` (sorted int64 keys) against the per-part
    sorted index sidecars of a keyed stage: one Ray task per part memmaps
    the key array, binary-searches every wanted key at once and gathers only
    the hit rows — I/O bounded by hits + log-depth index pages, NOT the part
    size (the delta-bounded replacement for the full-part parquet scan).
    Returns a Dataset of (key, val) hit rows, or None when any part lacks
    its sidecar (caller falls back to the scan)."""
    paths = part_sorted_index_paths(dirs, key, val)
    if paths is None:
        return None
    want_ref = ray.put(np.ascontiguousarray(wanted, dtype=np.int64))
    tables = ray.get(
        [_index_lookup.remote(kp, vp, want_ref, key, val) for kp, vp in paths]
    )
    return rd.from_arrow(tables)


def _broadcast_sigs_from_parts(dirs: list[str], pair_ids: np.ndarray, nperm: int):
    """Assemble the verify broadcast tuple (ids_sorted, order, mh u32, sim
    u64) by memmapped binary-search GATHER of pair members' rows from the
    per-part sorted signature indexes — I/O bounded by pair members, not the
    signatures stage size (sig_ids are content keys: each id lives in
    exactly one part, so per-part hits concatenate without dedup). Returns
    an ObjectRef for verify_pairs_broadcast_fused(sig_ref=...), or None when
    any part lacks its index (caller falls back to the stage scan)."""
    paths = part_sorted_index_paths(dirs, "doc_id", "sigpl")
    if paths is None:
        return None
    want_ref = ray.put(np.ascontiguousarray(pair_ids, dtype=np.int64))
    width = nperm * 4 + 8
    return _sig_tuple_assemble.remote(
        nperm,
        width,
        *[_index_gather.remote(ip, pp, want_ref, width) for ip, pp in paths],
    )


# sub-phase walls of the most recent merge's verified_pairs stage — the
# auditable "where did the merge floor go" record (surfaced by bench --merge)
MERGE_PAIR_WALLS: dict = {}


def _emit_verify(
    rows_ds,
    sig_view_ds,
    cfg: DedupConfig,
    p: int,
    exclude_pairs=None,
    involved: np.ndarray | None = None,
    sig_part_dirs: list[str] | None = None,
):
    """(bucket, sig_id) rows → verified pairs: coarse-partition emission
    (window-capped, see stages/lsh.py) then the fused distinct+verify
    exchange.

    ``involved`` (sorted sig_ids) keeps only pairs touching that set — the
    merge path passes the delta's + resurrected sigs, because any pair NOT
    involving them is already persisted in the parent stage (old-old window
    pairs of a grown bucket are at most a superset-vs-parent difference,
    and parent pairs are kept, so composed connectivity only grows — the
    same superset contract the emission caps already carry).
    ``exclude_pairs`` (sorted S16 keys) drops pairs already persisted before
    they are re-verified (resurrected sigs' previous pairs)."""
    emit = _emit_group(cfg)
    inv_ref = ray.put(involved) if involved is not None else None
    excl_ref = ray.put(exclude_pairs) if exclude_pairs is not None and len(exclude_pairs) else None

    def emit_filtered(df):
        out = emit(df)
        if inv_ref is not None:
            inv = ray.get(inv_ref)
            a = out["a"].to_numpy()
            b = out["b"].to_numpy()
            out = out[_in_sorted(inv, a) | _in_sorted(inv, b)]
        if excl_ref is not None:
            ex = ray.get(excl_ref)
            k = i64_pair_to_key16(out["a"].to_numpy(), out["b"].to_numpy())
            pos = np.searchsorted(ex, k)
            pos[pos >= len(ex)] = 0
            out = out[ex[pos] != k]
        return out

    t0 = time.monotonic()
    raw = _arrow(
        rows_ds.map_batches(_decorate_part(p), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_filtered, batch_format="pandas")
    ).materialize()
    MERGE_PAIR_WALLS["emit_shuffle_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()

    from imagededupx_ray.pipelines.dedup import _block_uniq

    ids_l = [
        u for u in ray.get([_block_uniq.remote(r) for r in raw.to_arrow_refs()]) if len(u)
    ]
    pair_ids = np.unique(np.concatenate(ids_l)) if ids_l else _EMPTY
    MERGE_PAIR_WALLS["pair_ids_sec"] = round(time.monotonic() - t0, 3)
    sig_ref = None
    if sig_part_dirs is not None:
        # pair-member-bounded gather from the sorted signature indexes
        # instead of scanning every signature part (merge-floor component)
        sig_ref = _broadcast_sigs_from_parts(sig_part_dirs, pair_ids, cfg.num_perms)
    MERGE_PAIR_WALLS["sig_bcast_mode"] = "index" if sig_ref is not None else "scan"
    return verify_pairs_broadcast_fused(
        raw, sig_view_ds, cfg, pair_ids=pair_ids, sig_ref=sig_ref
    )


# ----------------------------------------------------------------- pipeline
def build_snapshot(
    store: SnapshotStore,
    pages_ds,
    snapshot: str,
    parent: str | None = None,
    cfg: DedupConfig = DEFAULT_CONFIG,
    tombstones: list[str] | None = None,
):
    """Full build (parent=None) or incremental merge of a new pages snapshot
    into an existing one. Persists docs_meta / signatures / lsh_index /
    verified_pairs / clusters stages + sidecars + a lineage manifest; returns
    the clusters Dataset.

    RESUMABLE: stages are written atomically (tmp + rename) as they complete;
    re-running after a crash reuses every finished stage — once the
    ``signatures`` stage exists no text is ever re-signed (the delta is
    recoverable from the stage's own part dir, so the pages input may even be
    empty on resume), and a fully complete snapshot returns immediately
    (replaces the reference's rebuild-everything-from-cache,
    improved_faiss_detector.py:456-457).

    TOMBSTONES (reference v3 deletes): ``tombstones`` is a list of urls
    removed in this snapshot. Their rows leave the docs_meta view via the
    ``dead_row_keys`` sidecar; texts with no remaining member become extinct
    (``extinct_sig_ids`` sidecar), hiding their signature, band rows and
    pairs at read time — nothing is rewritten, and a later re-add revives the
    stored state in place."""
    store.init_snapshot(snapshot, parent=parent)
    if parent is not None:
        store.check_config(parent)
    if store.is_complete(snapshot):
        return store.read_stage(snapshot, "clusters")
    t_start = time.monotonic()
    MERGE_PAIR_WALLS.clear()
    p = _pow2(suggest_num_partitions(per_cpu=2))
    nperm = cfg.num_perms

    # ---- tombstone sidecar (input record; resume-stable) -----------------
    if store.has_sidecar(snapshot, "tombstone_ids"):
        dead_new = store.read_sidecar(snapshot, "tombstone_ids")
    else:
        dead_new = np.unique(H.id_hash_array(list(tombstones or ())))
        store.write_sidecar(snapshot, "tombstone_ids", dead_new)

    parent_meta_rows = parent_sig_rows = parent_lsh_rows = 0
    parent_dead = parent_extinct = _EMPTY
    parent_meta_dirs: list[str] = []
    parent_sig_dirs: list[str] = []
    parent_lsh_dirs: list[str] = []
    parent_pair_dirs: list[str] = []
    if parent is not None:
        pm = store.manifest(parent)
        parent_meta_rows = pm["stages"]["docs_meta"]["rows"]
        parent_sig_rows = pm["stages"]["signatures"]["rows"]
        parent_lsh_rows = pm["stages"]["lsh_index"]["rows"]
        parent_dead = store.read_sidecar(parent, "dead_row_keys")
        parent_extinct = store.read_sidecar(parent, "extinct_sig_ids")
        parent_meta_dirs = store.stage_dirs(parent, "docs_meta")
        parent_sig_dirs = store.stage_dirs(parent, "signatures")
        parent_lsh_dirs = store.stage_dirs(parent, "lsh_index")
        parent_pair_dirs = store.stage_dirs(parent, "verified_pairs")

    resume_meta = store.has_stage(snapshot, "docs_meta")
    resume_sig = store.has_stage(snapshot, "signatures")

    sig_delta = None
    if resume_sig:
        # delta fully recoverable from own part dirs; sidecars were written
        # before the signatures stage, so just read them back
        dead_all = store.read_sidecar(snapshot, "dead_row_keys")
        extinct_all = store.read_sidecar(snapshot, "extinct_sig_ids")
        resurrected = np.setdiff1d(parent_extinct, extinct_all)
        cluster_patch_aux_ok = store.has_sidecar(snapshot, "cluster_patch_sigs")
        cluster_patch_docs_aux = store.read_sidecar(snapshot, "cluster_patch_docs")
        cluster_patch_sigs_aux = store.read_sidecar(snapshot, "cluster_patch_sigs")
        docs_new_meta = store.read_stage_own(snapshot, "docs_meta").materialize()
        n_new = docs_new_meta.count()
        sig_delta = store.read_stage_own(snapshot, "signatures").materialize()
        # write order guarantees lsh_index precedes signatures (banding needs
        # the u64 matrix the persisted layout no longer carries)
        lsh_delta = store.read_stage_own(snapshot, "lsh_index").materialize()
    else:
        # ---- delta extraction (this merge's tombstones beat its adds) ----
        docs_new = extract_stage(pages_ds)
        if len(dead_new):
            docs_new = _filter_ds(docs_new, _col_i64("doc_id"), dead_new, False)
        docs_new = docs_new.materialize()
        delta_combos = _collect_unique_i64(
            docs_new.select_columns(["doc_id", "text_sha256"]), doc_sig_combo
        )
        delta_sigs = _collect_unique_i64(
            docs_new.select_columns(["text_sha256"]), _sig_of
        )

        # ---- dead-row bookkeeping (tombstone/delta-bounded) --------------
        n_killed = 0
        killed_combos = _EMPTY
        cand_sigs = _EMPTY
        if parent is not None and len(dead_new):
            killed = _filter_ds(
                store.read_stage(parent, "docs_meta"), _col_i64("doc_id"), dead_new, True
            ).materialize()
            n_killed = killed.count()
            if n_killed:
                killed_combos = _collect_unique_i64(killed, doc_sig_combo)
                cand_sigs = _collect_unique_i64(killed, _sig_of)
        revived = np.intersect1d(delta_combos, parent_dead)
        revived_docs = (
            _collect_unique_i64(
                _filter_ds(docs_new, doc_sig_combo, revived, True), _col_i64("doc_id")
            )
            if len(revived)
            else _EMPTY
        )

        # ---- delta classification against the parent's PHYSICAL rows -----
        # one narrow scan serves both outcomes (reference M10 new/modified,
        # improved_faiss_detector.py:269-295):
        #   seen       = same (url, content) combo already stored  → nothing
        #                to rewrite (revived rows fall out here too)
        #   superseded = same url, DIFFERENT content → last-write-wins: the
        #                parent row becomes a dead row (like a tombstone
        #                kill, except the doc stays live under its new text)
        seen = _EMPTY
        superseded_combos = _EMPTY
        superseded_sigs = _EMPTY
        n_super = 0
        if parent is not None and docs_new.count() > 0:
            delta_doc_ids_pre = _collect_unique_i64(
                docs_new.select_columns(["doc_id"]), _col_i64("doc_id")
            )
            # classification key is the url hash alone: ``combo`` is a hash
            # of (doc_id, sig), so a stored row can only classify a delta
            # url whose doc_id it shares
            idx_paths = _meta_index_paths(parent_meta_dirs)
            if idx_paths is not None:
                # delta-bounded probe: binary-search the delta's urls in the
                # memmapped per-part (doc_id → combo, sig) indexes — I/O is
                # hits + log-depth index pages, not the stored corpus
                MERGE_PAIR_WALLS["class_mode"] = "index"
                want_ref = ray.put(
                    np.ascontiguousarray(delta_doc_ids_pre, dtype=np.int64)
                )
                hit_tables = [
                    t
                    for t in ray.get(
                        [
                            _meta_index_lookup.remote(kp, cp, sp, want_ref)
                            for kp, cp, sp in idx_paths
                        ]
                    )
                    if t.num_rows
                ]
            else:
                MERGE_PAIR_WALLS["class_mode"] = "scan"
                docs_ref = ray.put(delta_doc_ids_pre)

                def hit_fn(t: pa.Table) -> pa.Table:
                    if t.num_rows == 0:
                        return pa.table(
                            {"combo": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.int64())}
                        )
                    m = _in_sorted(
                        ray.get(docs_ref),
                        t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    )
                    t = t.filter(pa.array(m))
                    return pa.table(
                        {
                            "combo": pa.array(doc_sig_combo(t), type=pa.int64()),
                            "sig": pa.array(_sig_of(t), type=pa.int64()),
                        }
                    )

                hit_tables = [
                    b
                    for b in rd.read_parquet(
                        parquet_files(parent_meta_dirs),
                        columns=["doc_id", "text_sha256"],
                    )
                    .map_batches(hit_fn, batch_format="pyarrow")
                    .iter_batches(batch_size=1 << 18, batch_format="pyarrow")
                    if b.num_rows
                ]
            if hit_tables:
                hits = pa.concat_tables(hit_tables)
                combos_h = hits["combo"].to_numpy(zero_copy_only=False).astype(np.int64)
                in_delta = _in_sorted(delta_combos, combos_h)
                seen = np.unique(combos_h[in_delta])
                if not in_delta.all():
                    sigs_h = hits["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
                    superseded_combos = np.unique(combos_h[~in_delta])
                    superseded_sigs = np.unique(sigs_h[~in_delta])
                    n_super = int(
                        (~_in_sorted(parent_dead, superseded_combos)).sum()
                    )
                    cand_sigs = np.union1d(cand_sigs, superseded_sigs)

        dead_all = np.union1d(
            np.union1d(np.setdiff1d(parent_dead, revived), killed_combos),
            superseded_combos,
        )
        store.write_sidecar(snapshot, "dead_row_keys", dead_all)

        if len(seen):
            docs_new = _filter_ds(docs_new, doc_sig_combo, seen, False).materialize()
        docs_new_meta = _meta_of(docs_new).materialize()
        n_new = docs_new_meta.count()

        # ---- extinction / resurrection -----------------------------------
        resurrected = np.intersect1d(parent_extinct, delta_sigs)
        extinct_all = np.setdiff1d(parent_extinct, resurrected)
        if len(cand_sigs):
            # candidates keep their signature iff a member doc survives in
            # the POST-merge view (parent physical ∪ delta, minus dead rows)
            view = rd.read_parquet(parquet_files(parent_meta_dirs)).union(docs_new_meta)
            if len(dead_all):
                view = _filter_ds(view, doc_sig_combo, dead_all, False)
            alive = np.array(
                sorted(
                    _min_per_key(view, _sig_of, _col_i64("doc_id"), cand_sigs).keys()
                ),
                dtype=np.int64,
            )
            extinct_all = np.union1d(extinct_all, np.setdiff1d(cand_sigs, alive))
        store.write_sidecar(snapshot, "extinct_sig_ids", extinct_all)

        if parent is not None:
            # aux inputs for the patch-based clusters merge, persisted so a
            # crash-resume can rebuild the patch filter without the pages
            # input: docs revived by this delta, and sigs whose exact-dedup
            # canonical may shift (delta member adds, tombstone member
            # removals, resurrections) — all delta/tombstone-bounded
            cluster_patch_docs_aux = revived_docs
            cluster_patch_sigs_aux = np.union1d(
                np.union1d(delta_sigs, cand_sigs), resurrected
            )
            store.write_sidecar(snapshot, "cluster_patch_docs", cluster_patch_docs_aux)
            store.write_sidecar(snapshot, "cluster_patch_sigs", cluster_patch_sigs_aux)
        cluster_patch_aux_ok = True

        if not resume_meta:
            meta_own_dir = store.write_stage(
                snapshot,
                "docs_meta",
                _nonempty(docs_new_meta, _META_SCHEMA),
                t0=t_start,
                parent_dirs=parent_meta_dirs,
                exclude={"sidecar": "dead_row_keys", "columns": ["doc_sig_combo"]},
                rows=parent_meta_rows - n_killed - n_super + len(revived) + n_new,
            )
            # sorted (doc_id → combo, sig) lookup index over the OWN part:
            # future merges classify their deltas by memmapped binary
            # search instead of scanning every stored meta row
            write_part_meta_index(meta_own_dir)

        # ---- signatures: sign ONLY never-seen texts ----------------------
        t0 = time.monotonic()
        if n_new > 0:
            # one representative per distinct NEW text (exact-dedup winners
            # of the delta — no text ever shuffles)
            reps, _ = exact_dedup(docs_new, strategy="broadcast")
            if parent_sig_dirs:
                # texts already signed anywhere in the lineage (extinct ones
                # included — resurrection reuses them): membership probe of
                # the delta's sig ids against the per-part sorted signature
                # indexes (delta-bounded), else one column-pruned scan of
                # the physical parts, delta-restricted
                sig_idx = part_sorted_index_paths(parent_sig_dirs, "doc_id", "sigpl")
                if sig_idx is not None:
                    want_ref = ray.put(
                        np.ascontiguousarray(delta_sigs, dtype=np.int64)
                    )
                    hits = ray.get(
                        [_index_member.remote(kp, want_ref) for kp, _ in sig_idx]
                    )
                    signed = np.unique(np.concatenate(hits)) if hits else _EMPTY
                else:
                    signed = _collect_unique_i64(
                        _filter_ds(
                            rd.read_parquet(
                                parquet_files(parent_sig_dirs), columns=["doc_id"]
                            ),
                            _col_i64("doc_id"),
                            delta_sigs,
                            True,
                        ),
                        _col_i64("doc_id"),
                    )
                if len(signed):
                    reps = _filter_ds(reps, _sig_of, signed, False)
            sig_delta = _pack_sigs(
                signature_stage(reps, cfg, passthrough_sha=True), nperm
            ).materialize()
        else:
            sig_delta = rd.from_arrow(_packed_schema(nperm).empty_table())

        # ---- lsh_index from the IN-MEMORY u64 signatures (bucket hashes
        # are defined over full u64 components; the persisted signature
        # layout keeps only the low 32 bits, so banding must precede
        # compaction — hence lsh_index is written BEFORE signatures) -------
        if not store.has_stage(snapshot, "lsh_index"):
            t1 = time.monotonic()
            lsh_delta = (
                sig_delta.map_batches(
                    explode_bands(cfg, partitions=p),
                    batch_format="pyarrow",
                    batch_size=4096,
                )
                .select_columns(["bucket", "doc_id"])
                .materialize()
            )
            own_dir = store.write_stage(
                snapshot,
                "lsh_index",
                _nonempty(lsh_delta, _LSH_SCHEMA),
                t0=t1,
                parent_dirs=parent_lsh_dirs,
                exclude={"sidecar": "extinct_sig_ids", "columns": ["doc_id"]},
                # physical rows (read-time extinct filter not folded in)
                rows=parent_lsh_rows + lsh_delta.count(),
            )
            # sorted point-lookup index over the OWN part (parents carry
            # theirs from their own builds): future merges binary-search the
            # memmapped bucket array instead of scanning every part
            write_part_sorted_index(own_dir, "bucket", "doc_id")
        else:
            lsh_delta = store.read_stage_own(snapshot, "lsh_index").materialize()

        n_newly_extinct = len(extinct_all) - len(parent_extinct) + len(resurrected)
        n_signed = sig_delta.count()
        sig_delta = _compact_sigs_u32(sig_delta, nperm).materialize()
        sig_own_dir = store.write_stage(
            snapshot,
            "signatures",
            _nonempty(sig_delta, _packed_schema(nperm)),
            t0=t0,
            parent_dirs=parent_sig_dirs,
            exclude={"sidecar": "extinct_sig_ids", "columns": ["doc_id"]},
            rows=parent_sig_rows + n_signed + len(resurrected) - n_newly_extinct,
        )
        # sorted verify-payload index over the OWN part (see lsh_index above)
        write_part_sig_index(sig_own_dir)

    meta_all = None  # materialized lazily — the disjoint merge path never needs it

    def _meta_all():
        nonlocal meta_all
        if meta_all is None:
            _tm = time.monotonic()
            meta_all = store.read_stage(snapshot, "docs_meta").materialize()
            MERGE_PAIR_WALLS["meta_all_sec"] = round(time.monotonic() - _tm, 3)
        return meta_all

    # ---- verified_pairs: re-emit only delta-touched buckets --------------
    if not store.has_stage(snapshot, "verified_pairs"):
        t0 = time.monotonic()
        if parent is None:
            pairs_delta = _emit_verify(lsh_delta, sig_delta, cfg, p).materialize()
            n_pairs = pairs_delta.count()
        else:
            sig_view = rd.read_parquet(parquet_files(store.stage_dirs(snapshot, "signatures")))
            _tp = time.monotonic()
            touched, delta_multi = _uniq_and_multi(lsh_delta, _col_i64("bucket"))
            if len(resurrected):
                res_rows = _filter_ds(
                    rd.read_parquet(parquet_files(parent_lsh_dirs)),
                    _col_i64("doc_id"),
                    resurrected,
                    True,
                )
                touched = np.union1d(
                    touched, _collect_unique_i64(res_rows, _col_i64("bucket"))
                )
            # pairs surviving from the parent under the NEW extinct filter
            # (counted in the same narrow scan that collects the existing
            # pairs of touched members for re-emission dedup)
            if len(touched) == 0:
                pairs_delta = rd.from_arrow(_PAIRS_SCHEMA.empty_table())
            else:
                # delta-bounded path: binary-search the per-part sorted
                # bucket indexes (I/O = hits + index pages); parquet scan
                # only when some parent part predates the sidecars
                stored = _lookup_sorted_parts(
                    parent_lsh_dirs, "bucket", "doc_id", touched
                )
                if stored is None:
                    stored = _filter_ds(
                        rd.read_parquet(parquet_files(parent_lsh_dirs)),
                        _col_i64("bucket"),
                        touched,
                        True,
                    )
                if len(extinct_all):
                    stored = _filter_ds(stored, _col_i64("doc_id"), extinct_all, False)
                # every stored row shares its bucket with >= 1 delta row, so
                # stored is collision-only; materialize it (small) and use its
                # buckets to drop the delta's SINGLETON buckets before the
                # emit shuffle — a delta row alone in its bucket can never
                # pair, and most delta band rows are singletons (measured:
                # 3.7M delta rows -> collision rows only, emit shuffle 7.4s
                # -> sub-second at 1.2M/32cpus). Pairs need >= 2 members: a
                # delta row pairs either with a stored row (bucket in
                # stored_buckets) or another delta row (bucket in delta_multi).
                MERGE_PAIR_WALLS["delta_multi_sec"] = round(time.monotonic() - _tp, 3)
                _ts = time.monotonic()
                stored = _arrow(stored).materialize()
                MERGE_PAIR_WALLS["stored_scan_sec"] = round(time.monotonic() - _ts, 3)
                _ts = time.monotonic()
                stored_buckets = _collect_unique_i64(stored, _col_i64("bucket"))
                keep_buckets = np.union1d(stored_buckets, delta_multi)
                lsh_coll = _arrow(
                    _filter_ds(lsh_delta, _col_i64("bucket"), keep_buckets, True)
                ).materialize()
                MERGE_PAIR_WALLS["coll_filter_sec"] = round(time.monotonic() - _ts, 3)
                # only pairs INVOLVING a newly-signed or resurrected sig are
                # new — everything else is already in the parent stage
                involved = np.union1d(
                    _collect_unique_i64(lsh_delta, _col_i64("doc_id")), resurrected
                )
                MERGE_PAIR_WALLS["touched_collect_sec"] = round(
                    time.monotonic() - _tp, 3
                )
                exclude_pairs = None
                if len(resurrected):
                    # resurrected sigs' previous pairs re-emit — drop them via
                    # one narrow scan of the physical parent pairs (skipped
                    # entirely on tombstone-free merges)
                    prev_phys = rd.read_parquet(
                        parquet_files(parent_pair_dirs), columns=["a", "b"]
                    )
                    kept = []
                    res_hit = _filter_ds(prev_phys, _col_i64("a"), resurrected, True).union(
                        _filter_ds(prev_phys, _col_i64("b"), resurrected, True)
                    )
                    for b in res_hit.iter_batches(
                        batch_size=1 << 18, batch_format="pyarrow"
                    ):
                        kept.append(
                            i64_pair_to_key16(
                                b["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                                b["b"].to_numpy(zero_copy_only=False).astype(np.int64),
                            )
                        )
                    exclude_pairs = (
                        np.unique(np.concatenate(kept)) if kept else np.empty(0, "S16")
                    )
                _tv = time.monotonic()
                pairs_delta = _emit_verify(
                    stored.union(lsh_coll),
                    sig_view,
                    cfg,
                    p,
                    exclude_pairs=exclude_pairs,
                    involved=involved,
                    sig_part_dirs=store.stage_dirs(snapshot, "signatures"),
                ).materialize()
                MERGE_PAIR_WALLS["verify_sec"] = round(
                    time.monotonic()
                    - _tv
                    - MERGE_PAIR_WALLS.get("emit_shuffle_sec", 0)
                    - MERGE_PAIR_WALLS.get("pair_ids_sec", 0),
                    3,
                )
        store.write_stage(
            snapshot,
            "verified_pairs",
            _nonempty(pairs_delta, _PAIRS_SCHEMA),
            t0=t0,
            parent_dirs=parent_pair_dirs,
            exclude={"sidecar": "extinct_sig_ids", "columns": ["a", "b"]},
            # logical rows counted below inside the DSU stream (no extra scan)
            rows=-1,
        )
    # ---- union-find + clusters (sig-space roots → min-doc labels) --------
    # Mutation-free merges (no tombstones / revivals / supersedes /
    # resurrections — the append-only common case) maintain the label map
    # INCREMENTALLY: DSU over delta pairs + touched parent component label
    # nodes, per-sig minima via the sig_min_doc sidecar (VERDICT r4 #8) —
    # no full-pair DSU, no corpus canonical scan. When additionally the
    # delta shares no text with the parent and no pair crosses, the whole
    # clusters stage is delta-bounded (assign over docs_new_meta alone).
    t0 = time.monotonic()
    no_mutations = (
        parent is not None
        and cluster_patch_aux_ok
        and len(dead_new) == 0
        and len(resurrected) == 0
        and len(cluster_patch_docs_aux) == 0
        and np.array_equal(dead_all, parent_dead)
    )
    inc = None
    if no_mutations:
        _tc = time.monotonic()
        inc = _incremental_labels(store, snapshot, parent, docs_new_meta)
        if inc is not None:
            MERGE_PAIR_WALLS["cl_inc_labels_sec"] = round(time.monotonic() - _tc, 3)
    if inc is not None:
        (new_keys, new_labels, changed_sigs, n_pairs_total, usk, usv,
         delta_disjoint) = inc
        pm_ent = store.manifest(snapshot)["stages"]["verified_pairs"]
        if pm_ent.get("rows") != n_pairs_total:
            pm_ent["rows"] = int(n_pairs_total)
            store._update_manifest(snapshot, stage_update={"verified_pairs": pm_ent})
        _tc = time.monotonic()
        parent_excl = store.read_sidecar(parent, "patched_cluster_docs")
        delta_doc_ids = (
            _collect_unique_i64(docs_new_meta, _col_i64("doc_id"))
            if n_new > 0
            else _EMPTY
        )
        # exact-dedup canonical via the freshly-merged sig_min_doc minima —
        # no dup-group exchange over the corpus (sig-space keying, same
        # collision tolerance as the label map itself)
        canon_ref = ray.put((usk, usv))
        if delta_disjoint and len(parent_excl) == 0:
            # fully delta-bounded clusters: no parent row can change and no
            # prior patch rows need carrying forward — assign over the
            # delta meta alone (dup groups are delta-internal: no shared
            # text with the parent by the disjoint check)
            MERGE_PAIR_WALLS["cl_path"] = "disjoint"
            clusters_patch = _assign_clusters_sigspace(
                docs_new_meta, None, new_keys, new_labels,
                sig_canon_ref=canon_ref,
            ).materialize()
            patch_docs_emitted = delta_doc_ids
        else:
            MERGE_PAIR_WALLS["cl_path"] = "incremental"
            patch_sigs = np.union1d(changed_sigs, cluster_patch_sigs_aux)
            patch_docs = np.union1d(delta_doc_ids, parent_excl)
            clusters_patch = _assign_clusters_sigspace(
                # lazy read: the filter-and-assign map fuses with the
                # parquet scan — no full-corpus materialize on this path
                store.read_stage(snapshot, "docs_meta"),
                None,
                new_keys,
                new_labels,
                only_docs=patch_docs,
                only_sigs=patch_sigs,
                sig_canon_ref=canon_ref,
            ).materialize()
            patch_docs_emitted = _collect_unique_i64(
                clusters_patch, _col_i64("doc_id")
            )
        excl_new = np.union1d(parent_excl, patch_docs_emitted)
        store.write_sidecar_cols(
            snapshot, "cluster_sig_labels", {"sig": new_keys, "label": new_labels}
        )
        store.write_sidecar_cols(
            snapshot, "sig_min_doc", {"sig": usk, "min_doc": usv}
        )
        store.write_sidecar(snapshot, "patched_cluster_docs", excl_new)
        MERGE_PAIR_WALLS["cl_assign_sec"] = round(time.monotonic() - _tc, 3)
        store.write_stage(
            snapshot,
            "clusters",
            _nonempty(clusters_patch, _CLUSTERS_SCHEMA),
            t0=t0,
            parent_dirs=store.stage_dirs(parent, "clusters"),
            exclude={
                "sidecar": "patched_cluster_docs",
                "columns": ["doc_id"],
                "scope": "parents",
            },
            rows=store.manifest(snapshot)["stages"]["docs_meta"]["rows"],
        )
        return store.read_stage(snapshot, "clusters")

    verified_all = store.read_stage(snapshot, "verified_pairs")
    dup_ref = _dup_groups_broadcast(_meta_all(), p)
    MERGE_PAIR_WALLS["cl_dupgroups_sec"] = round(time.monotonic() - t0, 3)
    _tc = time.monotonic()
    dsu = DictDSU()
    n_pairs_total = 0
    for b in verified_all.select_columns(["a", "b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        n_pairs_total += b.num_rows
        dsu.union_arrays(
            b["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["b"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    MERGE_PAIR_WALLS["cl_dsu_sec"] = round(time.monotonic() - _tc, 3)
    pm_ent = store.manifest(snapshot)["stages"]["verified_pairs"]
    if pm_ent.get("rows") != n_pairs_total:
        pm_ent["rows"] = int(n_pairs_total)
        store._update_manifest(snapshot, stage_update={"verified_pairs": pm_ent})
    nodes = np.fromiter(dsu.p.keys(), dtype=np.int64, count=len(dsu.p))
    nodes.sort()
    # min member doc per paired sig (pair-bounded), then min over each root's
    # sigs = the component's canonical doc id
    _tc = time.monotonic()
    canon_per_sig = _min_per_key(_meta_all(), _sig_of, _col_i64("doc_id"), nodes)
    MERGE_PAIR_WALLS["cl_canon_sec"] = round(time.monotonic() - _tc, 3)
    _tc = time.monotonic()
    rootmin: dict[int, int] = {}
    roots: dict[int, int] = {}
    for s in nodes.tolist():
        r = dsu.find(s)
        roots[s] = r
        c = canon_per_sig.get(s)
        if c is not None:
            rootmin[r] = min(rootmin.get(r, c), c)
    sig_l, cl_l = [], []
    for s in nodes.tolist():
        r = roots[s]
        if r in rootmin:
            sig_l.append(s)
            cl_l.append(rootmin[r])
    sig_arr = np.array(sig_l, dtype=np.int64)
    cl_arr = np.array(cl_l, dtype=np.int64)
    order = np.argsort(sig_arr)
    new_keys, new_labels = sig_arr[order], cl_arr[order]

    # maintain the per-sig minimum sidecar for future incremental merges
    # (distinct-text-bounded write; computed from the already-materialized
    # meta view)
    _ts = time.monotonic()
    smk, smv = _sigmin_of_ds(_meta_all())
    store.write_sidecar_cols(snapshot, "sig_min_doc", {"sig": smk, "min_doc": smv})
    MERGE_PAIR_WALLS["cl_sigmin_sec"] = round(time.monotonic() - _ts, 3)

    use_patch = (
        parent is not None
        and cluster_patch_aux_ok
        and store.has_sidecar(parent, "cluster_sig_labels")
    )
    if use_patch:
        # ---- patch-based clusters: rewrite only docs whose row can differ
        # from the parent's, compose the rest from the parent parts. The
        # label diff against the parent's persisted (sig, label) sidecar is
        # the authoritative catch-all for every pair-path change (component
        # merges/splits, canonical shifts, tombstone fallout); the aux sets
        # cover the exact-dedup canonical path and revivals. The patch also
        # carries forward the parent's previously-patched rows, so every doc
        # in the cumulative exclusion sidecar has its live row in the NEWEST
        # patch part (read_stage scope="parents" composition); compact_stage
        # resets the churn when it accumulates.
        pl = store.read_sidecar_cols(parent, "cluster_sig_labels")
        changed_sigs = _changed_label_sigs(
            pl.get("sig", _EMPTY), pl.get("label", _EMPTY), new_keys, new_labels
        )
        patch_sigs = np.union1d(changed_sigs, cluster_patch_sigs_aux)
        delta_doc_ids = (
            _collect_unique_i64(docs_new_meta, _col_i64("doc_id"))
            if n_new > 0
            else _EMPTY
        )
        parent_excl = store.read_sidecar(parent, "patched_cluster_docs")
        patch_docs = np.union1d(
            np.union1d(delta_doc_ids, cluster_patch_docs_aux), parent_excl
        )
        clusters_patch = _assign_clusters_sigspace(
            _meta_all(),
            dup_ref,
            new_keys,
            new_labels,
            only_docs=patch_docs,
            only_sigs=patch_sigs,
        ).materialize()
        emitted = _collect_unique_i64(clusters_patch, _col_i64("doc_id"))
        excl_new = np.union1d(np.union1d(parent_excl, emitted), dead_new)
        store.write_sidecar_cols(
            snapshot, "cluster_sig_labels", {"sig": new_keys, "label": new_labels}
        )
        store.write_sidecar(snapshot, "patched_cluster_docs", excl_new)
        MERGE_PAIR_WALLS["cl_assign_sec"] = round(time.monotonic() - _tc, 3)
        store.write_stage(
            snapshot,
            "clusters",
            _nonempty(clusters_patch, _CLUSTERS_SCHEMA),
            t0=t0,
            parent_dirs=store.stage_dirs(parent, "clusters"),
            exclude={
                "sidecar": "patched_cluster_docs",
                "columns": ["doc_id"],
                "scope": "parents",
            },
            rows=store.manifest(snapshot)["stages"]["docs_meta"]["rows"],
        )
        return store.read_stage(snapshot, "clusters")

    clusters = _assign_clusters_sigspace(
        _meta_all(), dup_ref, new_keys, new_labels
    ).materialize()
    MERGE_PAIR_WALLS["cl_assign_sec"] = round(time.monotonic() - _tc, 3)
    store.write_sidecar_cols(
        snapshot, "cluster_sig_labels", {"sig": new_keys, "label": new_labels}
    )
    store.write_sidecar(snapshot, "patched_cluster_docs", _EMPTY)
    store.write_stage(
        snapshot, "clusters", _nonempty(clusters, _CLUSTERS_SCHEMA), t0=t0
    )
    return clusters


def _changed_label_sigs(
    pk: np.ndarray, pv: np.ndarray, nk: np.ndarray, nv: np.ndarray
) -> np.ndarray:
    """Sigs whose component label appears, disappears or changes between the
    parent's persisted (sig, label) map and this merge's — both key-sorted.
    Pair-bounded inputs, changed-bounded output."""
    if len(pk) == 0:
        return nk.copy()
    if len(nk) == 0:
        return pk.copy()
    pos = np.searchsorted(nk, pk)
    pos_c = np.minimum(pos, len(nk) - 1)
    in_new = nk[pos_c] == pk
    changed_old = pk[~in_new | (nv[pos_c] != pv)]
    pos2 = np.searchsorted(pk, nk)
    pos2_c = np.minimum(pos2, len(pk) - 1)
    only_new = nk[pk[pos2_c] != nk]
    return np.union1d(changed_old, only_new)


def _assign_clusters_sigspace(
    meta_ds,
    dup_ref,
    sig_sorted: np.ndarray,
    cl_vals: np.ndarray,
    only_docs: np.ndarray | None = None,
    only_sigs: np.ndarray | None = None,
    sig_canon_ref=None,
):
    """Final ``clusters`` table in ONE map over the full docs_meta view:
    cluster(doc) = component label of sig(doc) when its text appears in any
    verified pair, else the exact-dedup canonical (min doc id of its sha
    group), else the doc itself. All lookups are broadcast sorted-array
    searchsorted — no per-row python.

    ``only_docs``/``only_sigs`` (sorted i64) restrict the OUTPUT to docs in
    the set or with a sig in the set — the patch-based merge emits only rows
    that can differ from the parent's clusters parts.

    ``sig_canon_ref`` (ray ref of sorted (sig, min_doc) arrays — the
    ``sig_min_doc`` sidecar the incremental-labels path already maintains)
    replaces ``dup_ref``: the exact-dedup canonical is looked up per SIG
    instead of per 128-bit sha key, skipping the full-corpus dup-group
    exchange entirely. Sig-space keying is the same collision tolerance the
    cluster-label map already accepts."""
    map_ref = ray.put((sig_sorted, cl_vals))
    filt_ref = (
        ray.put((only_docs, only_sigs))
        if only_docs is not None or only_sigs is not None
        else None
    )

    def assign(batch: pa.Table) -> pa.Table:
        sigs, cls = ray.get(map_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sg = sig_ids_from_sha(batch["text_sha256"])
        canon = ids.copy()
        if sig_canon_ref is not None:
            c_keys, c_min = ray.get(sig_canon_ref)
            if len(c_keys):
                pos = np.searchsorted(c_keys, sg)
                pos[pos >= len(c_keys)] = 0
                hit = c_keys[pos] == sg
                canon[hit] = c_min[pos[hit]]
        else:
            d_keys, d_canon, _ = ray.get(dup_ref)
            if len(d_keys):
                s16 = i64_pair_to_key16(*sha_to_i64_pair(batch["text_sha256"]))
                pos = np.searchsorted(d_keys, s16)
                pos[pos >= len(d_keys)] = 0
                hit = d_keys[pos] == s16
                canon[hit] = d_canon[pos[hit]]
        cl = canon.copy()
        if len(sigs):
            pos = np.searchsorted(sigs, sg)
            pos[pos >= len(sigs)] = 0
            hit = sigs[pos] == sg
            cl[hit] = cls[pos[hit]]
        out = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": batch["url"],
                "cluster_id": pa.array(cl, type=pa.int64()),
                "is_canonical": pa.array(ids == cl),
            }
        )
        if filt_ref is not None:
            docs_f, sigs_f = ray.get(filt_ref)
            keep = np.zeros(len(ids), dtype=bool)
            if docs_f is not None and len(docs_f):
                keep |= _in_sorted(docs_f, ids)
            if sigs_f is not None and len(sigs_f):
                keep |= _in_sorted(sigs_f, sg)
            out = out.filter(pa.array(keep))
        return out

    return meta_ds.map_batches(assign, batch_format="pyarrow")


def _dup_groups_broadcast(meta_ds, p: int):
    """Dup-group broadcast (sorted S16 keys, canonical ids, counts) from a
    meta Dataset — the exact_dedup broadcast rebuilt from the manifest
    through the same manual two-stage task exchange stages/dedup.py uses
    (per-block distinct aggregation, hash-split slices, dup-bounded reduce;
    the Dataset groupby it replaces spent ~1s of parallelism-independent
    sort/planning machinery per merge)."""
    from imagededupx_ray.stages.dedup import (
        MANUAL_SHUFFLE_MAX_BLOCKS,
        _dup_map_block,
        _dup_reduce_part,
    )

    blocks = meta_ds.to_arrow_refs()
    if not blocks:
        return ray.put(
            (np.empty(0, "S16"), np.empty(0, np.int64), np.empty(0, np.int64))
        )
    if len(blocks) > MANUAL_SHUFFLE_MAX_BLOCKS:
        # scale fallback: backpressured Dataset groupby (spillable)
        from imagededupx_ray.stages.dedup import _dup_groups_df

        frames = []
        for b in _dup_groups_df(meta_ds, p).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            frames.append(b)
        if frames:
            tbl = pa.concat_tables(frames)
            h1 = tbl["h1"].to_numpy(zero_copy_only=False).astype(np.int64)
            h2 = tbl["h2"].to_numpy(zero_copy_only=False).astype(np.int64)
            canon = tbl["canonical_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            counts = tbl["n_exact_dups"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            h1 = h2 = canon = counts = np.empty(0, dtype=np.int64)
        keys16 = i64_pair_to_key16(h1, h2)
        order = np.argsort(keys16)
        return ray.put((keys16[order], canon[order], counts[order]))
    P = 1 << max(0, (max(1, len(blocks)) - 1).bit_length() - 2)
    group = block_group_size(len(blocks))
    per_block = [
        _dup_map_block.options(num_returns=P if P > 1 else 1).remote(
            P, *blocks[i : i + group]
        )
        for i in range(0, len(blocks), group)
    ]
    cols = [per_block] if P == 1 else list(zip(*per_block))
    res = ray.get([_dup_reduce_part.remote(*col) for col in cols])
    ks = np.concatenate([r[0] for r in res])
    mn = np.concatenate([r[1] for r in res])
    ct = np.concatenate([r[2] for r in res])
    order = np.argsort(ks)
    return ray.put((ks[order], mn[order], ct[order]))
