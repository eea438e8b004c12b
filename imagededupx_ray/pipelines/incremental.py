"""Incremental snapshot build + merge (SURVEY.md §3.2 "ours", §7.2 step 7).

The reference's incremental indexing — MD5 change detection against a pickle
cache, then a full index rebuild from cache
(/root/reference/improved_faiss_detector.py:269-295 delta classes, :413-469
update, :456-457 rebuild-everything) — reborn as checkpointed Parquet
snapshots with lineage:

- ``docs_meta`` (doc_id, url, text_sha256): the manifest; delta detection is
  a distributed ANTI-JOIN of the new snapshot against the parent manifest on
  hash64(url, sha) (reference M10 new/modified classes; deletes arrive as
  tombstones).
- ``signatures`` keyed by ``text_sha256`` (minhash packed as fixed-width
  binary — the join-safe layout): MinHash/SimHash are functions of the text,
  so signatures survive canonical-doc reassignment without recompute — ONLY
  never-seen texts are signed on merge (the expensive stage). Banding is
  recomputed from signatures each run (trivially vectorized); candidate-pair
  emission is restricted to buckets touched by new texts, so old buckets are
  never re-paired.
- ``verified_pairs`` / ``clusters``: previous pairs are rekeyed through a
  distributed (old_id → new canonical) join; clusters assemble through a
  meta ⋈ winners join.

EVERY corpus-sized dataflow is a Dataset union / hash join / coarse-partition
groupby — nothing corpus-sized ever lands in driver memory. The driver holds
only delta-bounded broadcasts (the new snapshot's touched-bucket set,
tombstone url list) and pair-bounded state (the union-find root map), exactly
like the batch pipeline.

Equivalence contract (tested): build(A then merge B) produces the same
cluster assignment as build(A ∪ B). Window-capped hot buckets can emit a
superset of the full build's candidate pairs; components still agree
whenever verification doesn't split a hot bucket's window chain (true for
boilerplate-style hot buckets, whose members are mutually near-identical).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.stages.cluster import DictDSU
from imagededupx_ray.stages.dedup import exact_dedup, sha_to_i64_pair
from imagededupx_ray.stages.extract import extract_stage
from imagededupx_ray.stages.lsh import explode_bands, _emit_group, _pow2
from imagededupx_ray.stages.signatures import signature_stage, signatures_to_numpy
from imagededupx_ray.stages.verify import verify_pairs_broadcast_fused
from imagededupx_ray.state.checkpoint import SnapshotStore
from imagededupx_ray.util import suggest_num_partitions


def _meta_of(docs_ds):
    return docs_ds.select_columns(["doc_id", "url", "text_sha256"])


def _url_sha_key(urls: list, shas: list) -> np.ndarray:
    out = np.empty(len(urls), dtype=np.int64)
    for i, (u, s) in enumerate(zip(urls, shas)):
        out[i] = H.hash64_bytes((u + "\x00" + s).encode()) & H.MASK63
    return out


def _with_hkeys(ds, sha_col: str = "text_sha256"):
    """Append the 128-bit text key as two native int64 join columns."""

    def fn(t: pa.Table) -> pa.Table:
        h1, h2 = sha_to_i64_pair(t[sha_col])
        return t.append_column("h1", pa.array(h1, type=pa.int64())).append_column(
            "h2", pa.array(h2, type=pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _arrow(ds):
    """Normalize a dataset to arrow blocks (map_groups emits pandas blocks;
    mixed-type datasets break multi-block readers)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _winners_ds(meta_all, p: int = 64):
    """meta → (h1, h2, canonical_doc_id, n_docs), one row per DISTINCT text
    (singletons included — rekeying joins need every sha). Coarse-partition
    int-key groupby, same exchange shape as exact dedup."""

    def decorate(t: pa.Table) -> pa.Table:
        h1, h2 = sha_to_i64_pair(t["text_sha256"])
        return pa.table(
            {
                "_part": pa.array((h1 & (p - 1)).astype(np.int32), type=pa.int32()),
                "h1": pa.array(h1, type=pa.int64()),
                "h2": pa.array(h2, type=pa.int64()),
                "doc_id": t["doc_id"],
            }
        )

    def winners(df):
        g = df.groupby(["h1", "h2"])["doc_id"].agg(["min", "size"]).reset_index()
        return g.rename(columns={"min": "canonical_doc_id", "size": "n_docs"})

    return _arrow(
        meta_all.select_columns(["doc_id", "text_sha256"])
        .map_batches(decorate, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(winners, batch_format="pandas")
    )


def _pack_sigs(sig_ds, nperm: int):
    """FixedSizeList minhash → fixed-width binary; simhash → int64 bits.
    The join-safe, parquet-stable snapshot layout."""

    def fn(t: pa.Table) -> pa.Table:
        ids, mh, sim, nsh = signatures_to_numpy(t, nperm)
        mh_bin = pa.Array.from_buffers(
            pa.binary(nperm * 8),
            len(ids),
            [None, pa.py_buffer(np.ascontiguousarray(mh).tobytes())],
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "minhash": mh_bin,
                "simhash": pa.array(sim.view(np.int64), type=pa.int64()),
                "n_shingles": pa.array(nsh.astype(np.int32), type=pa.int32()),
                "text_sha256": t["text_sha256"],
            }
        )

    return sig_ds.map_batches(fn, batch_format="pyarrow")


def _sig_view(sig_ds):
    """Snapshot-layout signatures → the (doc_id, minhash, simhash(u64),
    n_shingles) view the LSH/verify kernels consume (simhash bit-cast back)."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "minhash": t["minhash"],
                "simhash": t["simhash"],
                "n_shingles": t["n_shingles"],
            }
        )

    return sig_ds.map_batches(fn, batch_format="pyarrow")


def _anti_join_unseen(docs_new, parent_meta, nparts: int):
    """docs whose (url, sha) the parent has NOT seen: distributed left-outer
    join on the 63-bit url+sha key, keep unmatched (reference M10/J3)."""

    def key_col(t: pa.Table) -> pa.Table:
        k = _url_sha_key(t["url"].to_pylist(), t["text_sha256"].to_pylist())
        return t.append_column("_k", pa.array(k, type=pa.int64()))

    def seen_col(t: pa.Table) -> pa.Table:
        k = _url_sha_key(t["url"].to_pylist(), t["text_sha256"].to_pylist())
        return pa.table(
            {
                "_k": pa.array(k, type=pa.int64()),
                "_seen": pa.array(np.ones(len(k), dtype=np.int8), type=pa.int8()),
            }
        )

    left = docs_new.map_batches(key_col, batch_format="pyarrow")
    right = parent_meta.map_batches(seen_col, batch_format="pyarrow")
    joined = left.join(right, "left_outer", nparts, on=("_k",))

    def unseen(t: pa.Table) -> pa.Table:
        keep = pa.compute.is_null(t["_seen"])
        return t.filter(keep).drop_columns(["_k", "_seen"])

    return joined.map_batches(unseen, batch_format="pyarrow")


def _rekey_sigs(sig_all, winners, nparts: int):
    """Rekey every signature row to the CURRENT canonical doc of its text via
    a distributed (h1, h2) join; texts with no remaining member (tombstoned
    out) drop through the inner join."""
    withk = _with_hkeys(sig_all)
    joined = withk.join(
        winners.select_columns(["h1", "h2", "canonical_doc_id"]),
        "inner",
        nparts,
        on=("h1", "h2"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["canonical_doc_id"].cast(pa.int64()),
                "minhash": t["minhash"],
                "simhash": t["simhash"],
                "n_shingles": t["n_shingles"],
                "text_sha256": t["text_sha256"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _rekey_pairs(prev_pairs, parent_sigs, winners, nparts: int):
    """Previous verified pairs (keyed by the PARENT's canonical ids) → current
    canonical ids: build the (old_id → new_id) map as a join of the parent
    signature keys with the new winners, then join it onto each pair side.
    Pairs touching an extinct (fully tombstoned) text drop via inner joins."""
    idmap = (
        _with_hkeys(parent_sigs.select_columns(["doc_id", "text_sha256"]))
        .join(
            winners.select_columns(["h1", "h2", "canonical_doc_id"]),
            "inner",
            nparts,
            on=("h1", "h2"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "old_id": t["doc_id"].cast(pa.int64()),
                    "new_id": t["canonical_doc_id"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    j1 = prev_pairs.join(idmap, "inner", nparts, on=("a",), right_on=("old_id",))
    j1 = j1.map_batches(
        lambda t: pa.table(
            {
                "a_new": t["new_id"].cast(pa.int64()),
                "b": t["b"].cast(pa.int64()),
                "est_jaccard": t["est_jaccard"],
                "hamming": t["hamming"],
            }
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(idmap, "inner", nparts, on=("b",), right_on=("old_id",))

    def norm(t: pa.Table) -> pa.Table:
        a = t["a_new"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["new_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b), type=pa.int64()),
                "b": pa.array(np.maximum(a, b), type=pa.int64()),
                "est_jaccard": t["est_jaccard"],
                "hamming": t["hamming"],
            }
        )

    return j2.map_batches(norm, batch_format="pyarrow")


def _distinct_pairs(pairs_ds, p: int):
    """Distinct on (a, b) keeping the first metric row — coarse-partition
    groupby on the pair hash (same exchange as the batch pipeline)."""
    from imagededupx_ray.stages.lsh import decorate_pair_part

    def decorate_keep(t: pa.Table) -> pa.Table:
        d = decorate_pair_part(p)(t.select(["a", "b"]))
        return d.append_column("est_jaccard", t["est_jaccard"]).append_column(
            "hamming", t["hamming"]
        )

    def dedup(df):
        return df.drop_duplicates(subset=["a", "b"]).drop(columns=["_part"])

    return _arrow(
        pairs_ds.map_batches(decorate_keep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dedup, batch_format="pandas")
    )


def _pairs_from_lsh(sig_view_ds, cfg: DedupConfig, bucket_filter_ref, p: int):
    """signatures → RAW candidate pairs, optionally restricted to a broadcast
    set of touched buckets (delta-bounded — the incremental path's only
    driver-held structure besides the root map)."""
    rows = sig_view_ds.map_batches(
        explode_bands(cfg, partitions=p), batch_format="pyarrow", batch_size=4096
    )
    if bucket_filter_ref is not None:

        def keep_touched(t: pa.Table) -> pa.Table:
            want = ray.get(bucket_filter_ref)
            b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(want) == 0:
                return t.slice(0, 0)
            pos = np.searchsorted(want, b)
            pos[pos >= len(want)] = 0
            return t.filter(pa.array(want[pos] == b))

        rows = rows.map_batches(keep_touched, batch_format="pyarrow")
    return _arrow(rows.groupby("_part").map_groups(_emit_group(cfg), batch_format="pandas"))


def _final_clusters(meta_all, winners, root_map_ref, nparts: int):
    """clusters = meta ⋈ winners (distributed) + pair-bounded root broadcast."""
    joined = _with_hkeys(meta_all).join(
        winners.select_columns(["h1", "h2", "canonical_doc_id"]),
        "inner",
        nparts,
        on=("h1", "h2"),
    )

    def fn(t: pa.Table) -> pa.Table:
        k, v = ray.get(root_map_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = t["canonical_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = canon.copy()
        if len(k):
            pos = np.searchsorted(k, canon)
            pos[pos >= len(k)] = 0
            hit = k[pos] == canon
            cl[hit] = v[pos[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": t["url"],
                "cluster_id": pa.array(cl, type=pa.int64()),
                "is_canonical": pa.array(ids == cl),
            }
        )

    return joined.map_batches(fn, batch_format="pyarrow")


def build_snapshot(
    store: SnapshotStore,
    pages_ds,
    snapshot: str,
    parent: str | None = None,
    cfg: DedupConfig = DEFAULT_CONFIG,
    tombstones: list[str] | None = None,
):
    """Full build (parent=None) or incremental merge of a new pages snapshot
    into an existing one. Persists docs_meta / signatures / verified_pairs /
    clusters stages + a lineage manifest; returns the clusters Dataset.

    RESUMABLE: stages are written atomically (tmp + rename) as they complete,
    so re-running after a crash reuses every finished stage — a completed
    ``signatures`` stage means no text is re-signed, completed
    ``verified_pairs`` means no LSH/verify re-runs, and a fully complete
    snapshot returns immediately (replaces the reference's
    rebuild-everything-from-cache, improved_faiss_detector.py:456-457).

    TOMBSTONES (reference v3 deletes, incremental_faiss_detector.py:74-75,
    :295-304): ``tombstones`` is a list of urls removed in this snapshot.
    Their rows leave docs_meta; texts with no remaining member drop their
    signature and every verified pair touching them (through the inner
    rekey joins); surviving texts keep signatures and pairs. Canonical ids
    and cluster roots reassign automatically through the winners join."""
    store.init_snapshot(snapshot, parent=parent)
    if parent is not None:
        store.check_config(parent)
    if store.is_complete(snapshot):
        return store.read_stage(snapshot, "clusters")
    resume_meta = store.has_stage(snapshot, "docs_meta")
    resume_sig = store.has_stage(snapshot, "signatures")
    resume_pairs = store.has_stage(snapshot, "verified_pairs")
    t_start = time.monotonic()
    nparts = suggest_num_partitions(cap=16)
    p = _pow2(suggest_num_partitions(per_cpu=2))

    tomb = set(tombstones or ())

    # ---- parent stages as Datasets (never driver frames) ----------------
    parent_meta = None
    parent_sigs = None
    if parent is not None:
        parent_meta = store.read_stage(parent, "docs_meta")
        parent_sigs = store.read_stage(parent, "signatures")
        if tomb:
            tomb_ref = ray.put(tomb)

            def drop_dead(t: pa.Table) -> pa.Table:
                dead = ray.get(tomb_ref)
                keep = [u not in dead for u in t["url"].to_pylist()]
                return t.filter(pa.array(keep))

            parent_meta = parent_meta.map_batches(drop_dead, batch_format="pyarrow")
        parent_meta = parent_meta.materialize()

    # ---- extract + delta detection --------------------------------------
    docs_new = None
    n_new = 0
    if not (resume_meta and resume_sig):
        docs_new = extract_stage(pages_ds)
        if tomb:  # a url cannot be both added and tombstoned; tombstone wins
            tomb_ref2 = ray.put(tomb)

            def drop_tombstoned(t: pa.Table) -> pa.Table:
                dead = ray.get(tomb_ref2)
                keep = [u not in dead for u in t["url"].to_pylist()]
                return t.filter(pa.array(keep))

            docs_new = docs_new.map_batches(drop_tombstoned, batch_format="pyarrow")
        docs_new = docs_new.materialize()
        if parent is not None and docs_new.count() > 0:
            docs_new = _anti_join_unseen(docs_new, parent_meta, nparts).materialize()
        n_new = docs_new.count()

    # ---- docs_meta -------------------------------------------------------
    if resume_meta:
        meta_all = store.read_stage(snapshot, "docs_meta").materialize()
    elif parent is None:
        meta_all = _meta_of(docs_new).materialize()
    elif n_new == 0:
        meta_all = parent_meta
    else:
        meta_all = parent_meta.union(_meta_of(docs_new)).materialize()
    if not resume_meta:  # persist as soon as complete (crash-resumable)
        store.write_stage(snapshot, "docs_meta", meta_all, t0=t_start)

    # winners: one row per distinct text — stays distributed
    winners = _winners_ds(meta_all, p).materialize()

    # ---- sign ONLY never-seen texts (skipped entirely on resume) --------
    new_sigs = None
    if resume_sig:
        sig_all = store.read_stage(snapshot, "signatures").materialize()
    else:
        if n_new > 0:
            # one representative per distinct NEW text (exact-dedup winners of
            # the delta: no text ever shuffles, same as the batch pipeline)
            reps, _ = exact_dedup(docs_new, strategy="broadcast")
            if parent_sigs is not None:
                reps = _anti_join_sig_seen(reps, parent_sigs, nparts)
            signed = signature_stage(reps, cfg, passthrough_sha=True)
            new_sigs = _pack_sigs(signed, cfg.num_perms).materialize()
        sig_parts = [s for s in (parent_sigs, new_sigs) if s is not None]
        if len(sig_parts) == 2 and new_sigs.count() == 0:
            sig_parts = [parent_sigs]  # empty-union destroys schemas
        sig_union = sig_parts[0] if len(sig_parts) == 1 else sig_parts[0].union(sig_parts[1])
        sig_all = _rekey_sigs(sig_union, winners, nparts).materialize()
        store.write_stage(snapshot, "signatures", sig_all)

    # ---- LSH over all signatures, pairs only in touched buckets --------
    if resume_pairs:
        verified_all = store.read_stage(snapshot, "verified_pairs").materialize()
    else:
        sigv = _sig_view(sig_all).materialize()
        if parent is None:
            bucket_filter_ref = None
        elif new_sigs is None or new_sigs.count() == 0:
            bucket_filter_ref = ray.put(np.empty(0, dtype=np.int64))
        else:
            # touched buckets: delta-bounded driver collect + broadcast
            delta_rows = _sig_view(new_sigs).map_batches(
                explode_bands(cfg, partitions=p), batch_format="pyarrow"
            )
            bl = [
                t["bucket"].to_numpy(zero_copy_only=False)
                for t in delta_rows.iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            bucket_filter_ref = ray.put(
                np.unique(np.concatenate(bl)) if bl else np.empty(0, np.int64)
            )
        raw = _pairs_from_lsh(sigv, cfg, bucket_filter_ref, p).materialize()
        ids_l = []
        for b in raw.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            ids_l.append(b["a"].to_numpy(zero_copy_only=False).astype(np.int64))
            ids_l.append(b["b"].to_numpy(zero_copy_only=False).astype(np.int64))
        pair_ids = np.unique(np.concatenate(ids_l)) if ids_l else np.empty(0, np.int64)
        verified_new = verify_pairs_broadcast_fused(raw, sigv, cfg, pair_ids=pair_ids)

        if parent is None:
            verified_all = verified_new.materialize()
        else:
            prev_pairs = store.read_stage(parent, "verified_pairs")
            if prev_pairs.count() > 0:
                rekeyed = _rekey_pairs(prev_pairs, parent_sigs, winners, nparts)
                if verified_new.count() > 0:
                    merged = rekeyed.union(
                        verified_new.map_batches(lambda t: t, batch_format="pyarrow")
                    )
                else:
                    merged = rekeyed
                verified_all = _distinct_pairs(merged, p).materialize()
            else:
                verified_all = verified_new.materialize()
        store.write_stage(snapshot, "verified_pairs", verified_all)

    # ---- union-find over verified pairs (exact dups fold via winners) ----
    dsu = DictDSU()
    for b in verified_all.select_columns(["a", "b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        dsu.union_arrays(
            b["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["b"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    rm = dsu.root_map()
    keys = np.fromiter(rm.keys(), dtype=np.int64, count=len(rm))
    vals = np.fromiter(rm.values(), dtype=np.int64, count=len(rm))
    order = np.argsort(keys)
    root_map_ref = ray.put((keys[order], vals[order]))

    clusters = _final_clusters(meta_all, winners, root_map_ref, nparts).materialize()
    store.write_stage(snapshot, "clusters", clusters)
    return clusters


def _anti_join_sig_seen(reps, parent_sigs, nparts: int):
    """Drop representative docs whose text the parent already signed:
    left-outer join on the 128-bit text key, keep unmatched."""
    seen = _with_hkeys(parent_sigs.select_columns(["text_sha256"])).map_batches(
        lambda t: pa.table(
            {
                "h1": t["h1"],
                "h2": t["h2"],
                "_seen": pa.array(np.ones(t.num_rows, dtype=np.int8), type=pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = _with_hkeys(reps).join(seen, "left_outer", nparts, on=("h1", "h2"))

    def unseen(t: pa.Table) -> pa.Table:
        keep = pa.compute.is_null(t["_seen"])
        return t.filter(keep).drop_columns(["h1", "h2", "_seen"])

    return joined.map_batches(unseen, batch_format="pyarrow")
