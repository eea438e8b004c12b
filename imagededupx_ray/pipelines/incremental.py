"""Incremental snapshot build + merge (SURVEY.md §3.2 "ours", §7.2 step 7).

The reference's incremental indexing — MD5 change detection against a pickle
cache, then a full index rebuild from cache
(/root/reference/improved_faiss_detector.py:269-295 delta classes, :413-469
update, :456-457 rebuild-everything) — reborn as checkpointed Parquet
snapshots with lineage:

- ``docs_meta`` (doc_id, url, text_sha256): the manifest; delta detection
  broadcasts ONLY the new snapshot's (url, sha) keys and scans the parent
  manifest once (reference M10 new/modified classes).
- ``signatures`` keyed by ``text_sha256`` (minhash packed as fixed-width
  binary): MinHash/SimHash are functions of the text, so signatures survive
  canonical-doc reassignment without recompute — ONLY never-seen texts are
  signed on merge (the expensive stage), and ONLY signatures of texts whose
  member set changed are re-keyed, via a DELTA-BOUNDED broadcast patch over
  one narrow pass (a canonical can only change when the delta adds a member
  or a tombstone removes one).
- ``verified_pairs`` / ``clusters``: previous pairs rekey through the same
  delta-bounded (old canonical → new canonical) patch; clusters assemble
  exactly like the batch pipeline (dup-group broadcast + pair-bounded root
  map) — no corpus-sized structure ever lands on the driver.

Scale contract: every corpus-sized dataflow is a streaming narrow pass, a
Dataset union, one coarse-partition groupby (dup groups) or the LSH/verify
exchanges. Driver-held state is delta-bounded (changed-sha patch map,
touched-bucket set, tombstone list) or dup/pair-bounded (dup-group map, DSU
root map) — the same budget as the batch pipeline; the exact-dedup join
fallback (stages/dedup.py) is the declared extreme-dup-rate escape. An
earlier all-joins version was measured 3.5x slower than a full rebuild at
1.2M pages — six corpus-wide acero exchanges against a 1.2 GB signature
table — where this patch dataflow merges in a fraction of a rebuild.

Equivalence contract (tested): build(A then merge B) produces the same
cluster assignment as build(A ∪ B); tombstone merges equal rebuilds on the
surviving corpus (tests/test_incremental.py).
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
from imagededupx_ray.stages.dedup import (
    exact_dedup,
    i64_pair_to_key16,
    sha_to_i64_pair,
)
from imagededupx_ray.stages.extract import extract_stage
from imagededupx_ray.stages.lsh import explode_bands, _emit_group, _pow2, decorate_pair_part
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


def _arrow(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _sha_keys16(col) -> np.ndarray:
    return i64_pair_to_key16(*sha_to_i64_pair(col))


def _pack_sigs(sig_ds, nperm: int):
    """FixedSizeList minhash → fixed-width binary; simhash → int64 bits.
    The parquet-stable snapshot layout."""

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
    return sig_ds.select_columns(["doc_id", "minhash", "simhash", "n_shingles"])


def _collect_key16_min(ds, sha_col: str, id_col: str, want_ref):
    """One narrow streaming pass: per changed sha (broadcast sorted S16 set),
    the min doc id among its CURRENT members. Driver combines per-block
    partials — output is changed-set-bounded."""

    def pick(t: pa.Table) -> pa.Table:
        want = ray.get(want_ref)
        k = _sha_keys16(t[sha_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(want) == 0:
            sel = np.zeros(len(k), dtype=bool)
        else:
            pos = np.searchsorted(want, k)
            pos[pos >= len(want)] = 0
            sel = want[pos] == k
        kk, inv = np.unique(k[sel], return_inverse=True)
        mins = np.full(len(kk), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, ids[sel])
        return pa.table(
            {
                "k": pa.array([bytes(x).ljust(16, b"\x00") for x in kk], type=pa.binary(16)),
                "m": pa.array(mins, type=pa.int64()),
            }
        )

    agg: dict[bytes, int] = {}
    for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        for kb, m in zip(b["k"].to_pylist(), b["m"].to_pylist()):
            # numpy 'S16' strips trailing nulls; normalize dict keys the
            # same way so lookups from S16 items resolve
            kb = kb.rstrip(b"\x00")
            if kb not in agg or m < agg[kb]:
                agg[kb] = m
    return agg


def _collect_key16_set(ds, sha_col: str, want_ref=None) -> np.ndarray:
    """Distinct S16 sha keys of a dataset column (optionally restricted to a
    broadcast set), streamed as per-block uniques — bounded by the distinct
    count of the restriction (callers pass delta-bounded sets)."""

    def pick(t: pa.Table) -> pa.Table:
        k = _sha_keys16(t[sha_col])
        if want_ref is not None:
            want = ray.get(want_ref)
            if len(want) == 0:
                k = k[:0]
            else:
                pos = np.searchsorted(want, k)
                pos[pos >= len(want)] = 0
                k = k[np.asarray(want[pos] == k)]
        kk = np.unique(k)
        return pa.table({"k": pa.array([bytes(x).ljust(16, b"\x00") for x in kk], type=pa.binary(16))})

    out = set()
    for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        out.update(b["k"].to_pylist())
    return np.sort(np.array(sorted(out), dtype="S16")) if out else np.empty(0, "S16")


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
    signature and every verified pair touching them; surviving texts keep
    signatures and pairs. Canonical ids and cluster roots reassign through
    the delta-bounded patch map."""
    store.init_snapshot(snapshot, parent=parent)
    if parent is not None:
        store.check_config(parent)
    if store.is_complete(snapshot):
        return store.read_stage(snapshot, "clusters")
    resume_meta = store.has_stage(snapshot, "docs_meta")
    resume_sig = store.has_stage(snapshot, "signatures")
    resume_pairs = store.has_stage(snapshot, "verified_pairs")
    t_start = time.monotonic()
    p = _pow2(suggest_num_partitions(per_cpu=2))
    tomb = set(tombstones or ())

    # ---- parent stages (Datasets; tombstones filter in-stream) ----------
    parent_meta = None
    parent_sigs = None
    tomb_shas = np.empty(0, dtype="S16")
    if parent is not None:
        parent_meta = store.read_stage(parent, "docs_meta")
        parent_sigs = store.read_stage(parent, "signatures")
        if tomb:
            tomb_ref = ray.put(tomb)

            # shas of tombstoned docs = canonical-change candidates
            def tomb_rows(t: pa.Table) -> pa.Table:
                dead = ray.get(tomb_ref)
                keep = [u in dead for u in t["url"].to_pylist()]
                return t.filter(pa.array(keep))

            tomb_shas = _collect_key16_set(
                parent_meta.map_batches(tomb_rows, batch_format="pyarrow"),
                "text_sha256",
            )

            def drop_dead(t: pa.Table) -> pa.Table:
                dead = ray.get(tomb_ref)
                keep = [u not in dead for u in t["url"].to_pylist()]
                return t.filter(pa.array(keep))

            parent_meta = parent_meta.map_batches(drop_dead, batch_format="pyarrow")
        parent_meta = parent_meta.materialize()

    # ---- extract + delta detection (broadcast of DELTA keys only) -------
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
            # delta keys (delta-bounded) broadcast; ONE narrow parent scan
            # marks which are already present; then filter the new docs
            dk = []
            for b in docs_new.select_columns(["url", "text_sha256"]).iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            ):
                dk.append(_url_sha_key(b["url"].to_pylist(), b["text_sha256"].to_pylist()))
            delta_keys = np.sort(np.concatenate(dk)) if dk else np.empty(0, np.int64)
            dk_ref = ray.put(delta_keys)

            def seen_keys(t: pa.Table) -> pa.Table:
                want = ray.get(dk_ref)
                k = _url_sha_key(t["url"].to_pylist(), t["text_sha256"].to_pylist())
                if len(want):
                    pos = np.searchsorted(want, k)
                    pos[pos >= len(want)] = 0
                    k = k[want[pos] == k]
                else:
                    k = k[:0]
                return pa.table({"k": pa.array(np.unique(k), type=pa.int64())})

            seen = set()
            for b in parent_meta.map_batches(seen_keys, batch_format="pyarrow").iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            ):
                seen.update(b["k"].to_pylist())
            seen_arr = np.sort(np.fromiter(seen, dtype=np.int64, count=len(seen)))
            seen_ref = ray.put(seen_arr)

            def unseen(t: pa.Table) -> pa.Table:
                s = ray.get(seen_ref)
                k = _url_sha_key(t["url"].to_pylist(), t["text_sha256"].to_pylist())
                if len(s) == 0:
                    return t
                pos = np.searchsorted(s, k)
                pos[pos >= len(s)] = 0
                return t.filter(pa.array(s[pos] != k))

            docs_new = docs_new.map_batches(unseen, batch_format="pyarrow").materialize()
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

    # ---- changed-sha patch map (delta-bounded) ---------------------------
    # canonical(sha) can only differ from the parent's for shas the delta
    # touches or tombstones hit; collect min-doc for exactly those. A full
    # build has no parent canonicals to correct — exact-dedup winners ARE the
    # canonicals — so its patch set is EMPTY (never corpus-sized)
    delta_shas = np.empty(0, "S16")
    if parent is None:
        changed = np.empty(0, "S16")
    elif docs_new is not None:
        delta_shas = (
            _collect_key16_set(docs_new.select_columns(["text_sha256"]), "text_sha256")
            if n_new
            else np.empty(0, "S16")
        )
        changed = np.unique(np.concatenate([delta_shas, tomb_shas]))
    elif store.has_stage(snapshot, "changed_keys"):
        # resume after the delta was discarded: restore the persisted set —
        # WITHOUT it, pair generation would silently skip the delta's buckets
        # and prev-pair rekeying would be a no-op
        ks = store.read_stage(snapshot, "changed_keys").to_pandas()
        changed = (
            np.sort(np.array([bytes(x) for x in ks["k"]], dtype="S16"))
            if len(ks)
            else np.empty(0, "S16")
        )
        delta_shas = changed
    else:
        changed = tomb_shas
    if parent is not None and not store.has_stage(snapshot, "changed_keys"):
        store.write_stage(
            snapshot,
            "changed_keys",
            rd.from_arrow(
                pa.table({"k": pa.array([bytes(x).ljust(16, b"\x00") for x in changed], type=pa.binary(16))})
            ),
        )
    changed_ref = ray.put(changed)
    # min CURRENT member per changed sha (extinct shas simply don't appear)
    patch = _collect_key16_min(meta_all, "text_sha256", "doc_id", changed_ref)
    patch_keys = np.sort(np.array(sorted(patch.keys()), dtype="S16")) if patch else np.empty(0, "S16")
    patch_vals = np.array([patch[bytes(k)] for k in patch_keys], dtype=np.int64)
    patch_ref = ray.put((changed, patch_keys, patch_vals))

    def _patch_ids(keys16: np.ndarray, ids: np.ndarray):
        """(new ids, alive mask) for rows under the patch: changed+present →
        new canonical; changed+absent (extinct) → dead; unchanged → kept."""
        chg, pk, pv = ray.get(patch_ref)
        out = ids.copy()
        alive = np.ones(len(ids), dtype=bool)
        if len(chg):
            pos = np.searchsorted(chg, keys16)
            pos[pos >= len(chg)] = 0
            is_changed = chg[pos] == keys16
            if is_changed.any():
                if len(pk):
                    p2 = np.searchsorted(pk, keys16)
                    p2[p2 >= len(pk)] = 0
                    has_new = pk[p2] == keys16
                    out[is_changed & has_new] = pv[p2[is_changed & has_new]]
                    alive[is_changed & ~has_new] = False
                else:
                    alive[is_changed] = False
        return out, alive

    # ---- sign ONLY never-seen texts (skipped entirely on resume) --------
    new_sigs = None
    if resume_sig:
        sig_all = store.read_stage(snapshot, "signatures").materialize()
    else:
        if n_new > 0:
            # one representative per distinct NEW text (exact-dedup winners
            # of the delta — no text ever shuffles)
            reps, _ = exact_dedup(docs_new, strategy="broadcast")
            if parent_sigs is not None:
                # parent-signed shas among the delta's (delta-bounded scan)
                signed_shas = _collect_key16_set(
                    parent_sigs.select_columns(["text_sha256"]),
                    "text_sha256",
                    want_ref=ray.put(delta_shas),
                )
                signed_ref = ray.put(signed_shas)

                def drop_signed(t: pa.Table) -> pa.Table:
                    s = ray.get(signed_ref)
                    k = _sha_keys16(t["text_sha256"])
                    if len(s) == 0:
                        return t
                    pos = np.searchsorted(s, k)
                    pos[pos >= len(s)] = 0
                    return t.filter(pa.array(s[pos] != k))

                reps = reps.map_batches(drop_signed, batch_format="pyarrow")
            signed = signature_stage(reps, cfg, passthrough_sha=True)
            new_sigs = _pack_sigs(signed, cfg.num_perms).materialize()
        sig_parts = [s for s in (parent_sigs, new_sigs) if s is not None]
        if len(sig_parts) == 2 and new_sigs.count() == 0:
            sig_parts = [parent_sigs]  # empty-union destroys schemas
        if not sig_parts:  # empty full build: zero-row, correctly-typed table
            import ray.data as _rd

            from imagededupx_ray.schemas import SIGNATURES_PACKED

            sig_parts = [_rd.from_arrow(SIGNATURES_PACKED.empty_table())]
        sig_union = sig_parts[0] if len(sig_parts) == 1 else sig_parts[0].union(sig_parts[1])

        def patch_sig(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            new_ids, alive = _patch_ids(_sha_keys16(t["text_sha256"]), ids)
            t = t.set_column(
                t.column_names.index("doc_id"), "doc_id", pa.array(new_ids, type=pa.int64())
            )
            return t.filter(pa.array(alive))

        sig_all = sig_union.map_batches(patch_sig, batch_format="pyarrow").materialize()
        store.write_stage(snapshot, "signatures", sig_all)

    # ---- LSH over all signatures, pairs only in touched buckets --------
    if resume_pairs:
        verified_all = store.read_stage(snapshot, "verified_pairs").materialize()
    else:
        sigv = _sig_view(sig_all)
        if parent is None:
            bucket_filter_ref = None
            delta_sig_src = None
        elif new_sigs is not None and new_sigs.count() > 0:
            delta_sig_src = _sig_view(new_sigs)
        elif resume_sig and len(changed):
            # resume after a crash between the signatures and pairs stages:
            # the delta's signatures live inside sig_all — recover them via
            # the (delta-bounded) changed-keys broadcast
            chg_ref = ray.put(changed)

            def only_changed(t: pa.Table) -> pa.Table:
                want = ray.get(chg_ref)
                k = _sha_keys16(t["text_sha256"])
                pos = np.searchsorted(want, k)
                pos[pos >= len(want)] = 0
                return t.filter(pa.array(np.asarray(want[pos] == k)))

            delta_sig_src = _sig_view(
                sig_all.map_batches(only_changed, batch_format="pyarrow")
            )
        else:
            delta_sig_src = None
            bucket_filter_ref = ray.put(np.empty(0, dtype=np.int64))
        if parent is not None and delta_sig_src is not None:
            delta_rows = delta_sig_src.map_batches(
                explode_bands(cfg, partitions=p), batch_format="pyarrow"
            )
            bl = [
                t["bucket"].to_numpy(zero_copy_only=False)
                for t in delta_rows.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]
            bucket_filter_ref = ray.put(
                np.unique(np.concatenate(bl)) if bl else np.empty(0, np.int64)
            )
        rows = sigv.map_batches(
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
        raw = _arrow(
            rows.groupby("_part").map_groups(_emit_group(cfg), batch_format="pandas")
        ).materialize()
        ids_l = []
        for b in raw.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            ids_l.append(b["a"].to_numpy(zero_copy_only=False).astype(np.int64))
            ids_l.append(b["b"].to_numpy(zero_copy_only=False).astype(np.int64))
        pair_ids = np.unique(np.concatenate(ids_l)) if ids_l else np.empty(0, np.int64)
        verified_new = verify_pairs_broadcast_fused(raw, sigv, cfg, pair_ids=pair_ids)

        if parent is None:
            verified_all = verified_new.materialize()
        else:
            # previous pairs: ids are parent canonicals; patch via the same
            # delta-bounded map THROUGH the parent signature sha (one narrow
            # pass over parent sigs builds old-id → sha16 for changed rows)
            prev_pairs = store.read_stage(parent, "verified_pairs")

            def sig_keys(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                k = _sha_keys16(t["text_sha256"])
                chg, _, _ = ray.get(patch_ref)
                if len(chg) == 0:
                    sel = np.zeros(len(ids), dtype=bool)
                else:
                    pos = np.searchsorted(chg, k)
                    pos[pos >= len(chg)] = 0
                    sel = chg[pos] == k
                return pa.table(
                    {
                        "old_id": pa.array(ids[sel], type=pa.int64()),
                        "k": pa.array([bytes(x).ljust(16, b"\x00") for x in k[sel]], type=pa.binary(16)),
                    }
                )

            old2key: dict[int, bytes] = {}
            for b in (
                parent_sigs.select_columns(["doc_id", "text_sha256"])
                .map_batches(sig_keys, batch_format="pyarrow")
                .iter_batches(batch_size=1 << 16, batch_format="pyarrow")
            ):
                old2key.update(zip(b["old_id"].to_pylist(), b["k"].to_pylist()))
            o_keys = np.sort(np.fromiter(old2key.keys(), dtype=np.int64, count=len(old2key)))
            o_vals = np.array([old2key[int(i)] for i in o_keys], dtype="S16")
            remap_ref = ray.put((o_keys, o_vals))

            def patch_pairs(t: pa.Table) -> pa.Table:
                ok, ov = ray.get(remap_ref)
                a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
                b_ = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
                alive = np.ones(len(a), dtype=bool)
                na, nb = a.copy(), b_.copy()
                for side, arr, out in (("a", a, na), ("b", b_, nb)):
                    if len(ok) == 0:
                        continue
                    pos = np.searchsorted(ok, arr)
                    pos[pos >= len(ok)] = 0
                    hit = ok[pos] == arr
                    if hit.any():
                        keys16 = ov[pos[hit]]
                        new_ids, live = _patch_ids(keys16, arr[hit])
                        out[hit] = new_ids
                        tmp = alive[hit]
                        tmp &= live
                        alive[hit] = tmp
                lo = np.minimum(na, nb)
                hi = np.maximum(na, nb)
                return pa.table(
                    {
                        "a": pa.array(lo[alive], type=pa.int64()),
                        "b": pa.array(hi[alive], type=pa.int64()),
                        "est_jaccard": t["est_jaccard"].filter(pa.array(alive)),
                        "hamming": t["hamming"].filter(pa.array(alive)),
                    }
                )

            prev_patched = prev_pairs.map_batches(patch_pairs, batch_format="pyarrow")
            if verified_new.count() > 0:
                merged = prev_patched.union(_arrow(verified_new))
            else:
                merged = prev_patched

            def decorate_keep(t: pa.Table) -> pa.Table:
                d = decorate_pair_part(p)(t.select(["a", "b"]))
                return d.append_column("est_jaccard", t["est_jaccard"]).append_column(
                    "hamming", t["hamming"]
                )

            def dedup_grp(df):
                return df.drop_duplicates(subset=["a", "b"]).drop(columns=["_part"])

            verified_all = _arrow(
                merged.map_batches(decorate_keep, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(dedup_grp, batch_format="pandas")
            ).materialize()
        store.write_stage(snapshot, "verified_pairs", verified_all)

    # ---- union-find + clusters (batch-pipeline shape: dup-group broadcast
    # + pair-bounded root map; no corpus-sized driver state) --------------
    dup_ref = _dup_groups_broadcast(meta_all, p)
    dsu = DictDSU()
    for b in verified_all.select_columns(["a", "b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        dsu.union_arrays(
            b["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["b"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    from imagededupx_ray.stages.cluster import assign_clusters_via_canonical

    clusters = assign_clusters_via_canonical(
        meta_all, dup_ref, dsu.root_map()
    ).materialize()
    store.write_stage(snapshot, "clusters", clusters)
    return clusters


def _dup_groups_broadcast(meta_ds, p: int):
    """Dup-group broadcast (sorted S16 keys, canonical ids, counts) from a
    meta Dataset — the exact_dedup broadcast rebuilt from the manifest (one
    narrow coarse-partition groupby; dup-bounded result)."""

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

    def dup_groups(df):
        g = df.groupby(["h1", "h2"])["doc_id"].agg(["min", "size"])
        g = g[g["size"] >= 2].reset_index()
        return g.rename(columns={"min": "canonical_doc_id", "size": "n_exact_dups"})

    frames = []
    for b in (
        meta_ds.select_columns(["text_sha256", "doc_id"])
        .map_batches(decorate, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dup_groups, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
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
