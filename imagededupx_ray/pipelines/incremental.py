"""Incremental snapshot build + merge (SURVEY.md §3.2 "ours", §7.2 step 7).

The reference's incremental indexing — MD5 change detection against a pickle
cache, then a full index rebuild from cache
(/root/reference/improved_faiss_detector.py:269-295 delta classes, :413-469
update, :456-457 rebuild-everything) — reborn as checkpointed Parquet
snapshots with lineage:

- ``docs_meta`` (doc_id, url, text_sha256): the manifest; delta detection is
  a membership test of hash64(url, sha) against the previous manifest
  (reference M10 new/modified classes; deletes are out of scope for
  append-style WARC snapshots and tracked upstream as tombstones).
- ``signatures`` keyed by ``text_sha256``: MinHash/SimHash are functions of
  the text, so signatures survive canonical-doc reassignment without
  recompute — ONLY never-seen texts are signed on merge (the expensive
  stage). Banding is recomputed from signatures each run (trivially
  vectorized); candidate-pair emission is restricted to buckets touched by
  new texts, so old buckets are never re-paired.
- ``verified_pairs`` / ``clusters``: previous pairs are rekeyed through the
  sha → new-canonical map and unioned with the delta's verified pairs.

Equivalence contract (tested): build(A then merge B) produces the same
cluster assignment as build(A ∪ B). Window-capped hot buckets can emit a
superset of the full build's candidate pairs; components still agree
whenever verification doesn't split a hot bucket's window chain (true for
boilerplate-style hot buckets, whose members are mutually near-identical).

Broadcast-sized structures here (sha→canonical map, delta bucket set) are
``ray.put`` once per run; at 10^12-doc scale each becomes a narrow join on
the same keys — the dataflow shape is unchanged.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.stages.cluster import DictDSU
from imagededupx_ray.stages.extract import extract_stage
from imagededupx_ray.stages.lsh import explode_bands, _emit_group, _dedup_pairs_group, _pow2
from imagededupx_ray.stages.signatures import signature_stage
from imagededupx_ray.stages.verify import BroadcastVerify
from imagededupx_ray.state.checkpoint import SnapshotStore
from imagededupx_ray.util import suggest_num_partitions


def _meta_of(docs_ds):
    return docs_ds.select_columns(["doc_id", "url", "text_sha256"])


def _url_sha_key(urls: list, shas: list) -> np.ndarray:
    out = np.empty(len(urls), dtype=np.int64)
    for i, (u, s) in enumerate(zip(urls, shas)):
        out[i] = H.hash64_bytes((u + "\x00" + s).encode()) & H.MASK63
    return out


def _winners(meta_ds):
    """sha → (canonical=min doc_id, n) via native narrow groupby."""
    from ray.data.aggregate import Count, Min

    return meta_ds.groupby("text_sha256").aggregate(
        Min("doc_id", alias_name="canonical_doc_id"),
        Count(alias_name="n_docs"),
    )


def _attach_sha(signatures_ds, docs_unique_ds):
    """signatures(doc_id, ...) + docs_unique(doc_id → sha): broadcast map."""
    meta = docs_unique_ds.select_columns(["doc_id", "text_sha256"]).to_pandas()
    if "doc_id" not in meta.columns:  # empty delta loses schema via to_pandas
        meta = meta.reindex(columns=["doc_id", "text_sha256"])
    ref = ray.put(dict(zip(meta["doc_id"], meta["text_sha256"])))

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        shas = [m[i] for i in batch["doc_id"].to_pylist()]
        return batch.append_column("text_sha256", pa.array(shas, type=pa.string()))

    return signatures_ds.map_batches(fn, batch_format="pyarrow")


def _pairs_from_lsh(lsh_rows_ds, cfg: DedupConfig, bucket_filter_ref=None):
    """(bucket, doc_id) rows → distinct candidate pairs, optionally restricted
    to a broadcast set of touched buckets (the incremental path)."""
    p = _pow2(suggest_num_partitions(per_cpu=2))

    src = lsh_rows_ds
    if bucket_filter_ref is not None:
        def keep_touched(t: pa.Table) -> pa.Table:
            want = ray.get(bucket_filter_ref)
            b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(want) == 0:
                return t.slice(0, 0)
            pos = np.searchsorted(want, b)
            pos[pos >= len(want)] = 0
            return t.filter(pa.array(want[pos] == b))

        src = src.map_batches(keep_touched, batch_format="pyarrow")

    pairs = src.groupby("_part").map_groups(_emit_group(cfg), batch_format="pandas")

    def decorate(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (
            H.splitmix64(a.astype(np.uint64) ^ (bb.astype(np.uint64) << np.uint64(1)))
            .astype(np.int64)
            & np.int64(p - 1)
        ).astype(np.int32)
        return pa.table(
            {
                "_part": pa.array(key, type=pa.int32()),
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(bb, type=pa.int64()),
            }
        )

    return (
        pairs.map_batches(decorate, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_dedup_pairs_group, batch_format="pandas")
    )


def _verify(pairs_ds, sig_doc_tbl: pa.Table, cfg: DedupConfig):
    from imagededupx_ray.stages.signatures import signatures_to_numpy

    ids, mh, sim, _ = signatures_to_numpy(sig_doc_tbl, cfg.num_perms)
    order = np.argsort(ids).astype(np.int64)
    ref = ray.put((ids[order], order, mh, sim))

    def fn(batch: pa.Table) -> pa.Table:
        v = BroadcastVerify(ref, cfg)
        return v(batch)

    return pairs_ds.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def _final_clusters(meta_ds, canon_ref, root_map_ref):
    def fn(batch: pa.Table) -> pa.Table:
        canon = ray.get(canon_ref)
        roots = ray.get(root_map_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shas = batch["text_sha256"].to_pylist()
        cl = np.empty(len(ids), dtype=np.int64)
        for i, s in enumerate(shas):
            c = canon[s]
            cl[i] = roots.get(c, c)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": batch["url"],
                "cluster_id": pa.array(cl, type=pa.int64()),
                "is_canonical": pa.array(ids == cl),
            }
        )

    return meta_ds.map_batches(fn, batch_format="pyarrow")


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
    signatures and pairs (similarity is a property of the text). Canonical
    ids and cluster roots reassign automatically through the winner map."""
    store.init_snapshot(snapshot, parent=parent)
    if parent is not None:
        store.check_config(parent)
    if store.is_complete(snapshot):
        return store.read_stage(snapshot, "clusters")
    resume_meta = store.has_stage(snapshot, "docs_meta")
    resume_sig = store.has_stage(snapshot, "signatures")
    resume_pairs = store.has_stage(snapshot, "verified_pairs")
    t_start = time.monotonic()

    tomb = set(tombstones or ())
    docs_new = None
    if not (resume_meta and resume_sig):
        docs_new = extract_stage(pages_ds).materialize()
        if tomb:  # a url cannot be both added and tombstoned; tombstone wins
            tomb_ref = ray.put(tomb)

            def drop_tombstoned(t: pa.Table) -> pa.Table:
                dead = ray.get(tomb_ref)
                keep = [u not in dead for u in t["url"].to_pylist()]
                return t.filter(pa.array(keep))

            docs_new = docs_new.map_batches(
                drop_tombstoned, batch_format="pyarrow"
            ).materialize()

    prev_sig = (
        store.read_stage(parent, "signatures").to_pandas() if parent is not None else None
    )
    prev_meta_df = None
    if parent is not None:
        prev_meta_df = store.read_stage(parent, "docs_meta").to_pandas()
        if tomb:
            prev_meta_df = prev_meta_df[~prev_meta_df["url"].isin(tomb)].reset_index(
                drop=True
            )
    if parent is not None and docs_new is not None:
        # delta detection (M10/J3): drop rows whose (url, sha) the parent saw
        seen = np.sort(
            _url_sha_key(prev_meta_df["url"].tolist(), prev_meta_df["text_sha256"].tolist())
        )
        seen_ref = ray.put(seen)

        def unseen(t: pa.Table) -> pa.Table:
            s = ray.get(seen_ref)
            key = _url_sha_key(t["url"].to_pylist(), t["text_sha256"].to_pylist())
            pos = np.searchsorted(s, key)
            pos[pos >= len(s)] = 0
            return t.filter(pa.array(s[pos] != key))

        docs_new = docs_new.map_batches(unseen, batch_format="pyarrow").materialize()

    if resume_meta:
        meta_all = store.read_stage(snapshot, "docs_meta").materialize()
    elif parent is None:
        meta_all = _meta_of(docs_new).materialize()
    elif docs_new.count() == 0:
        # unioning an EMPTY dataset destroys the schema (null-typed blocks)
        # and floats int64 ids downstream — skip it
        meta_all = rd.from_arrow(
            pa.Table.from_pandas(prev_meta_df, preserve_index=False)
        ).materialize()
    else:
        meta_all = (
            rd.from_arrow(pa.Table.from_pandas(prev_meta_df, preserve_index=False))
            .union(_meta_of(docs_new))
            .materialize()
        )

    if not resume_meta:  # persist as soon as complete (crash-resumable)
        store.write_stage(snapshot, "docs_meta", meta_all, t0=t_start)

    winners_df = _winners(meta_all).to_pandas()
    assert winners_df["canonical_doc_id"].dtype == np.int64, (
        "canonical ids floated — int64 precision above 2^53 would be lost: "
        f"{winners_df['canonical_doc_id'].dtype}"
    )
    canon_ref = ray.put(
        dict(zip(winners_df["text_sha256"], winners_df["canonical_doc_id"]))
    )

    _SIG_COLS = ["doc_id", "minhash", "simhash", "n_shingles", "text_sha256"]

    def _with_cols(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        # an empty Ray dataset loses its schema through to_pandas()
        return df if set(cols) <= set(df.columns) else df.reindex(columns=cols)

    p = _pow2(suggest_num_partitions(per_cpu=2))

    # ---- sign ONLY never-seen texts (skipped entirely on resume) -------
    if resume_sig:
        sig_all_df = store.read_stage(snapshot, "signatures").to_pandas()
        if prev_sig is not None:
            prev_shas = set(prev_sig["text_sha256"])
            new_sigs_df = sig_all_df[~sig_all_df["text_sha256"].isin(prev_shas)]
        else:
            new_sigs_df = sig_all_df
    else:
        known_set_ref = ray.put(
            set() if prev_sig is None else set(prev_sig["text_sha256"].tolist())
        )

        def rep_rows(df: pd.DataFrame) -> pd.DataFrame:
            known = ray.get(known_set_ref)
            df = df[~df["text_sha256"].isin(known)]
            if df.empty:
                return df.drop(columns=["_part"])
            idx = df.groupby("text_sha256")["doc_id"].idxmin()
            return df.loc[idx].drop(columns=["_part"])

        def decorate_sha(t: pa.Table) -> pa.Table:
            part = np.array(
                [int(s[:8], 16) & (p - 1) for s in t["text_sha256"].to_pylist()],
                dtype=np.int32,
            )
            return t.append_column("_part", pa.array(part, type=pa.int32()))

        reps = (
            docs_new.select_columns(["doc_id", "text", "text_sha256"])
            .map_batches(decorate_sha, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(rep_rows, batch_format="pandas")
        )
        new_sigs = _attach_sha(
            signature_stage(reps, cfg), reps.select_columns(["doc_id", "text_sha256"])
        ).materialize()
        new_sigs_df = _with_cols(new_sigs.to_pandas(), _SIG_COLS)
        if prev_sig is None:
            sig_all_df = new_sigs_df
        else:
            # NEVER concat an empty reindexed frame: its float64 columns
            # upcast int64 doc ids and silently corrupt ids above 2^53
            frames = [f for f in (prev_sig, new_sigs_df) if len(f)]
            sig_all_df = (
                pd.concat(frames, ignore_index=True) if frames else new_sigs_df
            )

    # rekey every signature row to the CURRENT canonical doc of its text;
    # texts with no remaining member (tombstoned out) drop their signature.
    # FILTER BEFORE MAPPING: Series.map with any missing key yields NaN and
    # upcasts the whole int64 series to float64, corrupting ids above 2^53.
    canon = dict(zip(winners_df["text_sha256"], winners_df["canonical_doc_id"]))
    alive = sig_all_df["text_sha256"].isin(canon).to_numpy()
    sig_all_df = sig_all_df[alive].reset_index(drop=True)
    sig_all_df["doc_id"] = (
        sig_all_df["text_sha256"].map(canon).astype(np.int64).to_numpy()
    )
    sig_tbl = pa.Table.from_pandas(sig_all_df, preserve_index=False)
    sig_all = rd.from_arrow(sig_tbl).materialize()
    if not resume_sig:
        store.write_stage(snapshot, "signatures", sig_all)

    # ---- LSH over all signatures, pairs only in touched buckets -------
    _VER_COLS = ["a", "b", "est_jaccard", "hamming"]
    if resume_pairs:
        verified_all_df = _with_cols(
            store.read_stage(snapshot, "verified_pairs").to_pandas(), _VER_COLS
        )
    else:
        lsh_all = sig_all.map_batches(
            explode_bands(cfg, partitions=p), batch_format="pyarrow", batch_size=4096
        )
        if parent is None:
            bucket_filter_ref = None
        elif len(new_sigs_df) == 0:
            bucket_filter_ref = ray.put(np.empty(0, dtype=np.int64))
        else:
            new_sig_tbl = pa.Table.from_pandas(
                sig_all_df[
                    sig_all_df["text_sha256"].isin(set(new_sigs_df["text_sha256"]))
                ],
                preserve_index=False,
            )
            delta_rows = explode_bands(cfg, partitions=p)(new_sig_tbl)
            bucket_filter_ref = ray.put(
                np.unique(delta_rows["bucket"].to_numpy(zero_copy_only=False))
            )
        cand = _pairs_from_lsh(lsh_all, cfg, bucket_filter_ref)
        verified_new_df = _with_cols(
            _verify(cand, sig_tbl, cfg).materialize().to_pandas(), _VER_COLS
        )

        if parent is None:
            verified_all_df = verified_new_df
        else:
            prev_ver = store.read_stage(parent, "verified_pairs").to_pandas()
            if len(prev_ver):
                # previous snapshot stored signatures rekeyed to ITS canonical
                # ids; rekey its pairs old id -> sha -> new canonical id; pairs
                # touching an extinct (fully tombstoned) text are dropped.
                # All-int64 with a -1 sentinel: pandas .map would infer float64
                # on any miss and round ids above 2^53.
                old_ids = prev_sig["doc_id"].to_numpy().astype(np.int64)
                old_shas = prev_sig["text_sha256"].to_numpy()
                o = np.argsort(old_ids)
                old_ids_s, old_shas_s = old_ids[o], old_shas[o]

                def remap(col: pd.Series) -> np.ndarray:
                    v = col.to_numpy().astype(np.int64)
                    out = np.full(len(v), -1, dtype=np.int64)
                    if len(old_ids_s) == 0:
                        return out
                    pos = np.searchsorted(old_ids_s, v)
                    pos[pos >= len(old_ids_s)] = 0
                    ok = old_ids_s[pos] == v
                    shas = old_shas_s[pos[ok]]
                    out[ok] = np.fromiter(
                        (canon.get(s, -1) for s in shas),
                        dtype=np.int64,
                        count=len(shas),
                    )
                    return out

                ra, rb = remap(prev_ver["a"]), remap(prev_ver["b"])
                live = (ra >= 0) & (rb >= 0)
                prev_ver = prev_ver[live].assign(
                    a=ra[live], b=rb[live]
                ).reset_index(drop=True)
                swap = prev_ver["a"] > prev_ver["b"]
                prev_ver.loc[swap, ["a", "b"]] = prev_ver.loc[swap, ["b", "a"]].to_numpy()
            frames = [f for f in (prev_ver, verified_new_df) if len(f)]
            verified_all_df = (
                (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else verified_new_df
                )
                .drop_duplicates(subset=["a", "b"])
                .reset_index(drop=True)
            )

    if not resume_pairs:
        store.write_stage(
            snapshot,
            "verified_pairs",
            rd.from_arrow(pa.Table.from_pandas(verified_all_df, preserve_index=False)),
        )

    # ---- union-find over verified pairs (exact dups fold via canonical) ----
    dsu = DictDSU()
    dsu.union_arrays(
        verified_all_df["a"].to_numpy().astype(np.int64),
        verified_all_df["b"].to_numpy().astype(np.int64),
    )
    root_map_ref = ray.put(dsu.root_map())

    clusters = _final_clusters(meta_all, canon_ref, root_map_ref).materialize()

    store.write_stage(snapshot, "clusters", clusters)
    return clusters
