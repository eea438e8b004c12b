"""Exact dedup: min-doc_id winner per distinct text (SURVEY.md §2.5 G5 / §2.7).

Reference analogue: value-dedup on corpus insert — an O(n) scan per doc
(/root/reference/similarities/similarities/literal_similarity.py:62-77,
repeated in every operator) and ``list(set(corpus))`` before mining
(/root/reference/similarities/similarities/examples/text_duplicates_demo.py:24).
The reference keeps first-inserted; ours keeps min(doc_id) = min(hash64(url))
— deterministic under any parallelism (SURVEY.md §4.2 item 6).

Implementation (scale notes): the doc rows themselves NEVER shuffle. The
groupby runs over the narrow (text_sha256, doc_id) projection only (a few
bytes/row); groups with >= 2 members — the duplicated minority of a web
corpus — drive winner selection by a stateless filter over the original docs.
An earlier version shuffled the full docs table (text included) through a
coarse-partition groupby: ~20 s at 600k docs where this version spends ~4 s.

Two winner-resolution strategies (selected by ``strategy`` or automatically
by dup-group count):

- ``broadcast``: the dup-group table ships once via ``ray.put`` as sorted
  numpy arrays; per-batch lookup is a vectorized S64 searchsorted. Right
  while the dup-group table fits a worker heap (= every sf/bench scale).
- ``join``: the dup-group table stays a Dataset and winners resolve through
  hash-partitioned ``Dataset.join`` on text_sha256 — the extreme-dup-rate
  path (30-50% dup rate at 10^12 docs = billions of dup groups). Output is
  identical to broadcast (tested: test_exact_dedup_join_equals_broadcast).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

# broadcast→join crossover: beyond this many dup groups the driver-built
# broadcast arrays stop being "small side" (~50 bytes/group → ~1.6 GB at 32M)
JOIN_FALLBACK_GROUPS = 32_000_000

_HEXVAL = np.zeros(256, dtype=np.uint32)
for _i, _c in enumerate("0123456789abcdef"):
    _HEXVAL[ord(_c)] = _i
    _HEXVAL[ord(_c.upper())] = _i


def _string_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 data, int offsets) view of a string array (no python strings)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[col.offset : col.offset + len(col) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, off


def sha_prefix_part(col, p: int) -> np.ndarray:
    """Vectorized ``int(sha_hex[:8], 16) & (p-1)`` over a column of hex
    digests — the coarse partition key for sha-keyed groupbys (replaces a
    per-row python int() loop)."""
    data, off = _string_buffers(col)
    n = len(off) - 1
    if n == 0:
        return np.empty(0, dtype=np.int32)
    idx = off[:-1, None].astype(np.int64) + np.arange(8, dtype=np.int64)[None, :]
    vals = _HEXVAL[data[idx]]
    word = np.zeros(n, dtype=np.uint32)
    for j in range(8):
        word = (word << np.uint32(4)) | vals[:, j]
    return (word & np.uint32(p - 1)).astype(np.int32)


def sha_to_s64(col) -> np.ndarray:
    """String column of 64-char sha hex digests → numpy 'S64' array, straight
    off the Arrow buffer when the layout is uniform (zero python strings)."""
    data, off = _string_buffers(col)
    n = len(off) - 1
    if n == 0:
        return np.empty(0, dtype="S64")
    widths = np.diff(off)
    if (widths == 64).all():
        return data[off[0] : off[-1]].reshape(n, 64).copy().view("S64").reshape(n)
    # non-uniform (shouldn't happen for sha columns) — object fallback
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.array(col.to_pylist(), dtype="S64")


def sha_to_i64_pair(col) -> tuple[np.ndarray, np.ndarray]:
    """First 128 bits of each sha256 hex digest as two int64 columns (bit-cast
    from uint64) — native groupby/join keys for Ray aggregates, no python
    strings anywhere. 128-bit keying is collision-safe at 10^12 docs
    (birthday ~1.5e-15)."""
    data, off = _string_buffers(col)
    n = len(off) - 1
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    idx = off[:-1, None].astype(np.int64) + np.arange(32, dtype=np.int64)[None, :]
    v = _HEXVAL[data[idx]].astype(np.uint64)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    four = np.uint64(4)
    for j in range(16):
        h1 = (h1 << four) | v[:, j]
        h2 = (h2 << four) | v[:, 16 + j]
    return h1.view(np.int64), h2.view(np.int64)


def sig_ids_from_sha(col) -> np.ndarray:
    """63-bit content id (``sig_id``) per row of a sha256-hex column — the
    stable key the snapshot store organizes signatures / lsh_index /
    verified_pairs around (pipelines/incremental.py). Collision budget is the
    same as doc_id = hash64(url): ~2^-63 per pair."""
    from imagededupx_ray.functions.hashing import splitmix64

    h1, h2 = sha_to_i64_pair(col)
    if len(h1) == 0:
        return np.empty(0, dtype=np.int64)
    mixed = splitmix64(h1.view(np.uint64) ^ splitmix64(h2.view(np.uint64)))
    return (mixed >> np.uint64(1)).astype(np.int64)


def doc_sig_combo(t: pa.Table) -> np.ndarray:
    """63-bit (doc_id, sig_id) row-identity key — the (url, content) combo
    used for snapshot delta detection and the dead-row filter (reference M10
    'new or modified', improved_faiss_detector.py:269-295)."""
    from imagededupx_ray.functions.hashing import splitmix64

    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    sg = sig_ids_from_sha(t["text_sha256"]).view(np.uint64)
    return (splitmix64(ids ^ splitmix64(sg)) >> np.uint64(1)).astype(np.int64)


def i64_pair_to_key16(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(h1, h2) int64 pair → 'S16' big-endian composite key whose bytewise
    order equals (uint64 h1, uint64 h2) lexicographic order — a single
    searchsorted-able key for broadcast lookups."""
    n = len(h1)
    arr = np.empty((n, 2), dtype=">u8")
    arr[:, 0] = h1.view(np.uint64)
    arr[:, 1] = h2.view(np.uint64)
    return arr.reshape(-1).view("S16").reshape(n)


def _dup_groups_df(docs_ds, p: int = 64):
    """Distributed dup-group resolution over the narrow 128-bit-key
    projection: Dataset of (h1, h2, canonical_doc_id, n_exact_dups), one row
    per distinct text with >= 2 members. COARSE-partition map_groups shuffle
    on native int keys — measured 3-5x faster than both the string-keyed
    variant (python strings in the exchange) and Ray's native two-key
    ``groupby().aggregate()`` (per-key sort machinery) at bench scale."""

    def decorate(batch: pa.Table) -> pa.Table:
        h1, h2 = sha_to_i64_pair(batch["text_sha256"])
        return pa.table(
            {
                "_part": pa.array((h1 & (p - 1)).astype(np.int32), type=pa.int32()),
                "h1": pa.array(h1, type=pa.int64()),
                "h2": pa.array(h2, type=pa.int64()),
                "doc_id": batch["doc_id"],
            }
        )

    def dup_groups(df):
        g = df.groupby(["h1", "h2"])["doc_id"].agg(["min", "size"])
        g = g[g["size"] >= 2].reset_index()
        return g.rename(columns={"min": "canonical_doc_id", "size": "n_exact_dups"})

    return (
        docs_ds.select_columns(["text_sha256", "doc_id"])
        .map_batches(decorate, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dup_groups, batch_format="pandas")
    )


def _local_dup_agg(t: pa.Table):
    """One block → per-distinct-text (key16 sorted, h1, min doc_id, count)."""
    if t.num_rows == 0 or "text_sha256" not in t.column_names:
        # 0-row blocks may carry no schema at all
        return (
            np.empty(0, "S16"),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    h1, h2 = sha_to_i64_pair(t["text_sha256"])
    k = i64_pair_to_key16(h1, h2)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k)
    ks, ids = k[order], ids[order]
    h1s = h1[order]
    first = np.empty(len(ks), dtype=bool)
    if len(ks):
        first[0] = True
        np.not_equal(ks[1:], ks[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    mins = np.minimum.reduceat(ids, starts) if len(starts) else ids[:0]
    counts = (
        np.diff(np.append(starts, len(ks))).astype(np.int64)
        if len(starts)
        else np.empty(0, np.int64)
    )
    return ks[starts], h1s[starts], mins, counts


@ray.remote
def _dup_map_block(P: int, *tables: pa.Table):
    """Map side of the dup-group exchange: local distinct aggregation over a
    GROUP of blocks (one task per fanout-sized group — per-block dispatch
    plus B×P ref plumbing anti-scaled at high parallelism), then split by h1
    hash bits into P partition slices (one return value each)."""
    live = [t for t in tables if t.num_rows and "text_sha256" in t.column_names]
    t = pa.concat_tables(live) if live else pa.table({})
    ku, h1u, mins, counts = _local_dup_agg(t)
    part = (h1u & (P - 1)).astype(np.int32)
    po = np.argsort(part, kind="stable")
    ku, mins, counts, part = ku[po], mins[po], counts[po], part[po]
    offs = np.searchsorted(part, np.arange(P + 1))
    out = tuple(
        (ku[offs[i] : offs[i + 1]], mins[offs[i] : offs[i + 1]], counts[offs[i] : offs[i + 1]])
        for i in range(P)
    )
    return out if P > 1 else out[0]


@ray.remote
def _dup_reduce_part(*parts):
    """Reduce one hash partition: merge per-block locals, keep count >= 2."""
    ks = np.concatenate([p[0] for p in parts])
    mins = np.concatenate([p[1] for p in parts])
    cts = np.concatenate([p[2] for p in parts])
    order = np.argsort(ks)
    ks, mins, cts = ks[order], mins[order], cts[order]
    first = np.empty(len(ks), dtype=bool)
    if len(ks):
        first[0] = True
        np.not_equal(ks[1:], ks[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    mn = np.minimum.reduceat(mins, starts) if len(starts) else mins[:0]
    ct = np.add.reduceat(cts, starts) if len(starts) else cts[:0]
    ku = ks[starts]
    dup = ct >= 2
    return ku[dup], mn[dup], ct[dup]


@ray.remote
def _dup_part_len(r) -> int:
    return len(r[0])


# beyond this many materialized blocks the B×P partition-slice object count of
# the manual exchange stops being cheap bookkeeping; the Dataset groupby
# shuffle (backpressured, spillable) takes over
MANUAL_SHUFFLE_MAX_BLOCKS = 4096


def exact_dedup(
    docs_ds,
    num_partitions: int | None = None,
    return_extras: bool = False,
    strategy: str = "auto",
    metrics: dict | None = None,
):
    """docs → (docs_unique, dup_map) [+ (docs_materialized, dup_ref) when
    ``return_extras``].

    docs_unique: one row per distinct text (the min-doc_id winner) with its
    full doc columns plus ``n_exact_dups``.
    dup_map: (doc_id, url, text_sha256, canonical_doc_id) for every doc whose
    text is duplicated (winners included, mapping to themselves) — the only
    docs exact-dup clustering needs.
    dup_ref: the broadcast (sorted S64 shas, canonical ids, counts) object
    ref, reusable by downstream cluster assignment without another shuffle
    (None under the join strategy).
    """
    import time as _time

    _t = _time.monotonic()
    docs_ds = docs_ds.materialize()  # two consumers below; extract runs once
    if metrics is not None:
        metrics["extract_mat_sec"] = round(_time.monotonic() - _t, 3)
    _t = _time.monotonic()
    if strategy == "join":
        return _exact_dedup_join(docs_ds, _dup_groups_df(docs_ds), return_extras)

    # broadcast (and auto): resolve dup groups through a manual two-stage
    # task exchange over the materialized doc blocks — per-block distinct
    # aggregation (the exchange ships distinct keys, not rows), hash-split
    # into P partition slices, P reduce tasks emit only count>=2 groups.
    # Measured 0.25-0.4s at 1.2M pages/32 CPUs where the equivalent Dataset
    # groupby execution (sort machinery + planning + driver stream) took
    # 1.2-2.0s — and that cost was parallelism-independent, the single
    # largest fixed term in the 8→32 scaling gap. Above
    # MANUAL_SHUFFLE_MAX_BLOCKS blocks the Dataset groupby (backpressured,
    # spillable) takes over; ``auto`` aborts to the join path if the groups
    # exceed the broadcast crossover either way.
    blocks = docs_ds.to_arrow_refs()
    if len(blocks) > MANUAL_SHUFFLE_MAX_BLOCKS:
        frames: list[pa.Table] = []
        total = 0
        for b in _dup_groups_df(docs_ds).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            total += b.num_rows
            if strategy == "auto" and total > JOIN_FALLBACK_GROUPS:
                return _exact_dedup_join(docs_ds, _dup_groups_df(docs_ds), return_extras)
            frames.append(b)
        if frames:
            dup_tbl = pa.concat_tables(frames)
            h1 = dup_tbl["h1"].to_numpy(zero_copy_only=False).astype(np.int64)
            h2 = dup_tbl["h2"].to_numpy(zero_copy_only=False).astype(np.int64)
            canon = (
                dup_tbl["canonical_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            counts = (
                dup_tbl["n_exact_dups"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            h1 = h2 = canon = counts = np.empty(0, dtype=np.int64)
        keys16 = i64_pair_to_key16(h1, h2)
        order = np.argsort(keys16)
        keys_s, canon_s, counts_s = keys16[order], canon[order], counts[order]
    else:
        P = 1 << max(0, (max(1, len(blocks)) - 1).bit_length() - 2)  # ~blocks/4
        from imagededupx_ray.util import block_group_size

        group = block_group_size(len(blocks))
        per_block = [
            _dup_map_block.options(num_returns=P if P > 1 else 1).remote(
                P, *blocks[i : i + group]
            )
            for i in range(0, len(blocks), group)
        ]
        if P == 1:
            red = [_dup_reduce_part.remote(*per_block)] if per_block else []
        else:
            red = [
                _dup_reduce_part.remote(*col) for col in zip(*per_block)
            ]
        if strategy == "auto" and red:
            sizes = ray.get([_dup_part_len.remote(r) for r in red])
            if sum(sizes) > JOIN_FALLBACK_GROUPS:
                return _exact_dedup_join(docs_ds, _dup_groups_df(docs_ds), return_extras)
        res = ray.get(red)
        if res:
            ks = np.concatenate([r[0] for r in res])
            mn = np.concatenate([r[1] for r in res])
            ct = np.concatenate([r[2] for r in res])
        else:
            ks = np.empty(0, "S16")
            mn = ct = np.empty(0, np.int64)
        order = np.argsort(ks)
        keys_s, canon_s, counts_s = ks[order], mn[order], ct[order]
    if metrics is not None:
        metrics["dupgroups_collect_sec"] = round(_time.monotonic() - _t, 3)
    _t = _time.monotonic()
    dup_ref = ray.put((keys_s, canon_s, counts_s))
    if metrics is not None:
        metrics["dupref_build_sec"] = round(_time.monotonic() - _t, 3)

    def _lookup(batch: pa.Table):
        """Per-row (ids, hit mask, canonical-at-row, count-at-row) via
        vectorized searchsorted against the broadcast sorted key arrays."""
        d_keys, d_canon, d_counts = ray.get(dup_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d_keys) == 0:
            n = len(ids)
            return ids, np.zeros(n, bool), np.full(n, -1, np.int64), np.ones(n, np.int64)
        s = i64_pair_to_key16(*sha_to_i64_pair(batch["text_sha256"]))
        pos = np.searchsorted(d_keys, s)
        pos[pos >= len(d_keys)] = 0
        hit = d_keys[pos] == s
        canon_at = np.where(hit, d_canon[pos], -1)
        count_at = np.where(hit, d_counts[pos], 1)
        return ids, hit, canon_at, count_at

    def keep_winners(batch: pa.Table) -> pa.Table:
        ids, hit, canon_at, count_at = _lookup(batch)
        keep = ~hit | (ids == canon_at)
        return batch.filter(pa.array(keep)).append_column(
            "n_exact_dups", pa.array(count_at[keep], type=pa.int64())
        )

    def dup_members(batch: pa.Table) -> pa.Table:
        _, hit, canon_at, _ = _lookup(batch)
        out = batch.select(["doc_id", "url", "text_sha256"]).filter(pa.array(hit))
        return out.append_column(
            "canonical_doc_id", pa.array(canon_at[hit], type=pa.int64())
        )

    docs_unique = docs_ds.map_batches(keep_winners, batch_format="pyarrow")
    dup_map = docs_ds.map_batches(dup_members, batch_format="pyarrow")
    if return_extras:
        return docs_unique, dup_map, docs_ds, dup_ref
    return docs_unique, dup_map


def _exact_dedup_join(docs_ds, dup_groups_ds, return_extras: bool):
    """Join-strategy winner resolution: the dup-group table never collects.
    Both joins are hash-partitioned on the native int128 key (h1, h2); only
    the narrow dup-group side and the doc rows that MATCH it shuffle (left
    side stays put for the unique majority via the left-outer join's
    pass-through)."""
    from imagededupx_ray.util import suggest_num_partitions

    nparts = suggest_num_partitions()
    dup_narrow = dup_groups_ds.map_batches(
        lambda t: t.select(["h1", "h2", "canonical_doc_id", "n_exact_dups"]),
        batch_format="pyarrow",
    )

    def with_keys(batch: pa.Table) -> pa.Table:
        h1, h2 = sha_to_i64_pair(batch["text_sha256"])
        return batch.append_column("h1", pa.array(h1, type=pa.int64())).append_column(
            "h2", pa.array(h2, type=pa.int64())
        )

    joined = docs_ds.map_batches(with_keys, batch_format="pyarrow").join(
        dup_narrow,
        join_type="left_outer",
        num_partitions=nparts,
        on=("h1", "h2"),
    )

    def winners(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # fill nulls ARROW-side: a nullable int64 through to_numpy becomes
        # float64 and mangles 63-bit ids above 2^53
        canon = (
            pa.compute.fill_null(batch["canonical_doc_id"], -1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = (
            pa.compute.fill_null(batch["n_exact_dups"], 1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        hit = canon >= 0
        keep = ~hit | (ids == canon)
        n_dups = np.where(hit, n, 1).astype(np.int64)
        out = batch.drop_columns(["canonical_doc_id", "n_exact_dups", "h1", "h2"]).filter(
            pa.array(keep)
        )
        return out.append_column("n_exact_dups", pa.array(n_dups[keep], type=pa.int64()))

    def members(batch: pa.Table) -> pa.Table:
        hit = ~pa.compute.is_null(batch["canonical_doc_id"]).to_numpy(
            zero_copy_only=False
        )
        out = batch.select(
            ["doc_id", "url", "text_sha256", "canonical_doc_id"]
        ).filter(pa.array(hit))
        return out.set_column(
            out.column_names.index("canonical_doc_id"),
            "canonical_doc_id",
            out["canonical_doc_id"].cast(pa.int64()),
        )

    joined = joined.materialize()
    docs_unique = joined.map_batches(winners, batch_format="pyarrow")
    dup_map = joined.map_batches(members, batch_format="pyarrow")
    if return_extras:
        return docs_unique, dup_map, docs_ds, None
    return docs_unique, dup_map


def softdedup_weights(clusters_ds, id_col: str = "doc_id",
                      cluster_col: str = "cluster_id",
                      num_partitions: int = 64):
    """Soft dedup: DOWNWEIGHT duplicates instead of dropping them (the
    "reweight by commonness" alternative to hard removal, e.g. SoftDedup,
    He et al. ACL 2024; this is the cluster-size variant every soft-dedup
    recipe reduces to). Input is
    any (id, cluster) assignment — e.g. the flagship near-dup pipeline's
    ``clusters`` — and every member of a k-doc duplicate community gets
    sampling weight 1/k, so each community contributes exactly ONE
    doc-equivalent to the training mix while rare phrasing variants inside
    it remain visible to the sampler (what hard dedup destroys).

    Scale shape: cluster sizes are NOT bounded-key (cluster count grows
    with the corpus), so no driver aggregate and no broadcast — ONE
    coarse-partition exchange on ``hash64(cluster_id) & (P-1)`` co-locates
    each cluster, then a lexsort + segmented count emits (id, cluster,
    n_members, weight) per row. Same exchange discipline as url_dedup /
    host_cap; a hot mega-cluster costs its partition one sort."""
    import pandas as pd

    from imagededupx_ray.functions.hashing import splitmix64
    from imagededupx_ray.stages.lsh import _pow2

    p = _pow2(num_partitions)

    def prep(batch: pa.Table) -> pa.Table:
        cl = batch[cluster_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            splitmix64(cl.view(np.uint64)) & np.uint64(p - 1)
        ).astype(np.int32)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                cluster_col: pa.array(cl, type=pa.int64()),
                "_part": pa.array(part, type=pa.int32()),
            }
        )

    def weigh(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        cl = group[cluster_col].to_numpy()
        order = np.lexsort((ids, cl))
        cl_s = cl[order]
        starts = np.r_[True, cl_s[1:] != cl_s[:-1]]
        seg = np.cumsum(starts) - 1
        sizes = np.bincount(seg)[seg]
        return pd.DataFrame(
            {
                id_col: ids[order],
                cluster_col: cl_s,
                "n_members": sizes.astype(np.int64),
                "weight": 1.0 / sizes,
            }
        )

    return (
        clusters_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(weigh, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def snapshot_dup_attribution(
    assign_ds,
    cluster_col: str = "cluster_id",
    snap_col: str = "snapshot",
    num_partitions: int = 64,
):
    """Cross-snapshot duplicate ATTRIBUTION — the FineWeb measurement
    (Penedo et al. 2024 §3.1: most web duplicates live ACROSS crawl
    snapshots, which is why per-snapshot dedup and global dedup keep very
    different corpora). Input: any (cluster, snapshot) assignment — e.g.
    the flagship pipeline's ``clusters`` with the crawl snapshot attached.
    Output: one row per snapshot ``(snapshot, n_docs, n_dup_docs,
    n_cross_dup_docs)`` where a doc is *dup* when its cluster has >= 2
    members and *cross* when that cluster touches >= 2 snapshots.

    Scale shape: cluster count is corpus-sized, so ONE coarse
    ``hash64(cluster_id) & (P-1)`` exchange co-locates each cluster
    (softdedup_weights' discipline), a lexsort + segmented scan emits
    per-doc int8 dup/cross flags, and the per-snapshot report is a
    bounded-key ``util.partial_groupby`` (snapshot domain = crawl count,
    a few dozen at most). Nothing corpus-sized reaches the driver. DuckDB
    window twin + cross-blocking identity + planted gates:
    tests/test_snapshot_attribution.py."""
    import pandas as pd

    from imagededupx_ray.functions.hashing import splitmix64
    from imagededupx_ray.stages.lsh import _pow2
    from imagededupx_ray.util import partial_groupby

    p = _pow2(num_partitions)

    def prep(batch: pa.Table) -> pa.Table:
        cl = batch[cluster_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            splitmix64(cl.view(np.uint64)) & np.uint64(p - 1)
        ).astype(np.int32)
        return pa.table(
            {
                cluster_col: pa.array(cl, type=pa.int64()),
                snap_col: batch[snap_col].cast(pa.int64()),
                "_part": pa.array(part, type=pa.int32()),
            }
        )

    def flag(group: pd.DataFrame) -> pd.DataFrame:
        cl = group[cluster_col].to_numpy()
        sn = group[snap_col].to_numpy()
        order = np.lexsort((sn, cl))
        cl_s, sn_s = cl[order], sn[order]
        starts = np.r_[True, cl_s[1:] != cl_s[:-1]]
        seg = np.cumsum(starts) - 1
        sizes = np.bincount(seg)
        # distinct snapshots per cluster: rows are sorted (cluster,
        # snapshot), so a distinct value begins at each segment start or
        # in-segment snapshot change
        new_snap = starts | np.r_[True, sn_s[1:] != sn_s[:-1]]
        nsnap = np.bincount(seg, weights=new_snap).astype(np.int64)
        return pd.DataFrame(
            {
                snap_col: sn_s,
                "dup": (sizes[seg] > 1).astype(np.int8),
                "cross": (nsnap[seg] > 1).astype(np.int8),
            }
        )

    flags = (
        assign_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(flag, batch_format="pandas")
    )
    return partial_groupby(
        flags,
        [snap_col],
        [
            ("count", snap_col, "n_docs"),
            ("sum", "dup", "n_dup_docs"),
            ("sum", "cross", "n_cross_dup_docs"),
        ],
    )
