"""Pair verification: candidate pairs × signatures → verified pairs
(SURVEY.md §2.5 G4).

est_jaccard = fraction of agreeing minhash components (128-perm agreement);
hamming = popcount(simhash_a ^ simhash_b). A pair survives if
``est_jaccard >= jaccard_threshold`` OR ``hamming <= simhash_hamming_max``
(the exact-ish tier; reference threshold presets
/root/reference/README.md:206-209, hamming similarity
/root/reference/similarities/similarities/literal_similarity.py:119-125).

Signature lookup strategies (SURVEY.md §2.4 J1 — reference used positional
``df.iloc[faiss_id]``; ours joins on content-derived doc_id):

- ``broadcast``: signatures put in the object store ONCE (``ray.put``), each
  verify actor reads them once in ``__init__`` — no shuffle; right whenever
  the signature table fits a worker (sf-scale tests/bench; ~1 KB/doc).
- ``join``: hash-partitioned ``Dataset.join`` on doc_id for both sides — the
  10^12-doc path; two narrow shuffles of the (small) pair table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.functions.hashing import popcount64
from imagededupx_ray.stages.signatures import signatures_to_numpy


def _pair_metrics(
    mh_a: np.ndarray, mh_b: np.ndarray, sim_a: np.ndarray, sim_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    est = (mh_a == mh_b).mean(axis=1).astype(np.float32)
    ham = popcount64(sim_a ^ sim_b).astype(np.uint8)
    return est, ham


class BroadcastVerify:
    """Broadcast-lookup stage: signature arrays fetched from the object store
    once per worker; per-batch work is searchsorted + vectorized compare.
    The broadcast holds (sorted ids, argsort permutation, UNSORTED matrices):
    reordering the 100s-of-MB minhash matrix at broadcast time cost more than
    every lookup it would save — the permutation indirection is 8 bytes/doc."""

    def __init__(self, sig_ref, cfg: DedupConfig = DEFAULT_CONFIG):
        self.ids_sorted, self.order, self.mh, self.sim = ray.get(sig_ref)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # candidate ids come from the same pipeline run, but clamp + verify
        # membership anyway: an id above every broadcast id would IndexError
        # and a missing id would silently read a wrong row
        if len(self.ids_sorted) == 0:
            a = a[:0]
            b = b[:0]
        pa_pos = np.searchsorted(self.ids_sorted, a)
        pb_pos = np.searchsorted(self.ids_sorted, b)
        pa_pos[pa_pos >= max(len(self.ids_sorted), 1)] = 0
        pb_pos[pb_pos >= max(len(self.ids_sorted), 1)] = 0
        ok = (
            (self.ids_sorted[pa_pos] == a) & (self.ids_sorted[pb_pos] == b)
            if len(a)
            else np.empty(0, dtype=bool)
        )
        if not np.all(ok):
            a, b = a[ok], b[ok]
            pa_pos, pb_pos = pa_pos[ok], pb_pos[ok]
        ia = self.order[pa_pos]
        ib = self.order[pb_pos]
        est, ham = _pair_metrics(self.mh[ia], self.mh[ib], self.sim[ia], self.sim[ib])
        keep = (est >= self.cfg.jaccard_threshold) | (ham <= self.cfg.simhash_hamming_max)
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "est_jaccard": pa.array(est[keep], type=pa.float32()),
                "hamming": pa.array(ham[keep], type=pa.uint8()),
            }
        )


@ray.remote
def _sig_compact(batch: pa.Table, want, nperm: int):
    """One materialized signature block → (ids i64, mh u32 matrix, sim
    u64), restricted to ``want`` (auto-dereferenced broadcast array).
    Minhash truncates to the low 32 bits: verify only tests per-component
    EQUALITY (est_jaccard = agreement fraction), and a 32-bit false-equal
    is 2^-32/component — halves every broadcast cost."""
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        # 0-row blocks may carry no schema at all
        return (
            np.empty(0, np.int64),
            np.empty((0, nperm), np.uint32),
            np.empty(0, np.uint64),
        )
    i, m, s, _ = signatures_to_numpy(batch, nperm)
    if want is not None:
        if len(want):
            pos = np.searchsorted(want, i)
            pos[pos >= len(want)] = 0
            keep = want[pos] == i
        else:
            keep = np.zeros(len(i), dtype=bool)
        i, m, s = i[keep], m[keep], s[keep]
    return (
        i.astype(np.int64, copy=False),
        np.ascontiguousarray(m.astype(np.uint32)),
        s.astype(np.uint64, copy=False),
    )


@ray.remote
def _sig_assemble(nperm: int, *cells):
    """Concat the per-block cells into the broadcast arrays INSIDE a
    worker — the big object is written to the object store once as the
    task's return value; the driver only ever holds the ref (driver
    serial time is what caps scaling efficiency)."""
    ids = np.concatenate([c[0] for c in cells]) if cells else np.empty(0, np.int64)
    mh = (
        np.concatenate([c[1] for c in cells])
        if cells
        else np.empty((0, nperm), np.uint32)
    )
    sim = np.concatenate([c[2] for c in cells]) if cells else np.empty(0, np.uint64)
    order = np.argsort(ids).astype(np.int64)
    return (ids[order], order, mh, sim)


def broadcast_signatures(
    signatures_ds, cfg: DedupConfig = DEFAULT_CONFIG, only_ids: np.ndarray | None = None
):
    """Compact the signature table into numpy arrays and publish them to the
    object store ONCE (SURVEY.md §2.3 A5 broadcast pattern). The arrow→numpy
    conversion runs IN PARALLEL as a map_batches (each block ships one
    pre-packed binary cell); a Ray task concatenates the cells and returns
    the broadcast tuple, so the driver only ever holds the ObjectRef —
    driver serial time is what caps scaling efficiency. ``only_ids``
    restricts the broadcast to the docs that actually appear in candidate
    pairs (typically a small fraction of the corpus — the unique majority
    never reaches verify). ids are index-sorted via a permutation; the
    matrix is not physically reordered; minhash components are truncated to
    uint32 (equality-only semantics halve the broadcast)."""
    nperm = cfg.num_perms
    only_ref = ray.put(np.sort(only_ids.astype(np.int64))) if only_ids is not None else None

    # plain ray tasks over the signature blocks — no Dataset execution (its
    # planning/stream/barrier latency was a fixed serial segment in the
    # verify phase); to_arrow_refs() on the materialized signatures is free.
    # _sig_compact/_sig_assemble are module-scope so their one-time export
    # cost never lands inside a timed pipeline run (closure remotes
    # re-export per call).
    cells = [
        _sig_compact.remote(r, only_ref, nperm)
        for r in signatures_ds.to_arrow_refs()
    ]
    return _sig_assemble.remote(nperm, *cells)


_PROC_CACHE: dict = {}


def verify_pairs_broadcast(
    cand_pairs_ds,
    signatures_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    concurrency=None,
    pair_ids: np.ndarray | None = None,
):
    sig_ref = broadcast_signatures(signatures_ds, cfg, only_ids=pair_ids)
    if concurrency is None:
        # task mode: the verifier (holding the zero-copy broadcast arrays) is
        # constructed once per worker process — no actor-pool cold start
        key = sig_ref.hex()

        def fn(batch: pa.Table) -> pa.Table:
            v = _PROC_CACHE.get(key)
            if v is None:
                _PROC_CACHE.clear()  # previous runs' refs are dead weight
                v = _PROC_CACHE[key] = BroadcastVerify(sig_ref, cfg)
            return v(batch)

        return cand_pairs_ds.map_batches(fn, batch_format="pyarrow", batch_size=65536)
    from imagededupx_ray.util import clamp_actor_pool

    return cand_pairs_ds.map_batches(
        BroadcastVerify,
        fn_constructor_kwargs={"sig_ref": sig_ref, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=clamp_actor_pool(concurrency),
        num_cpus=1,
    )


@ray.remote
def _pair_map_block(P: int, *tables: pa.Table):
    """Map side of the fused pair-distinct+verify exchange: hash-split a
    GROUP of raw-pair blocks into P (a, b) partition slices by the pair key
    (one task per fanout-sized group — per-task dispatch plus B×P ref
    plumbing anti-scaled when the pair exchange emitted hundreds of small
    blocks at high parallelism)."""
    from imagededupx_ray.functions import hashing as H

    live = [t for t in tables if t.num_rows and "a" in t.column_names]
    if not live:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(empty for _ in range(P)) if P > 1 else empty
    a = np.concatenate(
        [t["a"].to_numpy(zero_copy_only=False).astype(np.int64) for t in live]
    )
    b = np.concatenate(
        [t["b"].to_numpy(zero_copy_only=False).astype(np.int64) for t in live]
    )
    key = (
        H.splitmix64(a.astype(np.uint64) ^ (b.astype(np.uint64) << np.uint64(1))).astype(
            np.int64
        )
        & np.int64(P - 1)
    ).astype(np.int32)
    order = np.argsort(key, kind="stable")
    a, b, key = a[order], b[order], key[order]
    offs = np.searchsorted(key, np.arange(P + 1))
    out = tuple((a[offs[i] : offs[i + 1]], b[offs[i] : offs[i + 1]]) for i in range(P))
    return out if P > 1 else out[0]


@ray.remote
def _pair_verify_part(sig, cfg, *parts) -> pa.Table:
    """Reduce one pair partition: global pair-distinct (duplicates of a pair
    always share a partition) then the vectorized signature compare. ``sig``
    is the auto-dereferenced broadcast tuple — zero-copy plasma read."""
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    if len(a):
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.empty(len(a), dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[keep], b[keep]
    v = BroadcastVerify.__new__(BroadcastVerify)
    v.ids_sorted, v.order, v.mh, v.sim = sig
    v.cfg = cfg
    return v(pa.table({"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}))


# same crossover rationale as stages/dedup.py MANUAL_SHUFFLE_MAX_BLOCKS: the
# manual exchange's B×P slice objects are cheap bookkeeping on any realistic
# per-node block count; a giant pair explosion falls back to the Dataset
# groupby (backpressured, spillable)
_PAIR_MANUAL_MAX_BLOCKS = 4096


def verify_pairs_broadcast_fused(
    raw_pairs_ds,
    signatures_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    pair_ids: np.ndarray | None = None,
    num_partitions: int | None = None,
    sig_ref=None,
):
    """RAW (possibly duplicated) candidate pairs → verified pairs in ONE
    exchange: the cross-band pair-distinct and the signature-compare both run
    inside the same hash exchange — fusing what was a dedup shuffle followed
    by a separate verify pass (SURVEY.md §4.2: minimize all-to-all
    exchanges).

    Default path is a manual two-stage task exchange over the (materialized)
    raw-pair blocks: per-block hash split into P slices, P reduce tasks do
    the distinct+verify, output re-enters Ray Data via from_arrow_refs with
    zero copies. Measured ~0.4s at 1.2M pages/32 CPUs where the equivalent
    ``groupby(_part).map_groups`` execution took ~1.0s of mostly
    parallelism-independent sort/planning machinery. Falls back to the
    Dataset groupby above _PAIR_MANUAL_MAX_BLOCKS blocks."""
    from imagededupx_ray.stages.lsh import _pow2, decorate_pair_part
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    if sig_ref is None:
        # callers with a pre-assembled broadcast tuple (e.g. the incremental
        # merge's sorted-sidecar gather) pass sig_ref and skip this scan
        sig_ref = broadcast_signatures(signatures_ds, cfg, only_ids=pair_ids)

    blocks = raw_pairs_ds.to_arrow_refs()
    if len(blocks) <= _PAIR_MANUAL_MAX_BLOCKS:
        import ray.data as rd

        if not blocks:
            return rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.int64()),
                        "est_jaccard": pa.array([], type=pa.float32()),
                        "hamming": pa.array([], type=pa.uint8()),
                    }
                )
            )
        P = min(p, 1 << max(0, (len(blocks) - 1).bit_length()))
        from imagededupx_ray.util import block_group_size

        # per_cpu=1: this exchange parallelizes on its P reduce tasks; the
        # map side's cost is the (B/group) x P ref fabric, so fewer, larger
        # map groups win (measured 0.32 s vs 0.99 s at 32 procs)
        group = block_group_size(len(blocks), per_cpu=1)
        per_block = [
            _pair_map_block.options(num_returns=P if P > 1 else 1).remote(
                P, *blocks[i : i + group]
            )
            for i in range(0, len(blocks), group)
        ]
        cols = [per_block] if P == 1 else list(zip(*per_block))
        out_refs = [
            _pair_verify_part.remote(sig_ref, cfg, *col) for col in cols
        ]
        return rd.from_arrow_refs(out_refs)

    key = sig_ref.hex()

    def dedup_and_verify(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            keep = np.empty(len(a), dtype=bool)
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        v = _PROC_CACHE.get(key)
        if v is None:
            _PROC_CACHE.clear()
            v = _PROC_CACHE[key] = BroadcastVerify(sig_ref, cfg)
        out = v(
            pa.table(
                {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
            )
        )
        return out.to_pandas()

    return (
        raw_pairs_ds.map_batches(decorate_pair_part(p), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dedup_and_verify, batch_format="pandas")
        # arrow-normalize: see lsh_raw_pairs (mixed block types break readers)
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def verify_pairs_join(
    cand_pairs_ds,
    signatures_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
):
    """Scale path: two hash-partitioned joins on doc_id (Ray Dataset.join),
    then the same vectorized metric kernel."""
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions()
    nperm = cfg.num_perms

    def pack(batch: pa.Table) -> pa.Table:
        # acero joins reject (fixed_size_)list payload columns — carry the
        # signature as fixed-width binary (num_perms * 8 bytes) through the join
        ids, mh, sim, _ = signatures_to_numpy(batch, nperm)
        raw = np.ascontiguousarray(mh).tobytes()
        mh_bin = pa.Array.from_buffers(
            pa.binary(nperm * 8), len(ids), [None, pa.py_buffer(raw)]
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "minhash": mh_bin,
                "simhash": pa.array(sim, type=pa.uint64()),
            }
        )

    sig_a = signatures_ds.map_batches(pack, batch_format="pyarrow")

    joined = cand_pairs_ds.join(
        sig_a,
        join_type="inner",
        on=("a",),
        right_on=("doc_id",),
        num_partitions=num_partitions,
    ).rename_columns({"minhash": "minhash_a", "simhash": "simhash_a"})
    joined = joined.join(
        sig_a,
        join_type="inner",
        on=("b",),
        right_on=("doc_id",),
        num_partitions=num_partitions,
    ).rename_columns({"minhash": "minhash_b", "simhash": "simhash_b"})

    def metrics(batch: pa.Table) -> pa.Table:
        def mat(col):
            c = batch[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            # fixed_size_binary data buffer -> (n, nperm) u64, offset-aware
            buf = np.frombuffer(c.buffers()[1], dtype=np.uint64)
            start = c.offset * nperm
            return buf[start : start + len(c) * nperm].reshape(-1, nperm)

        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sim_a = batch["simhash_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sim_b = batch["simhash_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        est, ham = _pair_metrics(mat("minhash_a"), mat("minhash_b"), sim_a, sim_b)
        keep = (est >= cfg.jaccard_threshold) | (ham <= cfg.simhash_hamming_max)
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "est_jaccard": pa.array(est[keep], type=pa.float32()),
                "hamming": pa.array(ham[keep], type=pa.uint8()),
            }
        )

    return joined.map_batches(metrics, batch_format="pyarrow", batch_size=32768)
