"""LSH banding shuffle: signatures → (bucket, doc_id) rows → candidate pairs
(SURVEY.md §7.2 step 4 — THE core shuffle, §2.5 G1).

Replaces the reference's candidate generation — FAISS ANN indexes
(/root/reference/improved_faiss_detector.py:297-317) and brute-force all-pairs
mining with a global priority queue
(/root/reference/similarities/similarities/utils/util.py:170-234) — with a
groupby shuffle: each doc emits one row per band keyed by the band's bucket
hash; docs sharing any band bucket become candidate pairs.

Execution shape (scale notes): everything is a COARSE-PARTITION groupby —
group key = ``bucket & (P-1)`` — so the exchange is a task-based sort shuffle
into P partitions and each ``map_groups`` call sees ALL buckets of one
partition at once, resolving pairs fully vectorized (lexsort + stride tricks).
No per-bucket Python (the overwhelming majority of buckets are singletons),
no ``Dataset.join`` (its per-partition aggregator ACTORS deadlock small
clusters and pay startup per stage).

Skew handling (SURVEY.md §4.2 items 1-2; the reference never faced this at
<=1e5 docs): exact dups are collapsed BEFORE signatures, and buckets larger
than ``max_bucket_size`` switch from all-pairs (O(g^2)) to sorted
sliding-window emission (O(g*W)) — bounded pair explosion while preserving
within-bucket connectivity for union-find (all docs in a bucket form one
chain), so clustering recall survives even when pair emission is capped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.stages.signatures import signatures_to_numpy
from imagededupx_ray.util import suggest_num_partitions

_MASK63 = np.int64((1 << 63) - 1)


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def explode_bands(cfg: DedupConfig = DEFAULT_CONFIG, partitions: int = 64):
    """Batch fn: signatures → LSH rows (part:int32, bucket:i64, doc_id:i64).
    Docs with no shingles never enter LSH (empty texts are exact-dedup
    territory). The band index is mixed INTO the bucket hash, so a single
    int64 groupby key partitions all bands at once; ``part`` is the coarse
    shuffle key."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, mh, _, nsh = signatures_to_numpy(batch, cfg.num_perms)
        keep = nsh > 0
        ids, mh = ids[keep], mh[keep]
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "_part": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        buckets = H.band_buckets(mh, cfg.lsh_bands, cfg.lsh_rows).reshape(-1)
        return pa.table(
            {
                "_part": pa.array(
                    (buckets & np.int64(partitions - 1)).astype(np.int32),
                    type=pa.int32(),
                ),
                "bucket": pa.array(buckets, type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, cfg.lsh_bands), type=pa.int64()),
            }
        )

    return fn


def emit_pairs_vectorized(
    bucket: np.ndarray,
    doc_id: np.ndarray,
    max_bucket_size: int,
    window: int,
) -> tuple[np.ndarray, np.ndarray]:
    """All (a < b) candidate pairs from (bucket, doc_id) rows, fully
    vectorized over every bucket at once.

    lexsort by (bucket, doc_id); rows i and i+w pair up iff they share a
    bucket AND (the bucket is small enough for all-pairs, or w <= window for
    hot buckets). The w-loop runs only over rows of non-singleton buckets, so
    cost is O(dup_rows * min(max_group, cap)) — singletons (the vast
    majority) cost one sort pass.
    """
    order = np.lexsort((doc_id, bucket))
    b = bucket[order]
    d = doc_id[order]
    # group boundaries + sizes
    if len(b) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    new_grp = np.empty(len(b), dtype=bool)
    new_grp[0] = True
    np.not_equal(b[1:], b[:-1], out=new_grp[1:])
    # drop exact (bucket, doc_id) repeats (same doc twice in one bucket is a
    # cross-band hash collision; harmless but would emit a==b pairs)
    dup_row = np.zeros(len(b), dtype=bool)
    dup_row[1:] = (~new_grp[1:]) & (d[1:] == d[:-1])
    if dup_row.any():
        keep = ~dup_row
        b, d = b[keep], d[keep]
        new_grp = np.empty(len(b), dtype=bool)
        new_grp[0] = True
        np.not_equal(b[1:], b[:-1], out=new_grp[1:])
    starts = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(starts, len(b)))
    size_of_row = np.repeat(sizes, sizes)
    grp_of_row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    # restrict to non-singleton buckets
    multi = size_of_row >= 2
    if not multi.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    d2 = d[multi]
    g2 = grp_of_row[multi]
    s2 = size_of_row[multi]
    max_w = int(min(s2.max() - 1, max(max_bucket_size - 1, window)))
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    for w in range(1, max_w + 1):
        same = g2[w:] == g2[:-w]
        allowed = same & ((s2[:-w] <= max_bucket_size) | (w <= window))
        if allowed.any():
            parts_a.append(d2[:-w][allowed])
            parts_b.append(d2[w:][allowed])
    if not parts_a:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(parts_a), np.concatenate(parts_b)


def _emit_group(cfg: DedupConfig):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        a, b = emit_pairs_vectorized(
            df["bucket"].to_numpy(),
            df["doc_id"].to_numpy(),
            cfg.max_bucket_size,
            cfg.bucket_window,
        )
        # local distinct: near-identical docs share most bands, so the same
        # pair is re-emitted by every band that lands in this partition —
        # one cheap lexsort here shrinks the downstream exchange
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            keep = np.empty(len(a), dtype=bool)
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        return pd.DataFrame({"a": a, "b": b})

    return fn


def _dedup_pairs_group(df: pd.DataFrame) -> pd.DataFrame:
    a = df["a"].to_numpy()
    b = df["b"].to_numpy()
    if len(a) == 0:
        return pd.DataFrame({"a": a, "b": b})
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pd.DataFrame({"a": a[keep], "b": b[keep]})


def _find_hot_buckets(lsh_rows, threshold: int, num_blocks: int) -> np.ndarray:
    """Bucket ids with (approximately detected, then exactly counted) more
    than ``threshold`` rows. Detection is MAP-SIDE — each block reports only
    buckets locally big enough that a globally-hot bucket must trip it in
    some block. For that guarantee to hold, ``local_thr`` must be
    ``threshold // num_blocks`` (pigeonhole: a bucket spread over B blocks
    with > threshold total rows has > threshold/B rows in some block);
    ``num_blocks`` is the upstream signature-block count with a 2x safety
    factor for map_batches block splitting — a uniformly-spread mega-bucket
    can otherwise slip under a hardcoded divisor at >4M docs."""
    local_thr = max(2, threshold // max(1, 2 * num_blocks))

    def local_candidates(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, counts = np.unique(b, return_counts=True)
        big = counts >= local_thr
        return pa.table(
            {
                "bucket": pa.array(uniq[big], type=pa.int64()),
                "n": pa.array(counts[big], type=pa.int64()),
            }
        )

    cand = lsh_rows.map_batches(local_candidates, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64)
    totals = cand.groupby("bucket")["n"].sum()
    return np.sort(totals[totals > threshold].index.to_numpy().astype(np.int64))


def lsh_raw_pairs(
    signatures_ds, cfg: DedupConfig = DEFAULT_CONFIG, num_partitions: int | None = None
):
    """signatures → RAW candidate pairs (a < b, may contain cross-band
    duplicates): the emission half of the LSH shuffle. Use
    ``lsh_candidate_pairs`` for the distinct set, or feed this straight into
    ``verify_pairs_broadcast_fused`` which dedups inside the verify shuffle
    (one exchange instead of two).

    Salting (north rule; SURVEY.md §4.2 item 1): buckets above
    cfg.salt_threshold rows are re-keyed by ``doc_id % salt_k`` so no single
    shuffle partition must hold a mega-bucket; each salted sub-bucket emits
    its window pairs independently and the per-sub-bucket minima are chained
    so the bucket stays one connected component for union-find."""
    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    # lsh_rows is NOT materialized: explode_bands is a cheap 1:1 kernel over
    # the (already materialized) signatures, so the hot-bucket scan and the
    # pair-emission shuffle each re-derive it as a fused map — two cheap
    # recomputes beat writing the 20x-wider band-row table through the
    # object store once (measured: the materialize was ~30% of LSH wall)
    lsh_rows = signatures_ds.map_batches(
        explode_bands(cfg, partitions=p), batch_format="pyarrow", batch_size=4096
    )

    chain_pairs_tbl = None
    if cfg.salt_threshold is not None:
        try:
            sig_blocks = signatures_ds.num_blocks()
        except Exception:
            sig_blocks = suggest_num_partitions(per_cpu=2)
        hot = _find_hot_buckets(lsh_rows, cfg.salt_threshold, sig_blocks)
        if len(hot):
            import ray

            hot_ref = ray.put(hot)
            k = np.int64(cfg.salt_k)

            def salt(t: pa.Table) -> pa.Table:
                h = ray.get(hot_ref)
                b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
                d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                part = t["_part"].to_numpy(zero_copy_only=False).astype(np.int32).copy()
                pos = np.searchsorted(h, b)
                pos[pos >= len(h)] = 0
                is_hot = h[pos] == b
                if is_hot.any():
                    salted = (
                        H.splitmix64(
                            (b[is_hot].astype(np.uint64) << np.uint64(6))
                            ^ (d[is_hot] % k).astype(np.uint64)
                        ).astype(np.int64)
                        & np.int64(p - 1)
                    ).astype(np.int32)
                    part[is_hot] = salted
                return pa.table(
                    {
                        "_part": pa.array(part, type=pa.int32()),
                        "bucket": t["bucket"],
                        "doc_id": t["doc_id"],
                    }
                )

            # chain links: min doc per (bucket, salt) — tiny narrow aggregate
            # over only the hot rows — consecutive minima pair up per bucket
            def hot_mins(t: pa.Table) -> pa.Table:
                h = ray.get(hot_ref)
                b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
                d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.searchsorted(h, b)
                pos[pos >= len(h)] = 0
                is_hot = h[pos] == b
                if not is_hot.any():
                    return pa.table(
                        {
                            "bucket": pa.array([], type=pa.int64()),
                            "salt": pa.array([], type=pa.int64()),
                            "m": pa.array([], type=pa.int64()),
                        }
                    )
                df = pd.DataFrame(
                    {"bucket": b[is_hot], "salt": d[is_hot] % int(k), "m": d[is_hot]}
                )
                g = df.groupby(["bucket", "salt"], as_index=False)["m"].min()
                return pa.Table.from_pandas(g, preserve_index=False)

            mins = (
                lsh_rows.map_batches(hot_mins, batch_format="pyarrow")
                .to_pandas()
                .groupby(["bucket", "salt"], as_index=False)["m"]
                .min()
                .sort_values(["bucket", "salt"])
            )
            chain_a, chain_b = [], []
            for _, grp in mins.groupby("bucket"):
                ms = grp["m"].to_numpy()
                if len(ms) > 1:
                    lo = np.minimum(ms[:-1], ms[1:])
                    hi = np.maximum(ms[:-1], ms[1:])
                    chain_a.append(lo)
                    chain_b.append(hi)
            if chain_a:
                chain_pairs_tbl = pa.table(
                    {
                        "a": pa.array(np.concatenate(chain_a), type=pa.int64()),
                        "b": pa.array(np.concatenate(chain_b), type=pa.int64()),
                    }
                )
            lsh_rows = lsh_rows.map_batches(salt, batch_format="pyarrow")

    pairs = lsh_rows.groupby("_part").map_groups(
        _emit_group(cfg), batch_format="pandas"
    )
    if chain_pairs_tbl is not None:
        import ray.data as rd

        pairs = pairs.union(rd.from_arrow(chain_pairs_tbl))
    # normalize to arrow blocks: map_groups emits pandas blocks but skipped
    # empty partitions pass through as arrow — a mixed-type dataset breaks
    # any multi-block iter_batches downstream
    return pairs.map_batches(lambda t: t, batch_format="pyarrow")


def decorate_pair_part(p: int):
    """Batch fn: attach the pair-dedup coarse shuffle key
    ``splitmix64(a ^ (b<<1)) & (p-1)``."""

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

    return decorate


def lsh_candidate_pairs_from_raw(
    raw_pairs_ds, cfg: DedupConfig = DEFAULT_CONFIG, num_partitions: int | None = None
):
    """RAW pairs → distinct pairs via the pair-hash coarse-partition shuffle
    (the reference's mirrored-pair set, utils/util.py:222-230, as a
    vectorized distinct)."""
    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    return (
        raw_pairs_ds.map_batches(decorate_pair_part(p), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_dedup_pairs_group, batch_format="pandas")
    )


def lsh_candidate_pairs(
    signatures_ds, cfg: DedupConfig = DEFAULT_CONFIG, num_partitions: int | None = None
):
    """signatures → DISTINCT candidate pairs (a < b).

    Two task-based sort-shuffle groupbys, both on coarse power-of-two keys:
    pair emission (bucket & (P-1)) and cross-band pair dedup
    (hash(a) & (P-1)). The main pipeline skips this second shuffle by fusing
    the distinct into the verify exchange (verify_pairs_broadcast_fused)."""
    raw = lsh_raw_pairs(signatures_ds, cfg, num_partitions)
    return lsh_candidate_pairs_from_raw(raw, cfg, num_partitions)


# ---------------------------------------------------------------------------
# manual two-stage LSH pair exchange (VERDICT r4 #3): the Dataset
# groupby("_part") sort shuffle over the ~bands×docs band rows carries
# parallelism-independent sort/planning machinery that capped LSH stage
# scaling at ~2.4x of 4 while compute stages tracked the spin ceiling.
# This is the stages/dedup.py discipline instead: fanout-grouped map tasks
# explode bands and hash-slice rows into P partition returns; one reduce
# task per partition runs the identical emit_pairs_vectorized kernel.
# Pairs land as arrow refs (from_arrow_refs) — no extra materialize pass.
# ---------------------------------------------------------------------------


@ray.remote
def _lsh_hot_block(local_thr: int, bands: int, rows: int, nperm: int, *tables):
    """Map-side hot-bucket candidates over a GROUP of signature blocks —
    the _find_hot_buckets pigeonhole without Dataset machinery (no _part
    column, no block building): (candidate buckets, local counts)."""
    bs = []
    for t in tables:
        if t.num_rows == 0 or "minhash" not in t.column_names:
            continue
        ids, mh, _, nsh = signatures_to_numpy(t, nperm)
        mh = mh[nsh > 0]
        if len(mh):
            bs.append(H.band_buckets(mh, bands, rows).reshape(-1))
    if not bs:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    uniq, counts = np.unique(np.concatenate(bs), return_counts=True)
    big = counts >= local_thr
    return (uniq[big], counts[big])


@ray.remote
def _lsh_map_block(P: int, bands: int, rows: int, nperm: int, *tables):
    """Explode a GROUP of signature blocks into (bucket, doc) rows and split
    them into P hash slices (one return value per partition)."""
    bs, ds_ = [], []
    for t in tables:
        if t.num_rows == 0 or "minhash" not in t.column_names:
            continue
        ids, mh, _, nsh = signatures_to_numpy(t, nperm)
        keep = nsh > 0
        ids, mh = ids[keep], mh[keep]
        if len(ids) == 0:
            continue
        bs.append(H.band_buckets(mh, bands, rows).reshape(-1))
        ds_.append(np.repeat(ids, bands))
    if not bs:
        e = np.empty(0, np.int64)
        out = tuple((e, e) for _ in range(P))
        return out if P > 1 else out[0]
    b = np.concatenate(bs)
    d = np.concatenate(ds_).astype(np.int64)
    part = (b & np.int64(P - 1)).astype(np.int32)
    po = np.argsort(part, kind="stable")
    b, d, part = b[po], d[po], part[po]
    offs = np.searchsorted(part, np.arange(P + 1))
    out = tuple(
        (b[offs[i] : offs[i + 1]], d[offs[i] : offs[i + 1]]) for i in range(P)
    )
    return out if P > 1 else out[0]


@ray.remote
def _lsh_pair_part(max_bucket_size: int, window: int, *slices):
    """Reduce one hash partition: all (a < b) candidate pairs via the same
    emit_pairs_vectorized kernel the Dataset path uses."""
    bs = [s[0] for s in slices if len(s[0])]
    if not bs:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
        )
    b = np.concatenate(bs)
    d = np.concatenate([s[1] for s in slices if len(s[0])])
    a_arr, b_arr = emit_pairs_vectorized(b, d, max_bucket_size, window)
    if len(a_arr):
        # partition-local distinct (the _emit_group discipline): near-dup
        # docs share most bands, so the same pair re-emits per band landing
        # in this partition — one lexsort here shrinks the verify exchange
        o = np.lexsort((b_arr, a_arr))
        a_arr, b_arr = a_arr[o], b_arr[o]
        keep = np.empty(len(a_arr), dtype=bool)
        keep[0] = True
        keep[1:] = (a_arr[1:] != a_arr[:-1]) | (b_arr[1:] != b_arr[:-1])
        a_arr, b_arr = a_arr[keep], b_arr[keep]
    return pa.table(
        {
            "a": pa.array(a_arr, type=pa.int64()),
            "b": pa.array(b_arr, type=pa.int64()),
        }
    )


def lsh_raw_pairs_manual(
    signatures_ds, cfg: DedupConfig = DEFAULT_CONFIG, num_partitions: int | None = None
):
    """Manual-exchange twin of ``lsh_raw_pairs`` (identical DISTINCT pair
    set — equality-gated in tests/test_lsh_manual.py). Falls back to the
    Dataset path when hot buckets need salting (rare mega-bucket case — the
    salting + chain-link machinery stays on the proven path) or when the
    input's block count makes B×P slice bookkeeping the bottleneck."""
    from imagededupx_ray.stages.dedup import MANUAL_SHUFFLE_MAX_BLOCKS
    from imagededupx_ray.util import block_group_size

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    blocks = signatures_ds.to_arrow_refs()
    if len(blocks) > MANUAL_SHUFFLE_MAX_BLOCKS:
        return lsh_raw_pairs(signatures_ds, cfg, num_partitions).materialize()
    import ray.data as rd

    group = max(block_group_size(len(blocks)), 2)
    n_groups = max(1, -(-len(blocks) // group))
    if cfg.salt_threshold is not None:
        # task-based hot scan (the _find_hot_buckets pigeonhole over the
        # same fanout groups the map pass uses — a hot bucket must trip the
        # local threshold in at least one group)
        local_thr = max(2, cfg.salt_threshold // max(1, 2 * n_groups))
        cands = ray.get(
            [
                _lsh_hot_block.remote(
                    local_thr, cfg.lsh_bands, cfg.lsh_rows, cfg.num_perms,
                    *blocks[i : i + group],
                )
                for i in range(0, len(blocks), group)
            ]
        )
        ks = [c[0] for c in cands if len(c[0])]
        if ks:
            k = np.concatenate(ks)
            v = np.concatenate([c[1] for c in cands if len(c[0])])
            o = np.argsort(k)
            k, v = k[o], v[o]
            first = np.ones(len(k), dtype=bool)
            first[1:] = k[1:] != k[:-1]
            totals = np.add.reduceat(v, np.flatnonzero(first))
            if (totals > cfg.salt_threshold).any():
                return lsh_raw_pairs(signatures_ds, cfg, num_partitions).materialize()
    per_block = [
        _lsh_map_block.options(num_returns=p if p > 1 else 1).remote(
            p, cfg.lsh_bands, cfg.lsh_rows, cfg.num_perms, *blocks[i : i + group]
        )
        for i in range(0, len(blocks), group)
    ]
    if p == 1:
        parts = [_lsh_pair_part.remote(cfg.max_bucket_size, cfg.bucket_window, *per_block)]
    else:
        parts = [
            _lsh_pair_part.remote(cfg.max_bucket_size, cfg.bucket_window, *col)
            for col in zip(*per_block)
        ]
    return rd.from_arrow_refs(parts)
