"""Hamming-ball LSH over 64-bit codes (SimHash / pHash tiers): band the code
into ``hamming_max + 1`` bit blocks — a pair within hamming distance h
differs in at most h blocks, so BY PIGEONHOLE at least one block matches
exactly and the pair shares that band's bucket. Banding → bucket groupby →
popcount verify replaces the O(n²) pair grid (the declared 10^12-doc path
for the SimHash dedup tier; reference hamming similarity
/root/reference/similarities/similarities/literal_similarity.py:119-125).

Same execution shape as the MinHash LSH shuffle (stages/lsh.py): coarse
power-of-two partition keys, fully vectorized per-partition pair emission,
pair-distinct fused into one exchange, verify via a pair-member-restricted
broadcast of the (tiny, 8 bytes/doc) code column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.functions import hashing as H
from imagededupx_ray.stages.lsh import _pow2, emit_pairs_vectorized
from imagededupx_ray.util import suggest_num_partitions


def band_layout(hamming_max: int, bits: int = 64) -> list[tuple[int, int]]:
    """(shift, width) per band; bands = hamming_max + 1 blocks covering all
    ``bits`` (first ``bits % bands`` bands one bit wider)."""
    bands = hamming_max + 1
    base, extra = divmod(bits, bands)
    out = []
    shift = 0
    for i in range(bands):
        w = base + (1 if i < extra else 0)
        out.append((shift, w))
        shift += w
    return out


def hamming_band_pairs(
    codes_ds,
    id_col: str,
    code_col: str,
    hamming_max: int,
    num_partitions: int | None = None,
    max_bucket_size: int = 4096,
    bucket_window: int = 16,
):
    """(id, code) rows → all pairs with popcount(code_a ^ code_b) <=
    hamming_max, as (a, b, hamming). Exact vs brute force whenever no bucket
    overflows ``max_bucket_size`` (overflowing buckets fall back to
    window-capped emission — connectivity-preserving, recall-capped — the
    same skew valve as the MinHash shuffle)."""
    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    layout = band_layout(hamming_max)
    n_bands = len(layout)
    # this operator consumes codes_ds TWICE (band explode + the
    # pair-member code broadcast below); pin the (id, 8-byte code) rows so
    # an expensive upstream (e.g. the image decode actor pool) never
    # re-executes for the second pass
    codes_ds = codes_ds.materialize()

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = t[code_col].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "_part": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        bucket_cols = []
        for bi, (shift, width) in enumerate(layout):
            val = (codes >> np.uint64(shift)) & np.uint64((1 << width) - 1)
            # mix the band index in so equal values in different bands never
            # collide into one bucket
            salt = np.uint64(((bi + 1) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
            bucket_cols.append(
                H.splitmix64(val ^ salt).astype(np.int64) & np.int64((1 << 63) - 1)
            )
        buckets = np.stack(bucket_cols, axis=1).reshape(-1)
        return pa.table(
            {
                "_part": pa.array(
                    (buckets & np.int64(p - 1)).astype(np.int32), type=pa.int32()
                ),
                "bucket": pa.array(buckets, type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, n_bands), type=pa.int64()),
            }
        )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        a, b = emit_pairs_vectorized(
            df["bucket"].to_numpy(),
            df["doc_id"].to_numpy(),
            max_bucket_size,
            bucket_window,
        )
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            keep = np.empty(len(a), dtype=bool)
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        return pd.DataFrame({"a": a, "b": b})

    raw = (
        codes_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )

    # pair-member-restricted code broadcast (8 bytes/doc)
    ids_l = []
    for b in raw.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ids_l.append(b["a"].to_numpy(zero_copy_only=False).astype(np.int64))
        ids_l.append(b["b"].to_numpy(zero_copy_only=False).astype(np.int64))
    members = np.unique(np.concatenate(ids_l)) if ids_l else np.empty(0, np.int64)
    members_ref = ray.put(members)

    def member_codes(t: pa.Table) -> pa.Table:
        want = ray.get(members_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(want) == 0:
            keep = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.searchsorted(want, ids)
            pos[pos >= len(want)] = 0
            keep = want[pos] == ids
        return pa.table(
            {
                "id": pa.array(ids[keep], type=pa.int64()),
                "code": t[code_col].filter(pa.array(keep)),
            }
        )

    parts = []
    for b in codes_ds.map_batches(member_codes, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        parts.append(
            (
                b["id"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["code"].to_numpy(zero_copy_only=False).view(np.uint64),
            )
        )
    mids = np.concatenate([x[0] for x in parts]) if parts else np.empty(0, np.int64)
    mcodes = np.concatenate([x[1] for x in parts]) if parts else np.empty(0, np.uint64)
    order = np.argsort(mids)
    code_ref = ray.put((mids[order], mcodes[order]))
    hmax = hamming_max

    def verify(t: pa.Table) -> pa.Table:
        k, c = ray.get(code_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) == 0 or len(a) == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        ia = np.searchsorted(k, a)
        ib = np.searchsorted(k, b)
        ia[ia >= len(k)] = 0
        ib[ib >= len(k)] = 0
        ok = (k[ia] == a) & (k[ib] == b)
        a, b, ia, ib = a[ok], b[ok], ia[ok], ib[ok]
        ham = H.popcount64(c[ia] ^ c[ib]).astype(np.int64)
        keep = ham <= hmax
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "hamming": pa.array(ham[keep], type=pa.int64()),
            }
        )

    verified = raw.map_batches(verify, batch_format="pyarrow", batch_size=1 << 16)

    # global distinct: the same pair can reach verify through different
    # bands' buckets in different partitions — one coarse pair-hash groupby
    # (the verified set is already threshold-filtered and small)
    from imagededupx_ray.stages.lsh import decorate_pair_part

    def decorate_keep(t: pa.Table) -> pa.Table:
        d = decorate_pair_part(p)(t.select(["a", "b"]))
        return d.append_column("hamming", t["hamming"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"]).drop(columns=["_part"])

    return (
        verified.map_batches(decorate_keep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dedup, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
