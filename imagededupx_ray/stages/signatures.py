"""Signature stage: stateful actor pool computing MinHash + SimHash per doc
(SURVEY.md §7.2 step 3, §2.3 A1/A2).

Reference analogue: the deep-encoder actor stages (model held per process,
/root/reference/similarities/similarities/clip_module.py:223-317 hand-rolled
spawn-per-device pool with queues) and the SimHash fingerprint
(/root/reference/similarities/similarities/literal_similarity.py:88-117).
Ray Data's actor-pool ``map_batches`` replaces the queue plumbing: the
permutation table and token-hash cache are built ONCE per actor in
``__init__``; each ``__call__`` is a fully vectorized batch kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions.text import tokenize_batch


class SignatureStage:
    """Callable class for ``map_batches(SignatureStage, fn_constructor_kwargs=...,
    concurrency=N)``: holds the 128 (a_i, b_i) permutation constants and a
    bounded token-hash cache across batches."""

    def __init__(self, cfg: DedupConfig = DEFAULT_CONFIG, cache_limit: int = 2_000_000):
        self.cfg = cfg
        self.salts = H.make_permutations(cfg.num_perms, cfg.perm_seed)
        self.token_cache: dict = {}
        self.cache_limit = cache_limit

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.token_cache) > self.cache_limit:
            self.token_cache.clear()
        cfg = self.cfg
        flat, offsets = tokenize_batch(batch["text"])
        token_h = H.token_hash_flat(flat, unique_cache=self.token_cache)
        shingles, counts = H.shingle_hashes(token_h, offsets, cfg.shingle_k)
        if cfg.signer == "oph":
            mh, sv = H.oph_minhash_simhash(shingles, counts, cfg.num_perms, cfg.perm_seed)
        else:
            mh, sv = H.minhash_simhash(shingles, counts, self.salts)
        mh_col = pa.FixedSizeListArray.from_arrays(
            pa.array(mh.reshape(-1), type=pa.uint64()), cfg.num_perms
        )
        cols = {
            "doc_id": batch["doc_id"],
            "minhash": mh_col,
            "simhash": pa.array(sv, type=pa.uint64()),
            "n_shingles": pa.array(counts.astype(np.int32), type=pa.int32()),
        }
        # passthrough key for snapshot stores (signatures keyed by text)
        if "text_sha256" in batch.column_names:
            cols["text_sha256"] = batch["text_sha256"]
        return pa.table(cols)


_PROC_CACHE: dict = {}


def _signature_task(cfg: DedupConfig):
    """Task-mode batch fn with once-per-worker-process setup: the constructed
    SignatureStage (permutation table + token cache) is cached in the worker
    process keyed by config hash — actor-pool state amortization without
    actor-pool startup."""
    key = cfg.config_hash

    def fn(batch: pa.Table) -> pa.Table:
        stage = _PROC_CACHE.get(key)
        if stage is None:
            stage = _PROC_CACHE[key] = SignatureStage(cfg)
        return stage(batch)

    return fn


def signature_stage(
    docs_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 1024,
    passthrough_sha: bool = False,
):
    """docs (needs doc_id + text) → signatures Dataset.

    Default (``concurrency=None``) runs as task-based ``map_batches`` with the
    stage object cached once per worker process: measured at sf0.1, a fresh
    24-actor pool costs ~4s of actor cold-start per pipeline run while warm
    task workers finish the whole stage in ~2.5s. Pass ``concurrency`` to get
    a genuine actor pool — the right shape when the per-worker state is
    expensive (GPU hashing per the north star, model scorers: SURVEY.md §2.3
    A1/A2); ``concurrency × num_cpus=1`` is clamped below the node's CPU count
    so read/shuffle stages aren't starved (SURVEY.md §4.2 item 4).
    """
    cols = ["doc_id", "text"] + (["text_sha256"] if passthrough_sha else [])
    src = docs_ds.select_columns(cols)
    if concurrency is None:
        return src.map_batches(
            _signature_task(cfg), batch_format="pyarrow", batch_size=batch_size
        )
    from imagededupx_ray.util import clamp_actor_pool

    return src.map_batches(
        SignatureStage,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_actor_pool(concurrency),
        num_cpus=1,
    )


def signatures_to_numpy(sig_table: pa.Table, num_perms: int):
    """Zero-copy-ish view of a signatures Arrow table as numpy arrays:
    (doc_ids u64, minhash (n, num_perms) u64, simhash u64, n_shingles i32).
    Accepts the minhash column as (fixed_size_)list<uint64> (the batch
    pipeline's layout) or as fixed-width binary — either ``num_perms * 8``
    bytes of u64 or ``num_perms * 4`` bytes of u32 (the snapshot store's
    compact layout: verify compares components by 32-bit equality, so only
    the low halves persist; u32 values zero-extend back to u64 here, keeping
    every equality test identical). NEVER band-hash a u32-loaded matrix —
    bucket hashes are defined over the original u64 values (the snapshot
    pipeline bands in-memory u64 signatures before compacting)."""
    ids = sig_table["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    mh_col = sig_table["minhash"]
    if isinstance(mh_col, pa.ChunkedArray):
        mh_col = mh_col.combine_chunks()
    if pa.types.is_binary(mh_col.type) or pa.types.is_fixed_size_binary(mh_col.type):
        if pa.types.is_fixed_size_binary(mh_col.type):
            dt = np.uint32 if mh_col.type.byte_width == num_perms * 4 else np.uint64
            buf = np.frombuffer(mh_col.buffers()[1], dtype=dt)
            start = mh_col.offset * num_perms
            mh = buf[start : start + len(mh_col) * num_perms].reshape(-1, num_perms)
            if dt is np.uint32:
                mh = mh.astype(np.uint64)
        else:
            mh = np.frombuffer(b"".join(mh_col.to_pylist()), dtype=np.uint64).reshape(
                -1, num_perms
            )
    else:
        flat = mh_col.flatten()
        mh = (
            flat.to_numpy(zero_copy_only=False)
            .astype(np.uint64, copy=False)
            .reshape(-1, num_perms)
        )
    sim = sig_table["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    nsh = sig_table["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    return ids, mh, sim, nsh
