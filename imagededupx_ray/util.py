"""Small runtime helpers shared by the stages.

``suggest_num_partitions`` sizes hash-shuffle (join) partition counts to the
cluster actually present. Ray 2.49's ``Dataset.join`` spawns one aggregator
actor per partition (hash_shuffle.py AggregatorPool); requesting more
partitions than the cluster can host actors for deadlocks the streaming
executor on small clusters (observed: num_partitions=32 on a 4-CPU local
cluster hangs forever). On a real multi-node cluster the same call returns
the full CPU count, so wide joins still fan out.
"""

from __future__ import annotations

import ray


def cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 0)) or 4
    except Exception:
        return 4


def suggest_num_partitions(cap: int | None = None, per_cpu: int = 1) -> int:
    """Join/shuffle partition count: ~one per CPU, at least 2, at most ``cap``."""
    n = max(2, cluster_cpus() * per_cpu)
    if cap is not None:
        n = min(n, cap)
    return n


def clamp_actor_pool(requested: int | tuple[int, int]) -> int | tuple[int, int]:
    """Clamp an actor-pool ``concurrency`` so the pool's actors (1 CPU each)
    never reserve the whole cluster: a pool that holds every CPU starves the
    task-based operators feeding it and deadlocks the streaming executor
    (observed with concurrency=2 on a 2-CPU cluster). Always leaves >=1 CPU."""
    limit = max(1, cluster_cpus() - 1)
    if isinstance(requested, tuple):
        lo, hi = requested
        return (max(1, min(lo, limit)), max(1, min(hi, limit)))
    return max(1, min(requested, limit))


def parallel_block_table(total: int, block: int, make_block):
    """Build a synthetic corpus table in independent [start, stop) blocks —
    fanned out over Ray tasks when a session exists (driver-side
    single-threaded encoding of test corpora otherwise dominates small
    benchmarks), serial fallback otherwise. ``make_block(start, stop) ->
    pa.Table`` must be deterministic per (start, stop) so the corpus is
    identical either way; callers keep ``block`` a multiple of their
    dup-chain period so planted-duplicate structure never crosses a block
    boundary."""
    import pyarrow as pa

    return pa.concat_tables(parallel_block_tables(total, block, make_block))


def cached_corpus(key: str, build):
    """Seed-keyed /tmp parquet cache for deterministic synthetic media
    corpora: the encode step (pure-python JPEG/PNG/GIF/WAV) otherwise
    dominates every in-band dup-mining query wall, re-paying the same
    deterministic work per bench/driver run. ``key`` must encode every
    generation parameter (builder name, n, seed, dup_every, ...); the write
    is atomic (tmp + rename) so concurrent runs race safely."""
    import os

    import pyarrow.parquet as pq

    path = f"/tmp/graft_media_cache/{key}.parquet"
    if os.path.exists(path):
        try:
            return pq.read_table(path)
        except Exception:
            pass  # truncated cache from a killed run: rebuild below
    t = build()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return t


def parallel_block_tables(total: int, block: int, make_block):
    """Like parallel_block_table but returns the per-block tables unconcatenated
    — feed to ``ray.data.from_arrow(tables)`` so each block becomes its own
    Dataset block and downstream map_batches parallelizes immediately."""
    ranges = [(s, min(s + block, total)) for s in range(0, max(total, 1), block)]
    if len(ranges) > 1:
        try:
            import ray

            if ray.is_initialized():
                fn = ray.remote(num_cpus=1)(make_block)
                return ray.get([fn.remote(s, e) for s, e in ranges])
        except Exception:
            pass
    return [make_block(s, e) for s, e in ranges]


def seg_searchsorted_right(d_key, d_val, q_key, q_val):
    """Vectorized SEGMENTED ``searchsorted(..., side='right')``: insertion
    positions of each (q_key, q_val) query into data rows sorted
    lexicographically by (d_key, d_val) — a per-key-segment searchsorted
    answered for ALL keys in one pass, no per-key Python.

    Merge-rank trick: lexsort data and queries together with queries AFTER
    equal data rows (stable sort, query flag last tie-break); a query's
    combined position minus its rank among queries IS its insertion point.
    Requires queries sorted by (q_key, q_val) — callers take them from the
    already-sorted data."""
    import numpy as np

    nd, nq = len(d_key), len(q_key)
    if nq == 0:
        return np.empty(0, dtype=np.int64)
    keys = np.concatenate([d_key, q_key])
    vals = np.concatenate([d_val, q_val])
    flag = np.concatenate([np.zeros(nd, dtype=np.int8), np.ones(nq, dtype=np.int8)])
    order = np.lexsort((flag, vals, keys))
    combined_pos = np.flatnonzero(flag[order] == 1)
    return combined_pos - np.arange(nq, dtype=np.int64)
