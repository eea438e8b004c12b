"""Graph-ANN (HNSW-style) tier over an embedding column (SURVEY.md §2.3 A4
— the reference's Hnswlib/Annoy role, /root/reference/similarities/
similarities/fast_bert_similarity.py:40-58,157-181, rebuilt dependency-free
on numpy; algorithm per the public HNSW paper, Malkov & Yashunin 2016).

Two pieces:

- ``HNSWGraph``: a single-shard hierarchical navigable-small-world graph in
  plain numpy — geometric level sampling, greedy descent through the upper
  layers, ef-bounded best-first search at each build/query layer, bidirectional
  links pruned to M (2M at layer 0). Cosine similarity on unit vectors (dot).
  Deterministic: node levels derive from ``splitmix64(vec_id)``, and shard
  builds insert in vec_id order, so the same rows give the same graph at any
  parallelism.

- ``hnsw_topk``: the Ray-Data-first scale path — vectors hash-partition into
  shards (ONE coarse shuffle), each shard builds its own graph inside
  ``map_groups`` and answers every query locally (the broadcast query matrix
  ships once via ``ray.put``), and a tiny global reduce merges per-shard
  top-k. This is exactly how a multi-node graph-ANN deployment shards: each
  node owns a graph over its slice; queries fan out and merge. Per-query work
  is O(shards · ef · log n_shard) instead of a corpus scan, and no single
  process ever holds more than one shard's vectors.

The recall gate (tests/test_ann.py) compares against ``brute_force_topk`` on
the same table; approximate by design, so the driver query is rows-only.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.stages.ann import _emb_matrix, _norm_rows


def _node_level(vec_id: int, m_l: float) -> int:
    """Deterministic geometric level: uniform from splitmix64(vec_id)."""
    from imagededupx_ray.functions.hashing import splitmix64

    h = int(splitmix64(np.uint64(vec_id & 0xFFFFFFFFFFFFFFFF)))
    u = (h >> 11) / float(1 << 53)  # (0,1) with 53-bit mantissa
    u = max(u, 2.0**-53)
    return int(-np.log(u) * m_l)


class HNSWGraph:
    """In-memory HNSW over unit vectors; cosine == dot. Insert order and
    levels are deterministic given (vec_ids, vectors)."""

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 100):
        self.M = M
        self.M0 = 2 * M
        self.ef_c = ef_construction
        self.m_l = 1.0 / np.log(M)
        self.dim = dim
        self.V = np.empty((0, dim), dtype=np.float64)
        self.ids = np.empty(0, dtype=np.int64)
        self.levels: list[int] = []
        # adjacency: per layer, list of int lists indexed by node position
        self.links: list[list[list[int]]] = []
        self.entry: int = -1

    # -- core best-first search at one layer ------------------------------
    def _search_layer(self, q: np.ndarray, entry: int, ef: int, layer: int):
        """Returns up to ef (sim, node) pairs, best-first, as two arrays."""
        visited = {entry}
        e_sim = float(self.V[entry] @ q)
        cand = [(-e_sim, entry)]  # max-heap by sim
        best: list[tuple[float, int]] = [(e_sim, entry)]  # min-heap of results
        adj = self.links[layer]
        V = self.V
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < best[0][0] and len(best) >= ef:
                break
            nbrs = [n for n in adj[c] if n not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            ns = V[nbrs] @ q
            for n, s in zip(nbrs, ns.tolist()):
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, n))
                    heapq.heappush(best, (s, n))
                    if len(best) > ef:
                        heapq.heappop(best)
        return best  # min-heap list of (sim, node)

    def _greedy(self, q: np.ndarray, entry: int, layer: int) -> int:
        cur = entry
        cur_sim = float(self.V[cur] @ q)
        adj = self.links[layer]
        V = self.V
        improved = True
        while improved:
            improved = False
            nbrs = adj[cur]
            if nbrs:
                ns = V[nbrs] @ q
                j = int(np.argmax(ns))
                if ns[j] > cur_sim:
                    cur, cur_sim = nbrs[j], float(ns[j])
                    improved = True
        return cur

    def _shrink(self, node: int, layer: int, cap: int):
        nbrs = self.links[layer][node]
        if len(nbrs) <= cap:
            return
        sims = self.V[nbrs] @ self.V[node]
        keep = np.argsort(sims)[::-1][:cap]
        self.links[layer][node] = [nbrs[i] for i in sorted(keep.tolist())]

    def add_batch(self, vec_ids: np.ndarray, vecs: np.ndarray):
        """Insert rows in the given order (callers sort by vec_id for
        determinism)."""
        vecs = _norm_rows(np.asarray(vecs, dtype=np.float64))
        start = len(self.ids)
        self.V = np.vstack([self.V, vecs]) if start else vecs.copy()
        self.ids = np.concatenate([self.ids, vec_ids.astype(np.int64)])
        for i in range(len(vec_ids)):
            self._insert(start + i)

    def _insert(self, pos: int):
        lvl = _node_level(int(self.ids[pos]), self.m_l)
        self.levels.append(lvl)
        while len(self.links) <= lvl:
            self.links.append([[] for _ in range(pos)])
        for layer in range(len(self.links)):
            self.links[layer].append([])
        if self.entry < 0:
            self.entry = pos
            return
        q = self.V[pos]
        top = len(self.links) - 1
        cur = self.entry
        for layer in range(top, lvl, -1):
            if layer < len(self.links) and self.links[layer]:
                cur = self._greedy(q, cur, layer)
        for layer in range(min(lvl, top), -1, -1):
            best = self._search_layer(q, cur, self.ef_c, layer)
            cap = self.M0 if layer == 0 else self.M
            chosen = sorted(best, reverse=True)[: self.M]
            self.links[layer][pos] = [n for _, n in chosen]
            for _, n in chosen:
                self.links[layer][n].append(pos)
                self._shrink(n, layer, cap)
            cur = chosen[0][1] if chosen else cur
        if lvl > self.levels[self.entry]:
            self.entry = pos

    def search(self, q: np.ndarray, k: int = 10, ef: int = 64):
        """Top-k (neighbor vec_id, cosine) for one unit query vector."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        q = np.asarray(q, dtype=np.float64)
        cur = self.entry
        for layer in range(len(self.links) - 1, 0, -1):
            cur = self._greedy(q, cur, layer)
        best = self._search_layer(q, cur, max(ef, k), 0)
        best = sorted(best, reverse=True)[:k]
        idx = np.array([n for _, n in best], dtype=np.int64)
        sims = np.array([s for s, _ in best], dtype=np.float64)
        return self.ids[idx], sims


def hnsw_topk(
    emb_ds,
    Q: np.ndarray,
    q_ids: np.ndarray,
    k: int = 10,
    M: int = 16,
    ef_construction: int = 100,
    ef_search: int = 64,
    num_shards: int | None = None,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Sharded HNSW top-k: hash-partition vectors, build one graph per shard
    in ``map_groups``, answer every query per shard, merge partial top-k.
    Returns (query_id, neighbor_id, cosine) sorted by (query_id, -cosine,
    neighbor_id)."""
    from imagededupx_ray.functions.hashing import splitmix64
    from imagededupx_ray.util import suggest_num_partitions

    if num_shards is None:
        num_shards = max(1, suggest_num_partitions(per_cpu=1) // 2)
    Qn = _norm_rows(np.asarray(Q, dtype=np.float64))
    state = ray.put((q_ids.astype(np.int64), Qn))

    def part(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pp = (splitmix64(ids.view(np.uint64)) % np.uint64(num_shards)).astype(
            np.int32
        )
        return pa.table(
            {"_part": pa.array(pp, type=pa.int32()), "vec_id": batch["vec_id"],
             "embedding": batch["embedding"]}
        )

    def build_and_search(t: pa.Table) -> pa.Table:
        ids_q, Qm = ray.get(state)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Mx = _norm_rows(_emb_matrix(t))
        order = np.argsort(ids)
        ids, Mx = ids[order], Mx[order]
        g = HNSWGraph(Mx.shape[1], M=M, ef_construction=ef_construction)
        g.add_batch(ids, Mx)
        oq, on, os_ = [], [], []
        for qi in range(len(ids_q)):
            nid, sim = g.search(Qm[qi], k=k + (1 if exclude_self else 0), ef=ef_search)
            if exclude_self:
                keep = nid != ids_q[qi]
                nid, sim = nid[keep][:k], sim[keep][:k]
            oq.append(np.full(len(nid), ids_q[qi], dtype=np.int64))
            on.append(nid)
            os_.append(sim)
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(oq) if oq else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
                "neighbor_id": pa.array(
                    np.concatenate(on) if on else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
                "cosine": pa.array(
                    np.concatenate(os_) if os_ else np.empty(0, np.float64),
                    type=pa.float64(),
                ),
            }
        )

    parts = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(build_and_search, batch_format="pyarrow")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        parts.sort_values(
            ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
