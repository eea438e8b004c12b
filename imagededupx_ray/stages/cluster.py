"""Union-find connected-component clustering over verified pairs
(SURVEY.md §2.5 G2).

Replaces the reference's ``community_detection`` threshold clustering
(/root/reference/similarities/similarities/utils/util.py:237-305) with exact
connected components; canonical doc = min(doc_id) per component — a
deterministic tie-break where the reference depends on insertion order.

Two implementations with identical output (tested against each other):

- ``dsu_components``: stream pair batches to the driver, numpy-backed DSU with
  path halving. Right when the pair set fits the driver (pairs are 16 bytes;
  hundreds of millions are fine). Pairs, not docs, bound the memory: the vast
  unique majority of a web corpus never appears here.
- ``label_prop_components``: fully distributed alternating large-star /
  small-star rounds (the MapReduce connected-components algorithm of
  Kiveris et al., "Connected Components in MapReduce and Beyond" — public
  literature), each round a groupby shuffle; converges in O(log n) rounds.
  The 10^12-doc path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- driver DSU
class DictDSU:
    """Union-find over python-int ids; min-id root wins (deterministic
    canonical tie-break). Path halving keeps finds near O(1) amortized."""

    __slots__ = ("p",)

    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.p
        r = p.get(x)
        if r is None:
            p[x] = x
            return x
        while r != x:
            p[x] = p.get(r, r)
            x = p[x]
            r = p.get(x, x)
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.p[rb] = ra
            else:
                self.p[ra] = rb

    def union_arrays(self, a: np.ndarray, b: np.ndarray) -> None:
        for x, y in zip(a.tolist(), b.tolist()):
            self.union(x, y)

    def root_map(self) -> dict[int, int]:
        return {i: r for i in list(self.p) if (r := self.find(i)) != i}


def dsu_components(edges_ds) -> dict[int, int]:
    """Stream (a, b) edge batches to a driver DSU; returns {doc_id -> root}
    for non-root members only (roots/singletons map to themselves implicitly).
    Edges = verified near-dup pairs PLUS exact-dup member→canonical links, so
    components span exact members and cluster_id = min(doc_id) holds globally."""
    dsu = DictDSU()
    for batch in edges_ds.select_columns(["a", "b"]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsu.union_arrays(a, b)
    return dsu.root_map()


# ------------------------------------------------- distributed star rounds
def _dedup_edges(ds):
    from ray.data.aggregate import Count

    return (
        ds.groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def _min_neighbor(ds, num_partitions: int):
    """(u, mv): native Min aggregate over the narrow edge list, joined back —
    no per-group Python anywhere (each group would otherwise be a Python call;
    components have millions of nodes at scale)."""
    from ray.data.aggregate import Min

    mins = ds.groupby("u").aggregate(Min("v", alias_name="mv"))
    return ds.join(mins, "inner", num_partitions, on=("u",)), mins


def label_prop_components(
    edges_ds, max_rounds: int = 25, num_partitions: int | None = None
) -> dict[int, int]:
    """Alternating large-star/small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond") built ONLY from native groupby
    aggregates, hash joins and vectorized map_batches. Returns the same
    {doc_id -> root} mapping as ``dsu_components``.

    Driver-dict collection — right while the dup-member count fits a
    driver map (pair-membership-bounded). Above ~10^8 members use
    ``label_prop_components_ds`` + ``assign_clusters_via_canonical_join``
    instead: the star edges stay a Dataset end-to-end."""
    edges = label_prop_components_ds(edges_ds, max_rounds, num_partitions)
    # final star edges: u -> root v (the result itself — pair-bounded)
    out: dict[int, int] = {}
    for batch in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for uu, vv in zip(
            batch["u"].to_numpy(zero_copy_only=False).astype(np.int64).tolist(),
            batch["v"].to_numpy(zero_copy_only=False).astype(np.int64).tolist(),
        ):
            if uu != vv:
                out[uu] = min(vv, out.get(uu, vv))
    return out


def label_prop_components_ds(
    edges_ds, max_rounds: int = 25, num_partitions: int | None = None
):
    """Distributed star rounds returning the CONVERGED star-edge Dataset
    (u = member doc_id, v = component root) — nothing component-sized ever
    lands on the driver; feed to ``assign_clusters_via_canonical_join``."""
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions()
    edges = edges_ds.select_columns(["a", "b"]).map_batches(
        lambda t: pa.table(
            {"u": t["a"].cast(pa.int64()), "v": t["b"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    prev_sig = None
    u = v = np.empty(0, dtype=np.int64)
    for _ in range(max_rounds):
        # ---- large-star: for each u, attach strictly-larger neighbors to
        # m = min(neighbors ∪ {u})
        bidir = edges.map_batches(
            lambda t: pa.table(
                {
                    "u": pa.concat_arrays(
                        [
                            t["u"].combine_chunks().cast(pa.int64()),
                            t["v"].combine_chunks().cast(pa.int64()),
                        ]
                    ),
                    "v": pa.concat_arrays(
                        [
                            t["v"].combine_chunks().cast(pa.int64()),
                            t["u"].combine_chunks().cast(pa.int64()),
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined, _ = _min_neighbor(bidir, num_partitions)

        def large_emit(t: pa.Table) -> pa.Table:
            uu = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            vv = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            mv = t["mv"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.minimum(uu, mv)
            keep = vv > uu
            return pa.table(
                {
                    "u": pa.array(vv[keep], type=pa.int64()),
                    "v": pa.array(m[keep], type=pa.int64()),
                }
            )

        edges = joined.map_batches(large_emit, batch_format="pyarrow")
        # ---- small-star: orient (max, min); for each u attach all smaller
        # neighbors (and u itself) to m = min(neighbors)
        oriented = edges.map_batches(
            lambda t: pa.table(
                {
                    "u": pa.array(
                        np.maximum(
                            t["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                            t["v"].to_numpy(zero_copy_only=False).astype(np.int64),
                        ),
                        type=pa.int64(),
                    ),
                    "v": pa.array(
                        np.minimum(
                            t["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                            t["v"].to_numpy(zero_copy_only=False).astype(np.int64),
                        ),
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined, mins = _min_neighbor(oriented, num_partitions)

        def small_emit(t: pa.Table) -> pa.Table:
            vv = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            mv = t["mv"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = vv != mv
            return pa.table(
                {
                    "u": pa.array(vv[keep], type=pa.int64()),
                    "v": pa.array(mv[keep], type=pa.int64()),
                }
            )

        self_edges = mins.map_batches(
            lambda t: pa.table(
                {"u": t["u"].cast(pa.int64()), "v": t["mv"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        edges = _dedup_edges(
            joined.map_batches(small_emit, batch_format="pyarrow").union(self_edges)
        ).materialize()
        # ---- convergence: DISTRIBUTED count + order-independent checksum —
        # a tiny per-block aggregate streams to the driver (O(blocks) rows),
        # never the edge set itself
        sig = _edge_multiset_signature(edges)
        if sig[0] == 0:
            break
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged star edges: min v per u (defensive — convergence leaves one
    # root per member), self-loops dropped
    from ray.data.aggregate import Min

    def drop_self(t: pa.Table) -> pa.Table:
        keep = t["u"].to_numpy(zero_copy_only=False) != t["v"].to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(keep))

    return (
        edges.groupby("u")
        .aggregate(Min("v", alias_name="v"))
        .map_batches(drop_self, batch_format="pyarrow")
    )


def _edge_multiset_signature(edges_ds) -> tuple:
    """(count, wrapped hash-sum) of the edge multiset, computed as a
    map-side per-block reduction — order-independent and collision-safe
    enough for a convergence test (64-bit sum of splitmix64(u ^ v<<1))."""
    from imagededupx_ray.functions.hashing import splitmix64

    def block_sig(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(u.astype(np.uint64) ^ (v.astype(np.uint64) << np.uint64(1)))
        with np.errstate(over="ignore"):
            s = int(h.sum(dtype=np.uint64))
        return pa.table(
            {
                "n": pa.array([len(u)], type=pa.int64()),
                "s": pa.array([s & ((1 << 63) - 1)], type=pa.int64()),
            }
        )

    n_total = 0
    s_total = 0
    for b in edges_ds.map_batches(block_sig, batch_format="pyarrow").iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        n_total += int(pa.compute.sum(b["n"]).as_py() or 0)
        s_total = (s_total + int(pa.compute.sum(b["s"]).as_py() or 0)) & ((1 << 63) - 1)
    return (n_total, s_total)


# -------------------------------------------------------------- assignment
def assign_clusters_via_canonical(docs_ds, dup_ref, root_map: dict[int, int]):
    """Final ``clusters`` table in ONE map over the full docs table:
    cluster(doc) = root(canonical(sha(doc))) — exact-dup members fold through
    the broadcast (sorted S64 shas, canonicals) arrays instead of a
    member→canonical edge list, so the union-find only ever sees verified
    near-dup pairs. Lookup is a vectorized searchsorted, no per-row python."""
    import ray

    from imagededupx_ray.stages.dedup import i64_pair_to_key16, sha_to_i64_pair

    keys = np.fromiter(root_map.keys(), dtype=np.int64, count=len(root_map))
    vals = np.fromiter(root_map.values(), dtype=np.int64, count=len(root_map))
    order = np.argsort(keys)
    map_ref = ray.put((keys[order], vals[order]))

    def assign(batch: pa.Table) -> pa.Table:
        k, v = ray.get(map_ref)
        d_keys, d_canon, _ = ray.get(dup_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = ids.copy()
        if len(d_keys):
            s = i64_pair_to_key16(*sha_to_i64_pair(batch["text_sha256"]))
            pos = np.searchsorted(d_keys, s)
            pos[pos >= len(d_keys)] = 0
            hit = d_keys[pos] == s
            canon[hit] = d_canon[pos[hit]]
        cl = canon.copy()
        if len(k):
            pos = np.searchsorted(k, canon)
            pos[pos >= len(k)] = 0
            hit_m = k[pos] == canon
            cl[hit_m] = v[pos[hit_m]]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": batch["url"],
                "cluster_id": pa.array(cl, type=pa.int64()),
                "is_canonical": pa.array(ids == cl),
            }
        )

    return docs_ds.map_batches(assign, batch_format="pyarrow")


def assign_clusters_via_canonical_join(
    docs_ds, dup_ref, roots_ds, num_partitions: int | None = None
):
    """Join-path final assignment — the >10^8-dup-member regime where the
    ``root_map`` driver dict + broadcast arrays of
    ``assign_clusters_via_canonical`` no longer fit: the converged star
    edges from ``label_prop_components_ds`` (u = member, v = root) stay a
    Dataset and hash-join against the docs' canonical ids; docs whose
    canonical never entered a dup relation pass through null-filled
    (cluster = canonical). Identical output to the broadcast path
    (tests/test_pipeline.py::test_assign_join_path_equals_broadcast)."""
    import ray

    from imagededupx_ray.stages.dedup import i64_pair_to_key16, sha_to_i64_pair
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions()

    def canonize(batch: pa.Table) -> pa.Table:
        d_keys, d_canon, _ = ray.get(dup_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = ids.copy()
        if len(d_keys):
            s = i64_pair_to_key16(*sha_to_i64_pair(batch["text_sha256"]))
            pos = np.searchsorted(d_keys, s)
            pos[pos >= len(d_keys)] = 0
            hit = d_keys[pos] == s
            canon[hit] = d_canon[pos[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": batch["url"],
                "canon": pa.array(canon, type=pa.int64()),
            }
        )

    canon_docs = docs_ds.map_batches(canonize, batch_format="pyarrow")
    joined = canon_docs.join(
        roots_ds, "left_outer", num_partitions, on=("canon",), right_on=("u",)
    )

    def finish(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = t["canon"].to_numpy(zero_copy_only=False).astype(np.int64)
        # -1 sentinel for "canonical never in a dup relation" (ids are >= 0)
        v = (
            pa.compute.fill_null(t["v"].cast(pa.int64()), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        root = np.where(v >= 0, v, canon)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": t["url"],
                "cluster_id": pa.array(root, type=pa.int64()),
                "is_canonical": pa.array(ids == root),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def cluster_edges(verified_pairs_ds, dup_map_ds):
    """Edge list for component finding: verified near-dup pairs ∪ exact-dup
    member→canonical links (both narrow (a, b) uint64 datasets)."""
    near = verified_pairs_ds.select_columns(["a", "b"])
    exact = dup_map_ds.map_batches(
        lambda t: pa.table(
            {
                "a": t.filter(
                    pa.compute.not_equal(t["doc_id"], t["canonical_doc_id"])
                )["doc_id"].cast(pa.int64()),
                "b": t.filter(
                    pa.compute.not_equal(t["doc_id"], t["canonical_doc_id"])
                )["canonical_doc_id"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return near.union(exact)


def assign_clusters(docs_unique_ds, dup_map_ds, root_map: dict[int, int]):
    """Final ``clusters`` table covering EVERY original doc: doc_id, url,
    cluster_id = component root (min doc_id across ALL members, exact-dup
    members included), is_canonical = (doc_id == cluster_id).

    ``root_map`` holds only docs that appear in some dup relation (small
    relative to a web corpus — the unique majority never enters it), put in
    the object store ONCE as sorted arrays; lookup is vectorized searchsorted.
    """
    import ray

    keys = np.fromiter(root_map.keys(), dtype=np.int64, count=len(root_map))
    vals = np.fromiter(root_map.values(), dtype=np.int64, count=len(root_map))
    order = np.argsort(keys)
    map_ref = ray.put((keys[order], vals[order]))

    def assign(batch: pa.Table) -> pa.Table:
        k, v = ray.get(map_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = ids.copy()
        if len(k):
            pos = np.searchsorted(k, ids)
            pos[pos >= len(k)] = 0
            hit = k[pos] == ids
            cl[hit] = v[pos[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": batch["url"],
                "cluster_id": pa.array(cl, type=pa.int64()),
                "is_canonical": pa.array(ids == cl),
            }
        )

    uniq = docs_unique_ds.select_columns(["doc_id", "url"])
    members = dup_map_ds.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["doc_id"], t["canonical_doc_id"])),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "url"])
    return uniq.union(members).map_batches(assign, batch_format="pyarrow")
