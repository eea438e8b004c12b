"""End-to-end near-duplicate detection pipeline (SURVEY.md §3.1 "ours").

    read_parquet(pages)
      → extract (stateless map_batches)            pages → docs
      → exact dedup (groupby text_sha256)          docs → docs_unique + dup_map
      → signatures (actor pool)                    docs_unique → signatures
      → LSH banding (groupby bucket)               signatures → cand_pairs
      → verify (broadcast or join)                 cand_pairs → verified_pairs
      → union-find                                 verified_pairs → clusters

Replaces the reference's three-stage offline pipeline
(embed → autofaiss index → batch filter,
/root/reference/similarities/similarities/faiss_bert_similarity.py:23-234)
with a streaming Dataset pipeline; every intermediate is a Dataset that can be
checkpointed to Parquet (state/ module) instead of pickle+npy sidecars.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import ray.data

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG
from imagededupx_ray.stages.cluster import (
    assign_clusters_via_canonical,
    cluster_edges,
    dsu_components,
)
from imagededupx_ray.stages.dedup import exact_dedup
from imagededupx_ray.stages.extract import extract_stage
from imagededupx_ray.stages.lsh import (
    lsh_candidate_pairs_from_raw,
    lsh_raw_pairs,
    lsh_raw_pairs_manual,
)
from imagededupx_ray.stages.signatures import signature_stage
from imagededupx_ray.stages.verify import (
    verify_pairs_broadcast_fused,
    verify_pairs_join,
)


@dataclass
class DedupResult:
    docs_unique: Any
    dup_map: Any
    signatures: Any
    cand_pairs: Any
    verified_pairs: Any
    clusters: Any
    root_map: dict[int, int] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)


# auto crossover: beyond this many verified pairs the driver DictDSU's
# python-dict unions stop being "pair-bounded small" (~100 bytes/entry and
# single-threaded); the distributed large/small-star rounds take over
LABEL_PROP_PAIR_THRESHOLD = 20_000_000

# beyond this many DISTINCT pair-member ids the verify broadcast itself
# (ids + their signatures, ~0.5 KB/id) stops being "small side" territory
# and the hash-partitioned join verify takes over automatically
VERIFY_JOIN_ID_THRESHOLD = 32_000_000

# per-block unique pair-id arrays merge through a fanout-bounded task tree —
# the driver receives ONE already-deduped array (bounded by distinct pair
# members), never the sum of per-block arrays (multi-GB at high dup rates)
_UNIQ_TREE_FANOUT = 16


# module scope, NOT closures inside run_dedup: a closure-defined @ray.remote
# re-exports its pickled function to every worker on every pipeline run —
# measured as most of the 0.7s verify_pair_ids wall at 32 procs (bench
# warmup can also pre-spin module-level functions, never per-run closures)
@ray.remote
def _block_uniq(*tables):
    """Unique pair-member ids over a GROUP of pair blocks (one task per
    fanout-sized group, not per block — per-task dispatch latency was the
    whole verify_pair_ids wall at 32 procs where the pair exchange emits
    hundreds of small blocks)."""
    import numpy as _np

    cols = [
        t[c].to_numpy(zero_copy_only=False).astype(_np.int64)
        for t in tables
        if t.num_rows and "a" in t.column_names  # empty blocks keep no schema
        for c in ("a", "b")
    ]
    if not cols:
        return _np.empty(0, _np.int64)
    return _np.unique(_np.concatenate(cols))


@ray.remote
def _merge_uniq(*arrs):
    import numpy as _np

    arrs = [a for a in arrs if len(a)]
    if not arrs:
        return _np.empty(0, _np.int64)
    if len(arrs) == 1:
        return arrs[0]
    return _np.unique(_np.concatenate(arrs))

# beyond this many verified pairs the final {member -> root} map (up to
# 2 pairs' worth of entries) stops fitting a driver dict + broadcast array;
# assignment flips to the star-edge Dataset hash-join path
ASSIGN_JOIN_PAIR_THRESHOLD = 50_000_000


def run_dedup(
    pages_ds: "ray.data.Dataset",
    cfg: DedupConfig = DEFAULT_CONFIG,
    signature_concurrency: int | tuple[int, int] | None = None,
    verify_strategy: str = "broadcast",
    exact_strategy: str = "auto",
    cluster_strategy: str = "auto",
    label_prop_threshold: int = LABEL_PROP_PAIR_THRESHOLD,
    assign_join_threshold: int = ASSIGN_JOIN_PAIR_THRESHOLD,
) -> DedupResult:
    """Run the full pipeline. Returns all intermediate Datasets plus the final
    clusters Dataset (one row per input doc: doc_id, url, cluster_id,
    is_canonical; canonical = min doc_id per component).

    ``cluster_strategy``: "dsu" (driver union-find), "label_prop"
    (distributed alternating-star rounds — the 10^12-pair path), or "auto"
    (label_prop once the verified pair count exceeds
    ``label_prop_threshold``; both produce identical components —
    tests/test_pipeline.py::test_run_dedup_label_prop_path_equals_dsu)."""
    import time as _time

    metrics: dict[str, Any] = {}
    t0 = _time.monotonic()
    docs = extract_stage(pages_ds)
    docs_unique, dup_map, docs_mat, dup_ref = exact_dedup(
        docs, return_extras=True, strategy=exact_strategy, metrics=metrics
    )
    metrics["extract_exact_sec"] = round(_time.monotonic() - t0, 3)
    # signatures feed two consumers (LSH + verify): materialize once so the
    # actor-pool stage doesn't run twice
    t0 = _time.monotonic()
    signatures = signature_stage(
        docs_unique, cfg, concurrency=signature_concurrency
    ).materialize()
    metrics["signatures_sec"] = round(_time.monotonic() - t0, 3)
    # RAW pairs (cross-band duplicates allowed): the distinct happens inside
    # the verify exchange, saving a whole dedup shuffle. Manual two-stage
    # task exchange (falls back to the Dataset groupby for hot-bucket
    # salting / huge block counts) — the groupby's sort machinery was the
    # LSH stage's parallelism-independent floor (VERDICT r4 #3).
    t0 = _time.monotonic()
    raw_pairs = lsh_raw_pairs_manual(signatures, cfg)
    metrics["lsh_pairs_sec"] = round(_time.monotonic() - t0, 3)
    cand_pairs = None  # derived lazily below for callers that want it
    t0 = _time.monotonic()
    if verify_strategy == "join":
        cand_pairs = lsh_candidate_pairs_from_raw(raw_pairs, cfg).materialize()
        verified = verify_pairs_join(cand_pairs, signatures, cfg)
    else:
        # the verify broadcast only needs pair members' signatures — a small
        # fraction of the corpus (an experiment broadcasting ALL signatures
        # instead measured verify 4.6s vs 1.2s at 1.2M pages: the serial
        # assemble + per-worker fetch of the 40x-larger object dwarfs this
        # collection). Per-block uniques run as plain ray tasks over the
        # MATERIALIZED pair blocks, then merge through a fanout-bounded task
        # TREE — the driver receives one already-deduped id array (bounded by
        # distinct pair members), never the per-block sum. (_block_uniq /
        # _merge_uniq live at module scope so their one-time export cost sits
        # in warmup, not in every timed pipeline run.)
        import numpy as _np

        from imagededupx_ray.util import block_group_size

        raw_refs = raw_pairs.to_arrow_refs()
        _g = max(block_group_size(len(raw_refs)), 2)
        refs = [
            _block_uniq.remote(*raw_refs[i : i + _g])
            for i in range(0, len(raw_refs), _g)
        ]
        while len(refs) > 1:
            refs = [
                _merge_uniq.remote(*refs[i : i + _UNIQ_TREE_FANOUT])
                for i in range(0, len(refs), _UNIQ_TREE_FANOUT)
            ]
        pair_ids = ray.get(refs[0]) if refs else _np.empty(0, _np.int64)
        metrics["verify_pair_ids_sec"] = round(_time.monotonic() - t0, 3)
        if len(pair_ids) > VERIFY_JOIN_ID_THRESHOLD:
            # broadcast side no longer small: flip to the hash-partitioned
            # join verify (same output — equality-tested in tests)
            cand_pairs = lsh_candidate_pairs_from_raw(raw_pairs, cfg).materialize()
            verified = verify_pairs_join(cand_pairs, signatures, cfg)
        else:
            verified = verify_pairs_broadcast_fused(
                raw_pairs, signatures, cfg, pair_ids=pair_ids
            )
    verified = verified.materialize()
    metrics["verify_sec"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    if cand_pairs is None:
        cand_pairs = lsh_candidate_pairs_from_raw(raw_pairs, cfg)
    n_pairs = verified.count()  # metadata read — verified is materialized

    def components(edges_ds):
        if cluster_strategy == "label_prop" or (
            cluster_strategy == "auto" and n_pairs > label_prop_threshold
        ):
            from imagededupx_ray.stages.cluster import label_prop_components

            return label_prop_components(edges_ds)
        return dsu_components(edges_ds)

    if dup_ref is not None:
        # union-find over verified near-dup pairs ONLY; exact-dup members fold
        # through the sha→canonical broadcast at assignment time, so no
        # member→canonical edge list is ever materialized
        if (
            cluster_strategy in ("auto", "label_prop")
            and n_pairs > assign_join_threshold
        ):
            # member count can reach 2x pairs: the root map no longer fits a
            # driver dict/broadcast — star edges stay a Dataset and hash-join
            # against docs (identical output, tested on fixtures)
            from imagededupx_ray.stages.cluster import (
                assign_clusters_via_canonical_join,
                label_prop_components_ds,
            )

            roots_ds = label_prop_components_ds(verified.select_columns(["a", "b"]))
            metrics["cluster_components_sec"] = round(_time.monotonic() - t0, 3)
            root_map = {}
            clusters = assign_clusters_via_canonical_join(docs_mat, dup_ref, roots_ds)
        else:
            root_map = components(verified.select_columns(["a", "b"]))
            metrics["cluster_components_sec"] = round(_time.monotonic() - t0, 3)
            clusters = assign_clusters_via_canonical(docs_mat, dup_ref, root_map)
    else:
        # join-strategy exact dedup (extreme dup rates): no broadcast dup map
        # exists, so exact-dup member→canonical links enter the edge list and
        # assignment runs over docs_unique ∪ dup members
        from imagededupx_ray.stages.cluster import assign_clusters

        dup_map = dup_map.materialize()
        root_map = components(cluster_edges(verified, dup_map))
        clusters = assign_clusters(docs_unique, dup_map, root_map)
    metrics["cluster_sec"] = round(_time.monotonic() - t0, 3)
    return DedupResult(
        docs_unique=docs_unique,
        dup_map=dup_map,
        signatures=signatures,
        cand_pairs=cand_pairs,
        verified_pairs=verified,
        clusters=clusters,
        root_map=root_map,
        metrics=metrics,
    )
