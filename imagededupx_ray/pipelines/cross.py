"""Cross-corpus near-dup decontamination — drop from corpus A every doc
whose duplicate CLUSTER touches corpus B (exact, near, or transitively
connected at the pipeline's thresholds).

This is the cross-dump dedup / fuzzy eval-set decontamination step of
web-corpus builds (RefinedWeb dedups new CommonCrawl dumps against already
-kept ones; GPT-3-style decontamination generalized from 13-gram overlap
to the MinHash near-dup relation). The reference's incremental detector
diffs one growing corpus against its own cache
(improved_faiss_detector.py:269-295); this operator is the two-corpus
version: contamination = shared dup cluster, computed by ONE flagship
run_dedup over the union (exact collapse → signatures → LSH → verify →
union-find), then two bounded broadcast filters.

Scale shape: the union pipeline is the documented flagship (all exchanges
in pipelines/dedup.py). The only extra state is corpus-B's id array (one
narrow scan of B urls; decontamination reference sets are the SMALL side
by design — eval suites, already-kept dumps are processed shard-wise) and
the contaminated-member id array (dup-member-bounded). Nothing
corpus-A-sized reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.config import DEFAULT_CONFIG, DedupConfig


def _ids_of(pages_ds) -> np.ndarray:
    """hash64(url) ids of a pages Dataset (same derivation as extract)."""
    from imagededupx_ray.stages.extract import _hash64_column

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(_hash64_column(batch["url"]), dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    rows = (
        pages_ds.select_columns(["url"])
        .map_batches(fn, batch_format="pyarrow")
        .take_all()
    )
    return np.sort(np.array([r["doc_id"] for r in rows], dtype=np.int64))


def _member_mask(ds, col: str, members: np.ndarray, keep_hits: bool):
    member_ref = ray.put(members)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(member_ref)
        ids = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(m):
            hit = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.searchsorted(m, ids)
            hit = (pos < len(m)) & (m[np.minimum(pos, len(m) - 1)] == ids)
        return batch.filter(pa.array(hit if keep_hits else ~hit))

    return ds.map_batches(fn, batch_format="pyarrow")


def cross_dedup(
    pages_a,
    pages_b,
    cfg: DedupConfig = DEFAULT_CONFIG,
    dedup_result=None,
    collect_bad: list | None = None,
):
    """Returns (clean_a_ds, report): ``clean_a_ds`` is the (doc_id,
    cluster_id) rows of corpus-A docs whose cluster contains NO corpus-B
    doc; ``report`` is a dict of bounded counts. A-internal duplicate
    clusters survive untouched (cross-dedup removes only B-touching
    clusters — intra-A dedup is the tier cascade's job). Pass
    ``dedup_result`` to reuse a run_dedup over ``pages_a.union(pages_b)``.
    A url present in BOTH corpora is a B doc (and trivially
    contaminated). Pass a list as ``collect_bad`` to also receive the
    sorted contaminated A doc ids (contamination-bounded — the right side
    for a broadcast anti-filter; the CLEAN set is corpus-sized and must
    never be driver-collected)."""
    from imagededupx_ray.pipelines.dedup import run_dedup

    res = dedup_result if dedup_result is not None else run_dedup(
        pages_a.union(pages_b), cfg
    )
    b_ids = _ids_of(pages_b)

    cl = res.clusters.select_columns(["doc_id", "cluster_id"])
    # contaminated clusters: those containing a B doc (B-bounded collect)
    bad_clusters = np.unique(
        np.array(
            [
                r["cluster_id"]
                for r in _member_mask(cl, "doc_id", b_ids, keep_hits=True).take_all()
            ],
            dtype=np.int64,
        )
    )
    # members of contaminated clusters (contaminated-member-bounded)
    bad_members = np.sort(
        np.array(
            [
                r["doc_id"]
                for r in _member_mask(
                    cl, "cluster_id", bad_clusters, keep_hits=True
                ).take_all()
            ],
            dtype=np.int64,
        )
    )
    if collect_bad is not None:
        collect_bad.append(np.setdiff1d(bad_members, b_ids))
    # clean A = cluster rows minus B docs minus contaminated members
    clean = _member_mask(
        _member_mask(cl, "doc_id", b_ids, keep_hits=False),
        "doc_id",
        bad_members,
        keep_hits=False,
    )
    n_total = cl.count()
    n_b = len(b_ids)
    n_clean = clean.count()
    report = {
        "n_a": n_total - n_b,
        "n_b": n_b,
        "n_contaminated_clusters": int(len(bad_clusters)),
        "n_a_removed": (n_total - n_b) - n_clean,
        "n_a_clean": n_clean,
    }
    return clean, report
