"""Exact dedup: hash-partition on ``text_sha256``, keep the min-doc_id row per
group (SURVEY.md §2.5 G5 / §2.7).

Reference analogue: value-dedup on corpus insert — an O(n) scan per doc
(/root/reference/similarities/similarities/literal_similarity.py:62-77,
repeated in every operator) and ``list(set(corpus))`` before mining
(/root/reference/similarities/similarities/examples/text_duplicates_demo.py:24).
The reference keeps first-inserted; ours keeps min(doc_id) = min(hash64(url))
— deterministic under any parallelism (SURVEY.md §4.2 item 6).

Implementation (scale notes): one COARSE-PARTITION groupby — the key is
``sha_prefix & (P-1)`` so the shuffle is a plain sort exchange into P
partitions, and each ``map_groups`` call receives *many* sha groups at once
and resolves winners fully vectorized (pandas groupby-transform), i.e.
hash-partition + mapPartitions. P Python calls total (not one per distinct
text — a mostly-unique corpus has billions of those). No joins: Ray 2.49's
``Dataset.join`` spawns one aggregator ACTOR per partition, which both
deadlocks small clusters and costs actor startup per stage; the sort
shuffle here is task-based. Data movement is identical to the join version
(doc rows move exactly once). P must scale with data so one partition fits a
worker (docs bytes / P << worker heap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from imagededupx_ray.util import suggest_num_partitions


def _decorate(partitions: int):
    """Add the coarse partition key: first 8 hex chars of text_sha256 as int,
    masked to partitions-1 (partitions must be a power of two)."""

    def fn(batch: pa.Table) -> pa.Table:
        sha = batch["text_sha256"].to_pylist()
        part = np.array(
            [int(s[:8], 16) & (partitions - 1) for s in sha], dtype=np.int32
        )
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    return fn


def _resolve_group(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized within one coarse partition: canonical = min doc_id per sha,
    n_exact_dups = group size. All rows pass through with both annotations."""
    g = df.groupby("text_sha256")["doc_id"]
    df = df.assign(
        canonical_doc_id=g.transform("min"),
        n_exact_dups=g.transform("size").astype(np.int64),
    )
    return df.drop(columns=["_part"])


def exact_dedup(docs_ds, num_partitions: int | None = None):
    """docs → (docs_unique, dup_map).

    docs_unique: one row per distinct text (the min-doc_id winner) with its
    full doc columns plus ``n_exact_dups``.
    dup_map: (doc_id, url, text_sha256, canonical_doc_id) for EVERY doc;
    winners map to themselves.
    """
    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    # round up to power of two for the mask
    p = 1
    while p < num_partitions:
        p *= 2
    resolved = (
        docs_ds.map_batches(_decorate(p), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_resolve_group, batch_format="pandas")
        .materialize()
    )
    docs_unique = resolved.filter(
        expr="doc_id == canonical_doc_id"
    ).drop_columns(["canonical_doc_id"])
    dup_map = resolved.select_columns(
        ["doc_id", "url", "text_sha256", "canonical_doc_id"]
    )
    return docs_unique, dup_map
