"""Exact dedup: min-doc_id winner per distinct text (SURVEY.md §2.5 G5 / §2.7).

Reference analogue: value-dedup on corpus insert — an O(n) scan per doc
(/root/reference/similarities/similarities/literal_similarity.py:62-77,
repeated in every operator) and ``list(set(corpus))`` before mining
(/root/reference/similarities/similarities/examples/text_duplicates_demo.py:24).
The reference keeps first-inserted; ours keeps min(doc_id) = min(hash64(url))
— deterministic under any parallelism (SURVEY.md §4.2 item 6).

Implementation (scale notes): the doc rows themselves NEVER shuffle. The
groupby runs over the narrow (text_sha256, doc_id) projection only (a few
bytes/row); groups with >= 2 members — the duplicated minority of a web
corpus — are broadcast once (``ray.put``) and winners are selected by a
stateless filter over the original docs. An earlier version shuffled the
full docs table (text included) through a coarse-partition groupby: ~20 s at
600k docs where this version spends ~4 s. At extreme dup rates the broadcast
is replaced by a hash join on text_sha256 (same dataflow as
verify_pairs_join); the crossover is when the dup-group table stops fitting
a worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray



def exact_dedup(docs_ds, num_partitions: int | None = None, return_extras: bool = False):
    """docs → (docs_unique, dup_map) [+ (docs_materialized, dup_ref) when
    ``return_extras``].

    docs_unique: one row per distinct text (the min-doc_id winner) with its
    full doc columns plus ``n_exact_dups``.
    dup_map: (doc_id, url, text_sha256, canonical_doc_id) for every doc whose
    text is duplicated (winners included, mapping to themselves) — the only
    docs exact-dup clustering needs.
    dup_ref: the broadcast {sha: (canonical_doc_id, n)} object ref, reusable
    by downstream cluster assignment without another shuffle.
    """
    docs_ds = docs_ds.materialize()  # two consumers below; extract runs once
    # winner resolution over the NARROW projection via a coarse-partition
    # groupby: the shuffle key is an int32 sha prefix (a native sort-shuffle
    # on the 64-char sha strings measured 5x slower), and only groups with
    # >= 2 members leave the partition
    p = 64

    def decorate(batch: pa.Table) -> pa.Table:
        import numpy as _np

        part = _np.fromiter(
            (int(s[:8], 16) & (p - 1) for s in batch["text_sha256"].to_pylist()),
            dtype=_np.int32,
            count=batch.num_rows,
        )
        return pa.table(
            {
                "_part": pa.array(part, type=pa.int32()),
                "text_sha256": batch["text_sha256"],
                "doc_id": batch["doc_id"],
            }
        )

    def dup_groups(df):
        g = df.groupby("text_sha256")["doc_id"].agg(["min", "size"])
        g = g[g["size"] >= 2].reset_index()
        return g.rename(columns={"min": "canonical_doc_id", "size": "n_exact_dups"})

    dup_df = (
        docs_ds.select_columns(["text_sha256", "doc_id"])
        .map_batches(decorate, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dup_groups, batch_format="pandas")
        .to_pandas()
    )
    if "text_sha256" not in dup_df.columns:  # all-unique corpus: empty result
        dup_df = dup_df.reindex(
            columns=["text_sha256", "canonical_doc_id", "n_exact_dups"]
        )
    dup_ref = ray.put(
        {
            s: (int(c), int(n))
            for s, c, n in zip(
                dup_df["text_sha256"], dup_df["canonical_doc_id"], dup_df["n_exact_dups"]
            )
        }
    )

    def keep_winners(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shas = batch["text_sha256"].to_pylist()
        keep = np.ones(len(ids), dtype=bool)
        n_dups = np.ones(len(ids), dtype=np.int64)
        for i, s in enumerate(shas):
            hit = dup.get(s)
            if hit is not None:
                keep[i] = ids[i] == hit[0]
                n_dups[i] = hit[1]
        return batch.filter(pa.array(keep)).append_column(
            "n_exact_dups", pa.array(n_dups[keep], type=pa.int64())
        )

    def dup_members(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shas = batch["text_sha256"].to_pylist()
        sel = np.zeros(len(ids), dtype=bool)
        canon = np.zeros(len(ids), dtype=np.int64)
        for i, s in enumerate(shas):
            hit = dup.get(s)
            if hit is not None:
                sel[i] = True
                canon[i] = hit[0]
        out = batch.select(["doc_id", "url", "text_sha256"]).filter(pa.array(sel))
        return out.append_column(
            "canonical_doc_id", pa.array(canon[sel], type=pa.int64())
        )

    docs_unique = docs_ds.map_batches(keep_winners, batch_format="pyarrow")
    dup_map = docs_ds.map_batches(dup_members, batch_format="pyarrow")
    if return_extras:
        return docs_unique, dup_map, docs_ds, dup_ref
    return docs_unique, dup_map
