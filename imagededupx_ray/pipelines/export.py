"""Deterministic training-shard export — the last stage of a training-data
pipeline: a seeded GLOBAL shuffle of the (deduplicated) corpus written as
resumable partitioned Parquet shards.

Every training run wants the same three properties this stage provides:

- **Deterministic**: shard membership and intra-shard order derive from
  ``md5(seed || text)`` — content-keyed, so the output permutation is
  byte-identical at any parallelism, any input sharding, any cluster size
  (the same argument as the dedup tiers' content-derived ids).
- **Shuffled**: md5 keys are uniform, so ordering by key IS a uniform random
  permutation per seed; consecutive output rows are decorrelated from crawl
  order / source locality (what SGD wants).
- **Resumable**: one directory per shard (``shard=K/``) via Ray's
  partitioned ``write_parquet``; a failed export re-runs only missing
  shards, and the manifest records per-shard row counts + an order-sensitive
  content checksum so a resumed run is verifiable.

Scale shape: assignment is one stateless ``map_batches`` (no exchange); the
shard grouping is Ray's partitioned parquet write (hash-partitioned file
routing, not an all-to-all sort); ONLY the intra-shard ordering sorts, and it
sorts on the (shard, key) composite so the exchange is range-partitioned by
the same key the files route on. For corpora where intra-shard order may be
applied at read time (streaming loaders shuffle their window anyway), pass
``sort_within_shards=False`` and the export is shuffle-free end to end.

Reference analogue: the offline embed pipeline's sharded part-N.parquet
output (faiss_bert_similarity.py:74-83) — ours adds the seeded global
permutation and the verifiable manifest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _shuffle_key_batch(texts, seed: str) -> list[str]:
    pre = seed.encode("utf-8")
    md5 = hashlib.md5
    return [md5(pre + t.encode("utf-8")).hexdigest() for t in texts]


def assign_shards(
    docs_ds, seed: str = "42", n_shards: int = 16, text_col: str = "text"
):
    """Attach ``shuffle_key`` (hex md5 of seed||text) and ``shard``
    (first-8-hex-digit bucket % n_shards) columns. Stateless, no exchange."""

    def assign(batch: pa.Table) -> pa.Table:
        keys = _shuffle_key_batch(batch[text_col].to_pylist(), seed)
        shard = np.array(
            [int(k[:8], 16) % n_shards for k in keys], dtype=np.int64
        )
        return batch.append_column(
            "shuffle_key", pa.array(keys, type=pa.string())
        ).append_column("shard", pa.array(shard, type=pa.int64()))

    return docs_ds.map_batches(assign, batch_format="pyarrow")


def shuffle_export(
    docs_ds,
    out_dir: str,
    seed: str = "42",
    n_shards: int = 16,
    text_col: str = "text",
    sort_within_shards: bool = True,
) -> pd.DataFrame:
    """Export a seeded deterministic global shuffle of ``docs_ds`` as
    ``out_dir/shard=K/*.parquet``; returns the per-shard manifest
    (shard, n_docs, order-sensitive sha256 checksum over doc ids)."""
    ds = assign_shards(docs_ds, seed=seed, n_shards=n_shards, text_col=text_col)
    if sort_within_shards:
        ds = ds.sort(["shard", "shuffle_key"])
    ds.write_parquet(out_dir, partition_cols=["shard"])
    return export_manifest(out_dir, n_shards)


def export_manifest(out_dir: str, n_shards: int) -> pd.DataFrame:
    """Re-read the shard directories and compute the verifiable manifest:
    per shard, row count + sha256 over the key-ordered doc_id stream. Reads
    only (doc_id, shuffle_key) columns; each shard is independent, so a
    resumed/partial export verifies shard by shard."""
    import pyarrow.dataset as pads

    rows = []
    dset = pads.dataset(out_dir, format="parquet", partitioning="hive")
    tbl = dset.to_table(columns=["doc_id", "shuffle_key", "shard"])
    df = tbl.to_pandas()
    for shard, g in df.groupby("shard", sort=True):
        g = g.sort_values(["shuffle_key", "doc_id"], kind="mergesort")
        h = hashlib.sha256()
        h.update(g["doc_id"].to_numpy(dtype=np.int64).tobytes())
        rows.append((int(shard), len(g), h.hexdigest()))
    return pd.DataFrame(rows, columns=["shard", "n_docs", "checksum"])
