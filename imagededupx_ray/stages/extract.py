"""Extract stage: ``pages`` → ``docs`` (SURVEY.md §7.2 step 1).

Stateless ``map_batches`` task, Arrow in / Arrow out. Replaces the reference's
corpus ingestion + MD5 content hashing
(/root/reference/similarities/similarities/literal_similarity.py:62-77 value
dedup on insert; /root/reference/improved_faiss_detector.py:41-50 file MD5):
text is extracted from ``html`` (frozen pure function — byte-identical per url),
``doc_id = hash64(url)`` is content-derived (never positional, unlike the
reference's ``df.iloc[faiss_id]`` lookups), ``text_sha256`` is the exact-dedup
key.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from imagededupx_ray.functions.hashing import id_hash_array
from imagededupx_ray.functions.text import extract_text


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch → docs batch. Prefers extracting from ``html``; falls back
    to the provided ``text`` column when html is null/absent."""
    urls = batch["url"]
    n = batch.num_rows
    if "html" in batch.column_names:
        html_col = batch["html"].to_pylist()
        text_fallback = (
            batch["text"].to_pylist() if "text" in batch.column_names else [""] * n
        )
        texts = [
            extract_text(h) if h is not None else (t or "")
            for h, t in zip(html_col, text_fallback)
        ]
    else:
        texts = [(t or "") for t in batch["text"].to_pylist()]

    doc_ids = id_hash_array(urls.to_pylist())
    sha = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    text_arr = pa.array(texts, type=pa.string())
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "url": urls,
            "warc_ts": batch["warc_ts"]
            if "warc_ts" in batch.column_names
            else pa.nulls(n, pa.timestamp("us")),
            "text": text_arr,
            "lang": batch["lang"]
            if "lang" in batch.column_names
            else pa.nulls(n, pa.string()),
            "n_bytes": pc.binary_length(pc.cast(text_arr, pa.binary())).cast(pa.int64()),
            "text_sha256": pa.array(sha, type=pa.string()),
        }
    )


def extract_stage(pages_ds, batch_size: int = 2048):
    """``read_parquet(pages)`` → docs Dataset. Batch size modest: html payloads
    are wide; Ray's streaming executor pipelines blocks with backpressure."""
    return pages_ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )
