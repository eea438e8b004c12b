"""Explicit pyarrow schemas for every logical table (SURVEY.md §1.2).

The reference keeps schemas implicit (dict keys, positional npy/parquet
alignment — e.g. /root/reference/similarities/similarities/faiss_bert_similarity.py:74-83);
ours are declared constants so every stage's contract is checkable.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

DOCS = pa.schema(
    [
        ("doc_id", pa.int64()),  # 63-bit hash of url — content-derived, not positional
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("n_bytes", pa.int64()),
        ("text_sha256", pa.string()),  # hex digest (joins/groupbys need a native key)
    ]
)

SIGNATURES = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("minhash", pa.list_(pa.uint64())),  # fixed length num_perms
        ("simhash", pa.uint64()),
        ("n_shingles", pa.int32()),
    ]
)

# The snapshot store's persisted signature layout is content-keyed and
# num_perms-dependent (minhash truncated to u32 components); it lives in
# pipelines/incremental.py::_packed_schema, not here.

LSH_ROWS = pa.schema(
    [
        ("_part", pa.int32()),  # coarse shuffle key = bucket & (P-1)
        ("bucket", pa.int64()),  # band index mixed INTO the bucket hash
        ("doc_id", pa.int64()),
    ]
)

CAND_PAIRS = pa.schema(
    [
        ("a", pa.int64()),  # a < b canonical ordering (mirror-dedup, J2)
        ("b", pa.int64()),
    ]
)

VERIFIED_PAIRS = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("est_jaccard", pa.float32()),
        ("hamming", pa.uint8()),
    ]
)

CLUSTERS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("cluster_id", pa.int64()),  # min doc_id in component = canonical
        ("is_canonical", pa.bool_()),
    ]
)

SUBSTRING_SPANS = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("a_start", pa.int64()),
        ("b_start", pa.int64()),
        ("length", pa.int64()),
    ]
)
