"""Text extraction, normalization and tokenization kernels.

``extract_text`` is the frozen, dependency-free html→text function (SURVEY.md
§7.4: the per-row invariant demands byte-identical extraction per url across
versions — pure stdlib only, no parser library). Reference analogue: the
image decode/normalize front-end (faiss_clip_similarity.py:27-53,
image_util.py:23-107) — here the "decode" is html binary → body text.

``normalize_text`` / ``tokenize_batch`` implement FIXTURES.md F4 shingle
normalization: lowercase + collapse whitespace; word tokens = whitespace split.
Reference analogue: jieba tokenizer + stopword filter
(literal_similarity.py:411-413) — our dedup tokens are plain words (no
stopword removal on the dedup path; that is a scoring concern, not identity).
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_MAIN_RE = re.compile(r"<main>(.*?)</main>", re.S)


def extract_text(html_bytes: bytes) -> str:
    """Extract body text from an html page, deterministically.

    Takes the content of ``<main>…</main>`` if present (else the whole
    document), strips tags, unescapes entities, collapses whitespace.
    Pure function of the bytes — frozen (do not change without bumping the
    config hash of every checkpoint).
    """
    doc = html_bytes.decode("utf-8", errors="replace")
    m = _MAIN_RE.search(doc)
    if m:
        doc = m.group(1)
    doc = _TAG_RE.sub(" ", doc)
    doc = _htmllib.unescape(doc)
    return _WS_RE.sub(" ", doc).strip()


def extract_text_batch(html_col: pa.Array) -> pa.Array:
    """Vectorized-enough batch wrapper (regex per row; compiled once per module)."""
    return pa.array(
        [extract_text(v) if v is not None else "" for v in html_col.to_pylist()],
        type=pa.string(),
    )


def normalize_batch(text_col) -> pa.Array:
    """Lowercase + collapse whitespace + trim, via Arrow compute kernels."""
    arr = text_col if isinstance(text_col, (pa.Array, pa.ChunkedArray)) else pa.array(text_col, type=pa.string())
    arr = pc.utf8_lower(arr)
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(arr)


def tokenize_batch(text_col) -> tuple[pa.Array, np.ndarray]:
    """Normalize then whitespace-tokenize a batch of strings.

    Returns (flat token string array, int64 offsets of length n+1) — the flat
    layout the hashing kernels consume directly.
    """
    norm = normalize_batch(text_col)
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    tokens = pc.split_pattern(norm, pattern=" ")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = tokens.flatten()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # empty string still splits to one empty token — zero out those docs
    lens = pc.utf8_length(norm).to_numpy(zero_copy_only=False)
    empty = np.flatnonzero(lens == 0)
    if len(empty):
        # rebuild offsets/flat without the empty docs' phantom token
        keep = np.ones(len(flat), dtype=bool)
        counts = np.diff(offsets)
        for d in empty:
            keep[offsets[d] : offsets[d + 1]] = False
            counts[d] = 0
        flat = flat.filter(pa.array(keep))
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return flat, offsets


def normalize_one(text: str) -> str:
    """Scalar twin of normalize_batch (used by the pure-Python test oracle)."""
    return _WS_RE.sub(" ", text.lower()).strip()
