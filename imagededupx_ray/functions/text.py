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


def utf8_slices(arr: pa.Array):
    """(memoryview over utf8 data, int offsets) for a string array — lets
    byte-level numpy/C kernels skip python-str materialization entirely."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return data, off


# RE2's \s (ASCII): \t \n \v \f \r — space handled separately below
_RE2_WS_NOSPACE = np.zeros(256, dtype=bool)
_RE2_WS_NOSPACE[[0x09, 0x0A, 0x0B, 0x0C, 0x0D]] = True


def _collapse_is_identity(arr: pa.Array) -> bool:
    """True when ``replace(\\s+ -> " ") + trim_whitespace`` is provably a
    no-op on every row: no ASCII whitespace besides single interior spaces,
    no double spaces, no edge spaces, and no non-ASCII first/last character
    (which could be unicode whitespace that trim would strip). One vectorized
    byte scan — the RE2 pass it replaces costs ~15x more and is an identity
    on text that already went through the extract collapse."""
    data_mv, off = utf8_slices(arr)
    n = len(off) - 1
    if n <= 0 or len(data_mv) == 0:
        return True
    b = np.frombuffer(data_mv, dtype=np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    seg = b[lo:hi]
    if _RE2_WS_NOSPACE[seg].any():
        return False
    sp = seg == 0x20
    # double-space check may straddle a row boundary — a false hit only means
    # the (identity) regex runs, never a wrong result
    if len(sp) > 1 and (sp[:-1] & sp[1:]).any():
        return False
    nonempty = off[1:] > off[:-1]
    if nonempty.any():
        starts = off[:-1][nonempty].astype(np.int64)
        ends = off[1:][nonempty].astype(np.int64) - 1
        edge = np.concatenate([b[starts], b[ends]])
        # 0x1C-0x1F: not RE2 \s, but utf8_trim_whitespace (python isspace
        # semantics) strips them at row edges
        if (
            (edge == 0x20).any()
            or (edge >= 0x80).any()
            or ((edge >= 0x1C) & (edge <= 0x1F)).any()
        ):
            return False
    return True


def normalize_batch(text_col) -> pa.Array:
    """Lowercase + collapse whitespace + trim, via Arrow compute kernels.
    The collapse+trim passes are skipped when a cheap byte scan proves them
    identity (the common case for text produced by the extract stage)."""
    arr = text_col if isinstance(text_col, (pa.Array, pa.ChunkedArray)) else pa.array(text_col, type=pa.string())
    arr = pc.utf8_lower(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if _collapse_is_identity(arr):
        return arr
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
