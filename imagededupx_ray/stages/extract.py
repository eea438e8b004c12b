"""Extract stage: ``pages`` → ``docs`` (SURVEY.md §7.2 step 1).

Stateless ``map_batches`` task, Arrow in / Arrow out. Replaces the reference's
corpus ingestion + MD5 content hashing
(/root/reference/similarities/similarities/literal_similarity.py:62-77 value
dedup on insert; /root/reference/improved_faiss_detector.py:41-50 file MD5):
text is extracted from ``html`` (frozen pure function — byte-identical per url),
``doc_id = hash64(url)`` is content-derived (never positional, unlike the
reference's ``df.iloc[faiss_id]`` lookups), ``text_sha256`` is the exact-dedup
key.

The hot path is fully vectorized RE2 kernels (this is the single
most-executed stage at web scale): cast → <main> extract → tag strip →
standard-entity unescape → whitespace collapse, each one
``pyarrow.compute`` pass over the whole batch. Rows the Arrow path cannot
reproduce byte-identically — non-ASCII text (python ``\\s`` matches \\x85/\\xa0
where RE2's ASCII class does not) or non-standard entities (``&copy`` etc.,
which ``html.unescape`` resolves and RE2 cannot) — are detected vectorized and
recomputed through the frozen scalar ``extract_text``; identical output either
way (property-tested against the scalar function).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from imagededupx_ray.functions.hashing import MASK63
from imagededupx_ray.functions.text import extract_text, utf8_slices as _utf8_slices

# the five entities html.unescape and a chained RE2 replace agree on; any
# other '&' routes the row to the scalar path
_STD_ENTITIES = r"&(amp|lt|gt|quot|#39);"


def _combine(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col




def _hash64_column(arr: pa.Array) -> np.ndarray:
    """63-bit blake2b id per row of a string column (doc_id = hash64(url))."""
    data, off = _utf8_slices(arr)
    out = np.empty(len(arr), dtype=np.int64)
    b2b = hashlib.blake2b
    for i in range(len(arr)):
        out[i] = (
            int.from_bytes(b2b(data[off[i] : off[i + 1]], digest_size=8).digest(), "big")
            & MASK63
        )
    return out


def _sha256_hex_column(arr: pa.Array) -> list[str]:
    data, off = _utf8_slices(arr)
    sha = hashlib.sha256
    return [sha(data[off[i] : off[i + 1]]).hexdigest() for i in range(len(arr))]


def _main_slice(doc: pa.Array) -> pa.Array:
    """First ``<main>…</main>`` span per row (whole doc when absent) — exact
    ``re.search`` first-match semantics via C-level ``bytes.find``, building
    the result array's buffers directly (one join copy, no regex engine)."""
    n = len(doc)
    data_mv, off = _utf8_slices(doc)
    data = bytes(data_mv)
    parts = []
    starts = np.empty(n + 1, dtype=np.int32)
    starts[0] = 0
    for i in range(n):
        s, e = int(off[i]), int(off[i + 1])
        p = data.find(b"<main>", s, e)
        if p >= 0:
            q = data.find(b"</main>", p + 6, e)
            if q >= 0:
                s, e = p + 6, q
        parts.append(data[s:e])
        starts[i + 1] = starts[i] + (e - s)
    return pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(starts.tobytes()), pa.py_buffer(b"".join(parts))]
    )


def _extract_vectorized(doc: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Vectorized extract pipeline over decoded html strings. Returns
    (extracted texts, bool mask of rows needing the scalar fallback)."""
    # rows with non-ASCII bytes diverge on \s semantics -> scalar path
    slow = ~pc.string_is_ascii(doc).to_numpy(zero_copy_only=False)
    stripped = pc.replace_substring_regex(
        _main_slice(doc), pattern="<[^>]+>", replacement=" "
    )
    un = stripped
    if pc.any(pc.match_substring(stripped, "&")).as_py():
        # rows with any '&' not fully consumed by the five standard entities
        probe = pc.replace_substring_regex(
            stripped, pattern=_STD_ENTITIES, replacement=""
        )
        slow |= pc.match_substring(probe, "&").to_numpy(zero_copy_only=False)
        # chained entity replace: &amp; LAST so "&amp;lt;" -> "&lt;" (unescape
        # processes left-to-right and does not rescan its own output)
        for ent, rep in (
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&#39;", "'"),
            ("&amp;", "&"),
        ):
            un = pc.replace_substring(un, pattern=ent, replacement=rep)
    # \s+ -> " " then strip: whitespace-split (runs collapse, utf8proc space
    # class matches python \s on ASCII) + single-space join + edge trim
    collapsed = pc.binary_join(pc.utf8_split_whitespace(un), " ")
    return pc.utf8_trim(collapsed, " "), slow


def _extract_native(doc: pa.Array):
    """Native one-pass twin of ``_main_slice`` + ``_extract_vectorized``
    (functions/native.py ``extract_kernel``): tag strip, entity decode and
    whitespace collapse fused into a single scan — the pyarrow path makes ~6
    full passes over the html payload and is memory-bandwidth-bound at high
    core counts. Returns (texts, entity-slow mask) or None when no C compiler
    is available (caller falls back to the pyarrow path; byte-identical —
    tests/test_extract_fuzz.py pins parity)."""
    from imagededupx_ray.functions import native

    if not native.available():
        return None
    doc = _combine(doc)
    data_mv, off = _utf8_slices(doc)
    data = (
        np.frombuffer(data_mv, dtype=np.uint8)
        if len(data_mv)
        else np.empty(0, np.uint8)
    )
    res = native.extract_kernel(data, off, len(doc))
    if res is None:
        return None
    out, out_off, slow = res
    if int(out_off[-1]) >= (1 << 31):  # >2 GiB of text in one batch: pc path
        return None
    arr = pa.Array.from_buffers(
        pa.utf8(),
        len(doc),
        [None, pa.py_buffer(out_off.astype(np.int32).tobytes()), pa.py_buffer(out.tobytes())],
    )
    return arr, slow


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch → docs batch. Prefers extracting from ``html``; falls back
    to the provided ``text`` column when html is null/absent."""
    urls = _combine(batch["url"])
    n = batch.num_rows
    fallback_text = (
        pc.fill_null(_combine(batch["text"]), "")
        if "text" in batch.column_names
        else pa.array([""] * n, type=pa.string())
    )
    if "html" in batch.column_names and batch["html"].null_count < n:
        html_col = _combine(batch["html"])
        valid = pc.is_valid(html_col).to_numpy(zero_copy_only=False)
        try:
            doc = pc.cast(pc.fill_null(html_col, b""), pa.string())
            nat = _extract_native(doc)
            if nat is not None:
                extracted, slow = nat
                # non-ASCII rows diverge on \s semantics -> scalar path (the
                # pyarrow twin folds this into _extract_vectorized)
                slow = slow | ~pc.string_is_ascii(doc).to_numpy(zero_copy_only=False)
            else:
                extracted, slow = _extract_vectorized(doc)
            text_arr = pc.if_else(pa.array(valid), extracted, fallback_text)
            slow &= valid
        except pa.ArrowInvalid:  # invalid utf-8 somewhere: scalar-path the batch
            text_arr = fallback_text
            slow = valid.copy()
        if slow.any():
            html_py = html_col.to_pylist()
            lst = text_arr.to_pylist()
            for i in np.flatnonzero(slow):
                lst[i] = extract_text(html_py[i])
            text_arr = pa.array(lst, type=pa.string())
    else:
        text_arr = fallback_text
    text_arr = _combine(text_arr)

    return pa.table(
        {
            "doc_id": pa.array(_hash64_column(urls), type=pa.int64()),
            "url": urls,
            "warc_ts": batch["warc_ts"]
            if "warc_ts" in batch.column_names
            else pa.nulls(n, pa.timestamp("us")),
            "text": text_arr,
            "lang": batch["lang"]
            if "lang" in batch.column_names
            else pa.nulls(n, pa.string()),
            "n_bytes": pc.binary_length(pc.cast(text_arr, pa.binary())).cast(pa.int64()),
            "text_sha256": pa.array(_sha256_hex_column(text_arr), type=pa.string()),
        }
    )


def extract_stage(pages_ds, batch_size: int = 2048):
    """``read_parquet(pages)`` → docs Dataset. Batch size modest: html payloads
    are wide; Ray's streaming executor pipelines blocks with backpressure."""
    return pages_ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )
