"""Line-level boilerplate dedup over a documents/pages corpus — the
CCNet / RefinedWeb pre-step that strips lines repeated across many
documents (nav bars, cookie banners, footers) before document-level
near-dedup. The reference dedups whole files by content identity
(improved_faiss_detector.py:259-295); web-text pipelines additionally
dedup at LINE granularity because boilerplate dominates page bytes
(CCNet Wenzek et al. 2019 §4.1; RefinedWeb Penedo et al. 2023 §3.3).

Rule: a line is boilerplate when its NORMALIZED form (lowercase, digits
stripped, whitespace collapsed) occurs in >= ``min_doc_rep`` DISTINCT
documents; every occurrence is removed (CCNet removes all copies — the
line carries no per-document information). Lines whose normalized form
is empty are structure, not content: never counted, never removed.

Shape (the repo's standard two-stage manual exchange + broadcast):
  1. per block-group task: split -> normalize -> hash64 -> per-doc
     unique -> partial (hash, doc_count), hash-split into P slices
     (ships distinct hashes, not lines);
  2. P reduce tasks sum counts and keep only count >= min_doc_rep —
     the HOT set, bounded by total_lines / min_doc_rep regardless of
     corpus size (boilerplate is by definition a small distinct set
     repeated many times);
  3. hot hashes broadcast once (``ray.put``); one streaming
     ``map_batches`` filter rebuilds each doc's text from kept lines
     via Arrow list offsets + ``binary_join`` — no per-row Python.

At 10^12-doc scale the hot set is the only driver-resident state; if a
corpus ever pushed it past memory, swap step 3's sorted-array membership
for the Bloom bitmap used by ``docs_decontaminate_bloom``
(functions/bloom.py) at the cost of a false-positive rate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from imagededupx_ray.functions.hashing import token_hash_flat

# reduce fans in at most this many block-group partials per partition slice
MANUAL_SHUFFLE_MAX_BLOCKS = 4096


def _split_lines(col, delimiter: str):
    """(flat_lines: pa.Array, doc_idx: np.int64[], n_docs) for a string
    column; one Arrow kernel, no per-row Python."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.cast(arr, pa.string())
    lists = pc.split_pattern(arr, pattern=delimiter)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts.astype(np.float64), nan=0.0).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    return flat, doc_idx, counts


def _normalize_lines(flat: pa.Array) -> pa.Array:
    """CCNet-style normalization for line identity: lowercase, digits
    stripped, runs of whitespace collapsed, ends trimmed."""
    x = pc.utf8_lower(flat)
    x = pc.replace_substring_regex(x, r"[0-9]+", "")
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def _line_hashes(flat: pa.Array, normalize: bool) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 hash per line, countable mask). Empty normalized lines are
    exempt from counting/removal (mask False)."""
    norm = _normalize_lines(flat) if normalize else flat
    h = token_hash_flat(norm)
    nonempty = pc.greater(pc.utf8_length(norm), 0).to_numpy(zero_copy_only=False)
    return h, np.asarray(nonempty, dtype=bool)


@ray.remote
def _line_count_block(P: int, text_col: str, delimiter: str, normalize: bool, *tables):
    """Partial distinct-doc counts per line hash over a group of blocks,
    hash-split into P partition slices of (hashes: uint64, counts: int64)."""
    hs, cs = [], []
    for t in tables:
        if t.num_rows == 0 or text_col not in t.column_names:
            continue  # schema-less empty bundles from upstream filters
        flat, doc_idx, _ = _split_lines(t[text_col], delimiter)
        if len(doc_idx) == 0:
            continue
        h, countable = _line_hashes(flat, normalize)
        h, doc_idx = h[countable], doc_idx[countable]
        if len(h) == 0:
            continue
        # per-doc unique (a line repeated WITHIN one doc counts once)
        order = np.lexsort((h, doc_idx))
        hs_o, di_o = h[order], doc_idx[order]
        first = np.ones(len(hs_o), dtype=bool)
        first[1:] = (hs_o[1:] != hs_o[:-1]) | (di_o[1:] != di_o[:-1])
        uh, uc = np.unique(hs_o[first], return_counts=True)
        hs.append(uh)
        cs.append(uc.astype(np.int64))
    if hs:
        h_all = np.concatenate(hs)
        c_all = np.concatenate(cs)
        # merge partials across the group's blocks
        uh, inv = np.unique(h_all, return_inverse=True)
        uc = np.bincount(inv, weights=c_all).astype(np.int64)
    else:
        uh = np.empty(0, dtype=np.uint64)
        uc = np.empty(0, dtype=np.int64)
    if P == 1:
        return uh, uc
    part = (uh & np.uint64(P - 1)).astype(np.int64)
    return tuple((uh[part == p], uc[part == p]) for p in range(P))


@ray.remote
def _line_count_reduce(min_rep: int, *parts):
    """Sum partial counts for one partition slice; return only the hot
    hashes (distinct-doc count >= min_rep), sorted."""
    hs = [p[0] for p in parts if len(p[0])]
    if not hs:
        return np.empty(0, dtype=np.uint64)
    h_all = np.concatenate(hs)
    c_all = np.concatenate([p[1] for p in parts if len(p[0])])
    uh, inv = np.unique(h_all, return_inverse=True)
    uc = np.bincount(inv, weights=c_all).astype(np.int64)
    return uh[uc >= min_rep]  # np.unique output is already sorted


def dedup_lines(
    docs_ds,
    text_col: str = "text",
    delimiter: str = "\n",
    min_doc_rep: int = 2,
    normalize: bool = True,
    metrics: dict | None = None,
):
    """docs → docs with boilerplate lines removed from ``text_col``, plus
    ``n_lines`` (before), ``n_lines_removed`` and ``line_chars_removed``
    per doc. Returns (cleaned_ds, n_hot_lines). Docs that lose every line
    keep an empty string (callers filter on their own retention policy,
    RefinedWeb drops < 50 % retained)."""
    import time as _time

    _t = _time.monotonic()
    docs_ds = docs_ds.materialize()  # counted once, filtered once
    blocks = docs_ds.to_arrow_refs()
    nb = max(1, len(blocks))
    P = 1 << max(0, (min(nb, MANUAL_SHUFFLE_MAX_BLOCKS) - 1).bit_length() - 2)
    from imagededupx_ray.util import block_group_size

    group = block_group_size(len(blocks))
    per_block = [
        _line_count_block.options(num_returns=P if P > 1 else 1).remote(
            P, text_col, delimiter, normalize, *blocks[i : i + group]
        )
        for i in range(0, len(blocks), group)
    ]
    if P == 1:
        red = [_line_count_reduce.remote(min_doc_rep, *per_block)] if per_block else []
    else:
        red = [_line_count_reduce.remote(min_doc_rep, *col) for col in zip(*per_block)]
    res = ray.get(red)
    hot = np.sort(np.concatenate(res)) if res else np.empty(0, dtype=np.uint64)
    n_hot = int(len(hot))
    hot_ref = ray.put(hot)
    if metrics is not None:
        metrics["line_count_sec"] = round(_time.monotonic() - _t, 3)

    def scrub(batch: pa.Table) -> pa.Table:
        if text_col not in batch.column_names:
            # schema-less empty bundle (e.g. an upstream all-false filter):
            # return the declared output schema with 0 rows
            schema = pa.schema(
                list(batch.schema)
                + [
                    pa.field(text_col, pa.string()),
                    pa.field("n_lines", pa.int64()),
                    pa.field("n_lines_removed", pa.int64()),
                    pa.field("line_chars_removed", pa.int64()),
                ]
            )
            return schema.empty_table()
        d_hot = ray.get(hot_ref)
        flat, doc_idx, counts = _split_lines(batch[text_col], delimiter)
        n = batch.num_rows
        if len(doc_idx) == 0 or len(d_hot) == 0:
            return (
                batch.append_column("n_lines", pa.array(counts, type=pa.int64()))
                .append_column("n_lines_removed", pa.array(np.zeros(n, np.int64)))
                .append_column("line_chars_removed", pa.array(np.zeros(n, np.int64)))
            )
        h, countable = _line_hashes(flat, normalize)
        pos = np.searchsorted(d_hot, h)
        pos[pos >= len(d_hot)] = 0
        remove = (d_hot[pos] == h) & countable
        keep = ~remove
        kept_counts = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        flat_c = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        kept_lines = flat_c.filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_lines)
        cleaned = pc.binary_join(lists, delimiter)
        line_len = pc.utf8_length(flat_c).to_numpy(zero_copy_only=False).astype(np.int64)
        chars_rm = np.bincount(doc_idx[remove], weights=line_len[remove], minlength=n)
        out = batch.set_column(
            batch.column_names.index(text_col), text_col, cleaned
        )
        return (
            out.append_column("n_lines", pa.array(counts, type=pa.int64()))
            .append_column(
                "n_lines_removed", pa.array(counts - kept_counts, type=pa.int64())
            )
            .append_column(
                "line_chars_removed", pa.array(chars_rm.astype(np.int64), type=pa.int64())
            )
        )

    return docs_ds.map_batches(scrub, batch_format="pyarrow"), n_hot
