"""Corpus-level ExactSubstr cleanup via a winnowed-anchor exchange.

Lee et al. 2021 (arXiv:2107.06499, "Deduplicating Training Data Makes
Language Models Better") remove every repeated long substring from a corpus
with ONE canonical occurrence kept, using a corpus-wide suffix array. A
monolithic suffix array over 100 TB does not map onto a streaming engine;
this stage gets the same effect with content-defined anchors:

1. per doc (stateless map): a polynomial rolling hash over every W-byte
   window in O(n) (uint64 wraparound arithmetic; the window sum telescopes
   through the modular inverse of the odd base — no per-window loop), then
   WINNOWING (Schleimer et al. 2003) picks the minimum-hash position of
   every w-window of hashes. Anchor positions are content-defined, so the
   same repeated region anchors at the same relative offsets in every
   occurrence regardless of byte alignment. Any repeated run of length
   >= W + w - 1 is guaranteed to share at least one anchor.
2. ONE coarse-partition exchange groups anchors by (h1, h2) — two
   independent 64-bit rolling hashes, 128 bits total, so byte verification
   is statistically unnecessary (documented choice; Bloom-style risk
   bound). Groups with >= 2 members pick the lexicographically smallest
   (doc_id, start) as keeper and emit [start, start + W) removal intervals
   for every other member — this also removes INTRA-doc repetitions
   (second occurrence within one doc loses to the first).
3. removal intervals broadcast (duplicate-anchor-bounded, not corpus-
   bounded) and one narrow rewrite scan excises them, merged and
   UTF-8-snapped (stages/spans.excise_intervals — shared with the
   pair-spans cleanup).

Overlapping anchors of one repeated region merge into a covering span, so
excision removes the repeated region up to < W + w bytes of slack at its
edges (the winnowing guarantee bounds the slack)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.stages.spans import _interval_map, excise_intervals

# odd bases -> invertible mod 2^64; two independent hashes = 128-bit key
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _inv_u64(p: np.uint64) -> np.uint64:
    """Modular inverse of an odd uint64 mod 2^64 (Newton iteration)."""
    x = int(p)
    inv = 1
    for _ in range(6):
        inv = (inv * (2 - x * inv)) & 0xFFFFFFFFFFFFFFFF
    return np.uint64(inv)


def rolling_hashes(data: np.ndarray, W: int, p: np.uint64) -> np.ndarray:
    """All W-byte-window polynomial hashes of a uint8 array in O(n):
    H[i] = sum_j data[i+j] * p^(W-1-j) (mod 2^64). Telescoped as
    H[i] = (C[i+W] - C[i]) * p^(i+W-1) with C = cumsum(data[t] * p^-t)."""
    n = len(data)
    if n < W:
        return np.empty(0, dtype=np.uint64)
    pinv = _inv_u64(p)
    with np.errstate(over="ignore"):
        t = np.arange(n, dtype=np.uint64)
        # p^-t and p^t via cumprod (uint64 wraparound is the ring)
        pinv_pows = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n - 1, pinv, dtype=np.uint64)))
        )
        p_pows = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n + W, p, dtype=np.uint64)))
        )
        weighted = data.astype(np.uint64) * pinv_pows
        C = np.concatenate(([np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)))
        i = np.arange(n - W + 1)
        return (C[i + W] - C[i]) * p_pows[i + W - 1]


def winnow_anchor_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Winnowing over a hash sequence: the position of the minimum of every
    w consecutive hashes (rightmost minimum per window, deduplicated) —
    the standard guarantee: every w-window contributes an anchor, and
    identical hash runs anchor at identical content-relative offsets."""
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= w:
        return np.array([int(np.flatnonzero(h == h.min())[-1])], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost min: argmax over reversed window of (== min) — cheaper:
    # (w - 1) - argmin of reversed view
    rev = win[:, ::-1]
    pos = (w - 1) - np.argmin(rev, axis=1) + np.arange(n - w + 1)
    return np.unique(pos.astype(np.int64))


def corpus_substring_cleanup(
    docs_ds,
    window_bytes: int = 64,
    winnow_w: int = 32,
    num_partitions: int | None = None,
):
    """docs(doc_id, text, ...) → docs with every corpus-repeated byte run
    (length >= window_bytes + winnow_w - 1 guaranteed; shorter runs
    best-effort) excised from all but its lexicographically-first
    (doc_id, start) occurrence. Returns the rewritten docs with
    ``n_spans_removed`` / ``bytes_removed``."""
    from imagededupx_ray.stages.lsh import _pow2
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)
    W = window_bytes

    def emit_anchors(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_h1, out_h2, out_doc, out_start = [], [], [], []
        for did, text in zip(ids.tolist(), batch["text"].to_pylist()):
            data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            h1 = rolling_hashes(data, W, _P1)
            if not len(h1):
                continue
            anchors = winnow_anchor_positions(h1, winnow_w)
            h2 = rolling_hashes(data, W, _P2)
            out_h1.append(h1[anchors])
            out_h2.append(h2[anchors])
            out_doc.append(np.full(len(anchors), did, dtype=np.int64))
            out_start.append(anchors)
        if not out_h1:
            return pa.table(
                {
                    "part": pa.array([], type=pa.int32()),
                    "h1": pa.array([], type=pa.uint64()),
                    "h2": pa.array([], type=pa.uint64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "start": pa.array([], type=pa.int64()),
                }
            )
        h1 = np.concatenate(out_h1)
        with np.errstate(over="ignore"):
            part = (h1 & np.uint64(p - 1)).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int32()),
                "h1": pa.array(h1, type=pa.uint64()),
                "h2": pa.array(np.concatenate(out_h2), type=pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
                "start": pa.array(np.concatenate(out_start), type=pa.int64()),
            }
        )

    def mine_removals(t: pa.Table) -> pa.Table:
        """Within one hash partition: (h1, h2) groups with >= 2 members emit
        removal rows for every member except the (doc_id, start) minimum —
        segmented numpy, no per-group Python."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "start": pa.array([], type=pa.int64()),
                }
            )
        h1 = t["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = t["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = t["start"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((st, doc, h2, h1))
        h1, h2, doc, st = h1[order], h2[order], doc[order], st[order]
        new_grp = np.concatenate(
            ([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1]))
        )
        # keeper = first row of each group (sorted by doc, start within
        # group); losers = every row whose group has >= 2 members and is
        # not the group head
        grp_id = np.cumsum(new_grp) - 1
        sizes = np.bincount(grp_id)
        loser = (~new_grp) & (sizes[grp_id] >= 2)
        return pa.table(
            {
                "doc_id": pa.array(doc[loser], type=pa.int64()),
                "start": pa.array(st[loser], type=pa.int64()),
            }
        )

    anchors = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        emit_anchors, batch_format="pyarrow"
    )
    removals = (
        anchors.groupby("part")
        .map_groups(mine_removals, batch_format="pyarrow")
        .to_pandas()
    )
    if len(removals) and "doc_id" in removals.columns:
        doc = removals["doc_id"].to_numpy().astype(np.int64)
        s = removals["start"].to_numpy().astype(np.int64)
        iv_map = _interval_map(doc, s, s + W)
    else:  # empty groupby output may carry no schema
        iv_map = {}
    return excise_intervals(docs_ds, iv_map)
