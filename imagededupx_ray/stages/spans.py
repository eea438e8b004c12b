"""Suffix-array exact-substring-span operator (SURVEY.md §7.2 step 6, §2.8).

Generalizes the reference's longest-common-substring scoring —
``longest_match_size`` / ``longest_match_ratio``
(/root/reference/similarities/similarities/utils/distance.py:115-126) and
``SequenceMatcherSimilarity`` with its ``min_same_len=70 →
min_same_len_score=0.9`` rule
(/root/reference/similarities/similarities/literal_similarity.py:1022-1047) —
into a distributed stage: for every candidate/verified pair, build a suffix
array over ``a + sep + b`` and emit the exact shared byte spans of length >=
``span_min_len``.

Per-pair texts are small (web pages), so the suffix array uses a vectorized
numpy doubling algorithm (O(n log n)) and Kasai's LCP (O(n) python loop — a
few thousand steps per pair, amortized across task workers). Spans come from
adjacent cross-doc suffix pairs in the SA; this always realizes the longest
common substring (the classic SA-LCS theorem) plus the left-maximal long
spans, deduplicated. Offsets are byte offsets in the UTF-8 encoding.

The pair → text lookup broadcasts only the texts of docs that appear in some
pair (a small subset of a web corpus); the join path is the 10^12-doc
alternative (same shape as verify_pairs_join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG


def suffix_array_bytes(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array via prefix-doubling (numpy lexsort)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = s.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank))
        r = rank[sa]
        k2 = key2[sa]
        neq = np.empty(n, dtype=bool)
        neq[0] = False
        neq[1:] = (r[1:] != r[:-1]) | (k2[1:] != k2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.cumsum(neq)
        rank = new_rank
        if rank[sa[-1]] == n - 1:
            return sa
        k *= 2


def lcp_kasai(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[r] = longest common prefix of suffixes sa[r-1], sa[r] (Kasai)."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    sl = s.tolist()  # python list: ~3x faster element access in the loop
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and sl[i + h] == sl[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def pair_spans(text_a: str, text_b: str, min_len: int) -> list[tuple[int, int, int]]:
    """Exact shared byte spans (a_start, b_start, length >= min_len) between
    two texts, from adjacent cross-doc suffix pairs; left-maximal, deduped,
    sorted. Includes the longest common substring whenever it is >= min_len."""
    ba = np.frombuffer(text_a.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    bb = np.frombuffer(text_b.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    la = len(ba)
    s = np.concatenate((ba, np.array([1], dtype=np.int64), bb))
    sa = suffix_array_bytes(s)
    lcp = lcp_kasai(s, sa)
    n = len(s)
    out: set[tuple[int, int, int]] = set()
    for r in range(1, n):
        length = int(lcp[r])
        if length < min_len:
            continue
        i, j = int(sa[r - 1]), int(sa[r])
        if (i < la) == (j < la):  # same doc — not a cross span
            continue
        if i > j:
            i, j = j, i
        a_start, b_start = i, j - la - 1
        length = min(length, la - a_start)  # clip at the separator
        if length < min_len:
            continue
        # left-maximality: an extendable span is contained in a longer one
        if a_start > 0 and b_start > 0 and ba[a_start - 1] == bb[b_start - 1]:
            continue
        out.add((a_start, b_start, length))
    return sorted(out)


@ray.remote
def _to_text_map(*tbls):
    """Member-text map assembled INSIDE a worker: the driver only holds the
    ref (pair-member-bounded either way, but no driver pandas). Module scope
    so the remote exports once per session, not per call."""
    out = {}
    for t in tbls:
        out.update(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    return out


def substring_spans(
    pairs_ds,
    docs_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
):
    """(a, b) pairs × docs(doc_id, text) → SUBSTRING_SPANS table.

    Broadcasts only the texts of pair members (collected via a distributed
    membership filter), then maps over pair batches as tasks.
    """
    pair_tbl = pairs_ds.select_columns(["a", "b"])
    ids_df = pair_tbl.to_pandas()
    needed = np.unique(
        np.concatenate([ids_df["a"].to_numpy(), ids_df["b"].to_numpy()])
    ).astype(np.int64)
    needed_ref = ray.put(needed)

    def member_filter(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(want, ids)
        pos[pos >= len(want)] = 0
        keep = want[pos] == ids
        return batch.filter(pa.array(keep)).select(["doc_id", "text"])

    member_cells = docs_ds.map_batches(member_filter, batch_format="pyarrow").materialize()
    text_ref = _to_text_map.remote(*member_cells.to_arrow_refs())
    min_len = cfg.span_min_len

    def emit(batch: pa.Table) -> pa.Table:
        texts = ray.get(text_ref)
        rows_a, rows_b, a_s, b_s, ln = [], [], [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            ta, tb = texts.get(a), texts.get(b)
            if ta is None or tb is None:
                continue
            for (sa_, sb_, length) in pair_spans(ta, tb, min_len):
                rows_a.append(a)
                rows_b.append(b)
                a_s.append(sa_)
                b_s.append(sb_)
                ln.append(length)
        return pa.table(
            {
                "a": pa.array(rows_a, type=pa.int64()),
                "b": pa.array(rows_b, type=pa.int64()),
                "a_start": pa.array(a_s, type=pa.int64()),
                "b_start": pa.array(b_s, type=pa.int64()),
                "length": pa.array(ln, type=pa.int64()),
            }
        )

    return pair_tbl.map_batches(emit, batch_format="pyarrow", batch_size=256)


def substring_spans_join(
    pairs_ds,
    docs_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
):
    """(a, b) pairs × docs(doc_id, text) → SUBSTRING_SPANS via two
    hash-partitioned ``Dataset.join``s on doc_id — the 10^12-doc alternative
    to the broadcast text map (same shape as verify_pairs_join: only the
    narrow pair table and the doc rows that match it shuffle; no
    pair-member text set ever assembles in one object). Output is identical
    to ``substring_spans`` (tested: test_span_join_equals_broadcast)."""
    from imagededupx_ray.util import suggest_num_partitions

    if num_partitions is None:
        num_partitions = suggest_num_partitions()
    docs_narrow = docs_ds.select_columns(["doc_id", "text"])
    joined = pairs_ds.select_columns(["a", "b"]).join(
        docs_narrow,
        join_type="inner",
        on=("a",),
        right_on=("doc_id",),
        num_partitions=num_partitions,
    ).rename_columns({"text": "text_a"})
    joined = joined.join(
        docs_narrow,
        join_type="inner",
        on=("b",),
        right_on=("doc_id",),
        num_partitions=num_partitions,
    ).rename_columns({"text": "text_b"})
    min_len = cfg.span_min_len

    def emit(batch: pa.Table) -> pa.Table:
        rows_a, rows_b, a_s, b_s, ln = [], [], [], [], []
        for a, b, ta, tb in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            for (sa_, sb_, length) in pair_spans(ta, tb, min_len):
                rows_a.append(a)
                rows_b.append(b)
                a_s.append(sa_)
                b_s.append(sb_)
                ln.append(length)
        return pa.table(
            {
                "a": pa.array(rows_a, type=pa.int64()),
                "b": pa.array(rows_b, type=pa.int64()),
                "a_start": pa.array(a_s, type=pa.int64()),
                "b_start": pa.array(b_s, type=pa.int64()),
                "length": pa.array(ln, type=pa.int64()),
            }
        )

    return joined.map_batches(emit, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
# corpus cleanup: excise duplicated spans (Lee et al. 2021, arXiv:2107.06499,
# "Deduplicating Training Data Makes Language Models Better" — ExactSubstr:
# when two documents share a long exact substring, keep ONE occurrence and
# remove the others from the corpus)
# ---------------------------------------------------------------------------


def _snap_utf8(data: bytes, start: int, end: int) -> tuple[int, int]:
    """Snap a byte interval INWARD to UTF-8 codepoint boundaries so excision
    never splits a multibyte character (shared byte runs can start/end on a
    continuation byte). Removing slightly less than the span is safe; the
    output must stay valid UTF-8."""
    n = len(data)
    start = max(0, min(start, n))
    end = max(start, min(end, n))
    while start < end and (data[start] & 0xC0) == 0x80:
        start += 1
    # data[:start] and data[end:] must both begin/end on codepoint
    # boundaries: shrink end down to the lead byte of any char it splits
    while start < end < n and (data[end] & 0xC0) == 0x80:
        end -= 1
    return start, end


def _merge_intervals(starts: np.ndarray, ends: np.ndarray) -> list[tuple[int, int]]:
    order = np.lexsort((ends, starts))
    merged: list[list[int]] = []
    for s, e in zip(starts[order].tolist(), ends[order].tolist()):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, e) for s, e in merged]


def _interval_map(
    doc: np.ndarray, s: np.ndarray, e: np.ndarray
) -> dict[int, list[tuple[int, int]]]:
    """{doc_id -> merged removal intervals} from flat (doc, start, end)."""
    iv_map: dict[int, list[tuple[int, int]]] = {}
    if len(doc):
        order = np.argsort(doc, kind="stable")
        doc, s, e = doc[order], s[order], e[order]
        cuts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        bounds = np.concatenate((cuts, [len(doc)]))
        for i, c in enumerate(cuts):
            iv_map[int(doc[c])] = _merge_intervals(
                s[c : bounds[i + 1]], e[c : bounds[i + 1]]
            )
    return iv_map


def excise_intervals(docs_ds, iv_map: dict[int, list[tuple[int, int]]]):
    """Rewrite docs by excising the given per-doc byte intervals (merged,
    UTF-8-snapped). The interval map broadcasts once; untouched docs stream
    through unmodified. Adds ``n_spans_removed`` / ``bytes_removed``."""
    iv_ref = ray.put(iv_map)

    def rewrite(batch: pa.Table) -> pa.Table:
        iv = ray.get(iv_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_removed = np.zeros(len(ids), dtype=np.int64)
        bytes_removed = np.zeros(len(ids), dtype=np.int64)
        hit_rows = [i for i, d in enumerate(ids.tolist()) if d in iv]
        if hit_rows:
            texts = batch["text"].to_pylist()
            for i in hit_rows:
                data = texts[i].encode("utf-8")
                kept, pos, nrm, brm = [], 0, 0, 0
                for s0, e0 in iv[ids[i]]:
                    s1, e1 = _snap_utf8(data, s0, e0)
                    if e1 <= s1:
                        continue
                    kept.append(data[pos:s1])
                    brm += e1 - s1
                    nrm += 1
                    pos = e1
                kept.append(data[pos:])
                texts[i] = b"".join(kept).decode("utf-8")
                n_removed[i] = nrm
                bytes_removed[i] = brm
            batch = batch.set_column(
                batch.column_names.index("text"),
                "text",
                pa.array(texts, type=pa.string()),
            )
        return batch.append_column(
            "n_spans_removed", pa.array(n_removed, type=pa.int64())
        ).append_column("bytes_removed", pa.array(bytes_removed, type=pa.int64()))

    return docs_ds.map_batches(rewrite, batch_format="pyarrow")


def substring_cleanup(docs_ds, spans_ds):
    """docs(doc_id, text, ...) × SUBSTRING_SPANS → docs with every
    duplicated span EXCISED from its higher-doc_id occurrence (pairs emit
    a < b, so the b side loses; the min-id occurrence stays canonical —
    the same deterministic tie-break as the cluster stage).

    Output keeps the input columns with ``text`` rewritten plus
    ``n_spans_removed`` / ``bytes_removed`` per row. Intervals per doc are
    SPAN-bounded (docs in verified pairs only), so the interval map is a
    broadcast — the same bound as the spans stage's own pair-member text
    map; untouched docs stream through unmodified."""
    sp = spans_ds.select_columns(["b", "b_start", "length"]).to_pandas()
    if len(sp):
        b = sp["b"].to_numpy().astype(np.int64)
        s = sp["b_start"].to_numpy().astype(np.int64)
        iv_map = _interval_map(
            b, s, s + sp["length"].to_numpy().astype(np.int64)
        )
    else:
        iv_map = {}
    return excise_intervals(docs_ds, iv_map)
