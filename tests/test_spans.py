"""Suffix-array substring-span operator tests (SURVEY.md §2.8 / §7.2 step 6).

Oracle: difflib.SequenceMatcher(autojunk=False).find_longest_match — the
exact routine the reference uses for longest-common-substring scoring
(utils/distance.py:115-126) — must agree with the stage's max span length
per pair; the fixture's planted substring pairs must all be detected.
"""

from difflib import SequenceMatcher

import numpy as np
import pyarrow.parquet as pq
import pytest

from imagededupx_ray.config import DEFAULT_CONFIG as CFG
from imagededupx_ray.stages.spans import pair_spans, suffix_array_bytes, lcp_kasai


def _longest_match(a: str, b: str) -> int:
    m = SequenceMatcher(None, a, b, autojunk=False)
    return m.find_longest_match(0, len(a), 0, len(b)).size


def test_suffix_array_small():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array_bytes(s)
    # suffixes sorted: a(5), ana(3), anana(1), banana(0), na(4), nana(2)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    lcp = lcp_kasai(s, sa)
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


def test_pair_spans_exact_known():
    shared = "x" * 10 + "the quick brown fox jumps over the lazy dog " * 3
    a = "prefix one two three " + shared + " suffix alpha"
    b = "other start " + shared + " different tail"
    spans = pair_spans(a, b, min_len=70)
    assert spans, "planted span not found"
    best = max(s[2] for s in spans)
    assert best == _longest_match(a, b)
    # offsets actually point at identical bytes
    for a_start, b_start, length in spans:
        assert a.encode()[a_start : a_start + length] == b.encode()[b_start : b_start + length]


def test_pair_spans_no_false_positive():
    a = "completely different words here without overlap one"
    b = "nothing shared beyond tiny bits and bobs two"
    assert pair_spans(a, b, min_len=20) == []


def test_pair_spans_matches_difflib_on_random_pairs():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    for _ in range(25):
        base = " ".join(rng.choice(vocab, size=80))
        a_toks = base.split()
        b_toks = base.split()
        # perturb each side independently
        for toks in (a_toks, b_toks):
            for _ in range(rng.integers(1, 8)):
                toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        a, b = " ".join(a_toks), " ".join(b_toks)
        want = _longest_match(a, b)
        spans = pair_spans(a, b, min_len=10)
        got = max((s[2] for s in spans), default=0)
        if want >= 10:
            assert got == want, (a, b)
        else:
            assert got == 0 or got < 10


def test_substring_stage_on_fixture(ray_session, fixture_corpus):
    """Every planted substring pair in the synthetic corpus yields a span
    >= span_min_len when run through the distributed stage."""
    import ray.data as rd
    import pyarrow as pa

    from imagededupx_ray.functions.hashing import doc_id_of
    from imagededupx_ray.stages.spans import substring_spans

    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet").to_pandas()
    sub = tp[tp.kind == "substring"]
    assert len(sub) > 5
    pairs = []
    for _, r in sub.iterrows():
        ia, ib = doc_id_of(r.a_url), doc_id_of(r.b_url)
        pairs.append({"a": min(ia, ib), "b": max(ia, ib)})
    pages = pq.read_table(f"{fixture_corpus}/pages")
    docs = pa.table(
        {
            "doc_id": pa.array(
                [doc_id_of(u) for u in pages["url"].to_pylist()], type=pa.int64()
            ),
            "text": pages["text"],
        }
    )
    spans = substring_spans(
        rd.from_arrow(pa.Table.from_pylist(pairs)), rd.from_arrow(docs), CFG
    ).to_pandas()
    assert (spans.length >= CFG.span_min_len).all()
    found = {(r.a, r.b) for _, r in spans.iterrows()}
    for p in pairs:
        assert (p["a"], p["b"]) in found, "planted substring pair missing"


def test_span_join_equals_broadcast(ray_session, fixture_corpus):
    """The hash-join text-lookup path emits exactly the same span set as the
    broadcast path on the fixture pairs."""
    import ray.data as rd
    import pyarrow as pa

    from imagededupx_ray.functions.hashing import doc_id_of
    from imagededupx_ray.stages.spans import substring_spans, substring_spans_join

    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet").to_pandas()
    sub = tp[tp.kind == "substring"]
    pairs = []
    for _, r in sub.iterrows():
        ia, ib = doc_id_of(r.a_url), doc_id_of(r.b_url)
        pairs.append({"a": min(ia, ib), "b": max(ia, ib)})
    pages = pq.read_table(f"{fixture_corpus}/pages")
    docs = pa.table(
        {
            "doc_id": pa.array(
                [doc_id_of(u) for u in pages["url"].to_pylist()], type=pa.int64()
            ),
            "text": pages["text"],
        }
    )
    pairs_ds = rd.from_arrow(pa.Table.from_pylist(pairs))
    docs_ds = rd.from_arrow(docs)
    cols = ["a", "b", "a_start", "b_start", "length"]
    via_bcast = (
        substring_spans(pairs_ds, docs_ds, CFG)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    via_join = (
        substring_spans_join(pairs_ds, docs_ds, CFG)
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert via_bcast[cols].equals(via_join)


def _docs_ds(texts):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _spans_for(texts, pairs, min_len):
    import pyarrow as pa
    import ray.data as rd

    rows = {"a": [], "b": [], "a_start": [], "b_start": [], "length": []}
    for a, b in pairs:
        for sa, sb, ln in pair_spans(texts[a], texts[b], min_len):
            rows["a"].append(a)
            rows["b"].append(b)
            rows["a_start"].append(sa)
            rows["b_start"].append(sb)
            rows["length"].append(ln)
    return rd.from_arrow(
        pa.table({k: pa.array(v, type=pa.int64()) for k, v in rows.items()})
    )


def test_substring_cleanup_excises_higher_doc(ray_session):
    """ExactSubstr cleanup: the shared span disappears from the higher doc,
    stays in the lower doc, surrounding text survives, and a second pass
    removes nothing (idempotence at the same min_len)."""
    from imagededupx_ray.stages.spans import substring_cleanup

    shared = "the quick brown fox jumps over the lazy dog " * 4
    texts = [
        "alpha bravo " + shared + "charlie delta",
        "echo foxtrot " + shared + "golf hotel",
        "unrelated document with no duplicated content at all",
    ]
    min_len = 50
    spans = _spans_for(texts, [(0, 1)], min_len)
    out = (
        substring_cleanup(_docs_ds(texts), spans)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert shared in out.loc[0, "text"]  # canonical occurrence kept
    assert shared not in out.loc[1, "text"]
    assert out.loc[1, "text"].startswith("echo foxtrot")
    assert out.loc[1, "text"].endswith("golf hotel")
    assert out.loc[1, "n_spans_removed"] >= 1
    assert out.loc[1, "bytes_removed"] >= min_len
    assert out.loc[2, "text"] == texts[2]
    assert (out.loc[[0, 2], "bytes_removed"] == 0).all()

    # idempotence: re-mine spans on the cleaned corpus -> nothing long left
    cleaned = out["text"].tolist()
    again = _spans_for(cleaned, [(0, 1)], min_len).to_pandas()
    assert len(again) == 0


def test_substring_cleanup_merges_overlaps_and_keeps_utf8(ray_session):
    """Overlapping spans merge before excision (bytes_removed counts each
    byte once) and multibyte-unaligned span boundaries snap inward so the
    rewritten text stays valid UTF-8."""
    import pyarrow as pa
    import ray.data as rd

    from imagededupx_ray.stages.spans import substring_cleanup

    body = "ä" * 30 + "shared-middle-content-" * 5 + "ö" * 30
    texts = ["keeper " + body, "loser " + body]
    # two hand-built overlapping intervals on doc 1, deliberately starting
    # on a continuation byte of a 2-byte char
    enc = texts[1].encode("utf-8")
    start = texts[1].index("ä") * 1 + 7  # byte offset near the multibyte run
    spans = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([0, 0], type=pa.int64()),
                "b": pa.array([1, 1], type=pa.int64()),
                "a_start": pa.array([0, 0], type=pa.int64()),
                "b_start": pa.array([start + 1, start + 40], type=pa.int64()),
                "length": pa.array([60, 60], type=pa.int64()),
            }
        )
    )
    out = (
        substring_cleanup(_docs_ds(texts), spans)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t1 = out.loc[1, "text"]
    t1.encode("utf-8").decode("utf-8")  # valid round-trip
    assert out.loc[1, "n_spans_removed"] == 1  # merged into one interval
    # merged interval [start+1, start+100) snapped inward: <= 99 bytes
    assert 0 < out.loc[1, "bytes_removed"] <= 99
    assert len(t1.encode("utf-8")) == len(enc) - out.loc[1, "bytes_removed"]
    assert out.loc[0, "text"] == texts[0]
