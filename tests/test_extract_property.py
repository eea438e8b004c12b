"""Property-based byte-identity of the vectorized extract path vs the frozen
scalar ``extract_text`` (SURVEY.md §7.4 per-row invariant), plus declared
schema conformance of the core stage outputs (schemas.py is enforced here)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from imagededupx_ray.functions.text import extract_text
from imagededupx_ray.stages.extract import extract_batch

# html-ish soup: tags, entities (standard + exotic), unicode, weird whitespace
_CHUNKS = st.sampled_from(
    [
        "<main>", "</main>", "<p>", "</p>", "<b>", "<nav>", "</nav>",
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&copy;", "&nbsp;", "&",
        "plain words ", "x", " ", "\t", "\n", "\x0b", "\x1c", "\x1f",
        "é", "汉", "🎉", "\xa0", "\x85", ".", "<", ">", "a&b",
    ]
)
_DOC = st.lists(_CHUNKS, min_size=0, max_size=40).map("".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_extract_batch_matches_scalar(docs):
    htmls = [d.encode("utf-8") for d in docs]
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(docs))], type=pa.string()),
            "warc_ts": pa.nulls(len(docs), pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array([""] * len(docs), type=pa.string()),
            "lang": pa.array(["en"] * len(docs), type=pa.string()),
        }
    )
    got = extract_batch(batch)["text"].to_pylist()
    want = [extract_text(h) for h in htmls]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_extract_batch_handles_arbitrary_bytes(payload):
    """Invalid utf-8 must fall back to the scalar path, still byte-identical."""
    batch = pa.table(
        {
            "url": pa.array(["u0"], type=pa.string()),
            "warc_ts": pa.nulls(1, pa.timestamp("us")),
            "html": pa.array([payload], type=pa.binary()),
            "text": pa.array([""], type=pa.string()),
            "lang": pa.array(["en"], type=pa.string()),
        }
    )
    assert extract_batch(batch)["text"].to_pylist() == [extract_text(payload)]


def test_stage_schemas_conform(ray_session, fixture_corpus):
    """Actual stage outputs match the declared schemas (ADVICE: schemas.py
    was drifting; this pins it)."""
    import ray.data as rd

    from imagededupx_ray import schemas as S
    from imagededupx_ray.pipelines.dedup import run_dedup

    res = run_dedup(rd.read_parquet(f"{fixture_corpus}/pages"))
    docs_tbl = next(iter(res.docs_unique.iter_batches(batch_size=8, batch_format="pyarrow")))
    for field in S.DOCS:
        assert field.name in docs_tbl.column_names, field.name
        assert docs_tbl.schema.field(field.name).type == field.type, field.name
    cl_tbl = next(iter(res.clusters.iter_batches(batch_size=8, batch_format="pyarrow")))
    assert cl_tbl.select([f.name for f in S.CLUSTERS]).schema == S.CLUSTERS
    vp_tbl = next(iter(res.verified_pairs.iter_batches(batch_size=8, batch_format="pyarrow")))
    assert vp_tbl.select([f.name for f in S.VERIFIED_PAIRS]).schema == S.VERIFIED_PAIRS
    cp_tbl = next(iter(res.cand_pairs.iter_batches(batch_size=8, batch_format="pyarrow")))
    for f in S.CAND_PAIRS:
        assert cp_tbl.schema.field(f.name).type == f.type


@settings(max_examples=150, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_native_extract_matches_pyarrow_path(docs):
    """The C extract kernel and the pyarrow.compute chain must agree on both
    the slow-row routing and the fast-path output (ASCII inputs; non-ASCII is
    pre-routed to the scalar path before either kernel runs)."""
    import pyarrow.compute as pc

    from imagededupx_ray.stages.extract import (
        _combine,
        _extract_native,
        _extract_vectorized,
    )

    ascii_docs = [d.encode("ascii", "ignore").decode("ascii") for d in docs]
    doc = pa.array(ascii_docs, type=pa.string())
    nat = _extract_native(doc)
    if nat is None:  # no C compiler: nothing to compare
        return
    n_txt, n_slow = nat
    v_txt, v_slow = _extract_vectorized(doc)
    v_txt = _combine(v_txt)
    assert np.array_equal(np.asarray(n_slow), np.asarray(v_slow))
    for i in range(len(ascii_docs)):
        if not v_slow[i]:
            assert n_txt[i].as_py() == v_txt[i].as_py(), repr(ascii_docs[i])
