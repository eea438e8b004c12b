"""Property-based gates (hypothesis) for the fourth-session text operators:
chunk reconstruction, packing conservation, PII idempotence, canonical-url
idempotence."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abcdefg0123456789", min_size=1, max_size=6),
    min_size=0,
    max_size=60,
)
_texts = st.lists(_words.map(" ".join), min_size=1, max_size=8)


def _write_docs(tmpdir, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        f"{tmpdir}/documents.parquet",
    )
    return tmpdir


@settings(max_examples=15, deadline=None)
@given(texts=_texts, chunk=st.integers(4, 20), overlap=st.integers(0, 3))
def test_chunks_reconstruct_token_stream(ray_session, tmp_path_factory, texts, chunk, overlap):
    from imagededupx_ray.functions.text import tokenize_batch
    from imagededupx_ray.queries import docs_chunk

    d = _write_docs(str(tmp_path_factory.mktemp("c")), texts)
    out = docs_chunk(d, chunk=chunk, overlap=overlap).to_pandas()
    flat, offsets = tokenize_batch(pa.array(texts))
    toks = flat.to_pylist()
    if len(out) == 0:
        assert not toks  # only an all-empty corpus yields zero chunks
        return
    for i, text in enumerate(texts):
        doc_toks = toks[offsets[i] : offsets[i + 1]]
        rows = out[out["doc_id"] == i].sort_values("chunk_idx")
        if not doc_toks:
            assert len(rows) == 0
            continue
        # stitching chunks (dropping each chunk's first `overlap` tokens
        # after the first chunk) reproduces the token stream exactly
        rebuilt = []
        for j, ct in enumerate(rows["chunk_text"]):
            ctoks = ct.split(" ") if ct else []
            rebuilt.extend(ctoks if j == 0 else ctoks[overlap:])
        assert rebuilt == doc_toks, (i, rebuilt, doc_toks)


@settings(max_examples=15, deadline=None)
@given(texts=_texts, budget=st.integers(1, 64))
def test_pack_bins_conserves_and_orders(ray_session, tmp_path_factory, texts, budget):
    from imagededupx_ray.queries import docs_pack_bins

    d = _write_docs(str(tmp_path_factory.mktemp("p")), texts)
    out = docs_pack_bins(d, budget=budget).to_pandas().sort_values("doc_id")
    cum = 0
    for _, row in out.iterrows():
        assert row["bin_id"] == cum // budget
        cum += row["n_tokens"]


@settings(max_examples=20, deadline=None)
@given(
    text=st.text(
        alphabet="abc@.0123456789-ù ", min_size=0, max_size=80
    )
)
def test_pii_scrub_idempotent(ray_session, tmp_path_factory, text):
    from imagededupx_ray.queries import docs_pii_scrub

    d = _write_docs(str(tmp_path_factory.mktemp("s")), [text])
    once = docs_pii_scrub(d).to_pandas().iloc[0]["clean_text"]
    d2 = _write_docs(str(tmp_path_factory.mktemp("s2")), [once])
    twice = docs_pii_scrub(d2).to_pandas().iloc[0]["clean_text"]
    assert once == twice


@settings(max_examples=30, deadline=None)
@given(
    url=st.text(
        alphabet="abcABC:/?.#&=_-0123456789", min_size=0, max_size=60
    )
)
def test_canonicalize_idempotent(url):
    from imagededupx_ray.stages.urlfilter import canonicalize_urls

    once = canonicalize_urls(pa.array([url], type=pa.string())).to_pylist()[0]
    twice = canonicalize_urls(pa.array([once], type=pa.string())).to_pylist()[0]
    assert once == twice, (url, once, twice)
