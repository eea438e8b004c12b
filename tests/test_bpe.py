"""BPE subword tokenizer (stages/bpe.py): trainer parity vs an independent
naive oracle, blocking invariance of the distributed word counts, classic
textbook example, encode round-trip, and empty/edge docs."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _naive_train(word_counts: dict, n_merges: int):
    """Independent oracle: full pair recount every iteration (Sennrich et
    al. 2016, the pseudocode form)."""
    seqs = {w: tuple(list(w) + ["▁"]) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, seq in seqs.items():
            c = word_counts[w]
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out = {}
        for w, seq in seqs.items():
            ns, j = [], 0
            while j < len(seq):
                if j < len(seq) - 1 and (seq[j], seq[j + 1]) == best:
                    ns.append(seq[j] + seq[j + 1])
                    j += 2
                else:
                    ns.append(seq[j])
                    j += 1
            out[w] = tuple(ns)
        seqs = out
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the newest gadget is the widest",
]


def test_trainer_matches_naive_oracle():
    from imagededupx_ray.stages.bpe import bpe_train_from_counts

    wc = {}
    for t in CORPUS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    words = sorted(wc)
    counts = [wc[w] for w in words]
    got = bpe_train_from_counts(words, counts, 30)
    want = _naive_train(wc, 30)
    assert got == want


def test_train_blocking_invariance(ray_session):
    from imagededupx_ray.stages.bpe import bpe_train

    m1 = bpe_train(_docs_ds(CORPUS, blocks=1), n_merges=20)
    m3 = bpe_train(_docs_ds(CORPUS, blocks=3), n_merges=20)
    assert m1 == m3 and len(m1) == 20


def test_textbook_first_merges(ray_session):
    """'newest' dominates: the first merges build its subwords; 'est▁'
    emerges as a suffix unit shared with 'widest'."""
    from imagededupx_ray.stages.bpe import bpe_train

    merges = bpe_train(_docs_ds(CORPUS), n_merges=12)
    syms = {a + b for a, b in merges}
    assert "est▁" in syms or ("est" in syms and "st▁" in syms)


def test_encode_roundtrip_and_segmentation(ray_session):
    from imagededupx_ray.functions.text import normalize_one
    from imagededupx_ray.stages.bpe import bpe_encode, bpe_train

    texts = CORPUS + ["", "  ", "Unsegmentable-QZX!7 tokens"]
    ds = _docs_ds(texts, blocks=2)
    merges = bpe_train(ds, n_merges=25)
    out = (
        bpe_encode(ds, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(texts)
    for i, t in enumerate(texts):
        toks = out.loc[i, "tokens"]
        norm = normalize_one(t)
        joined = "".join(toks).replace("▁", " ").rstrip()
        assert joined == norm, (t, list(toks))
        if norm:
            assert out.loc[i, "n_tokens"] == len(toks) > 0
            # every word ends at an end-of-word marker
            assert "".join(toks).count("▁") == len(norm.split(" "))
        else:
            assert out.loc[i, "n_tokens"] == 0


def test_encode_compresses_frequent_words(ray_session):
    """Frequent whole words become single tokens: 'newest' encodes to one
    symbol after enough merges, rare words stay multi-token."""
    from imagededupx_ray.stages.bpe import bpe_encode, bpe_train

    ds = _docs_ds(CORPUS)
    merges = bpe_train(ds, n_merges=60)
    enc = (
        bpe_encode(_docs_ds(["newest", "gadget"]), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert enc.loc[0, "n_tokens"] == 1  # newest▁ fully merged
    assert enc.loc[1, "n_tokens"] >= 1


def test_vocab_contents():
    from imagededupx_ray.stages.bpe import bpe_train_from_counts, bpe_vocab
    import pandas as pd

    wc = pd.DataFrame({"word": ["ab", "abc"], "n": [3, 2]})
    merges = bpe_train_from_counts(wc["word"].tolist(), wc["n"].to_numpy(), 5)
    vocab = bpe_vocab(merges, wc)
    assert "▁" in vocab and "a" in vocab and "b" in vocab
    assert all(a + b in vocab for a, b in merges)


def test_cli_bpe_verb(ray_session, tmp_path, capsys):
    """bpe CLI: train on a documents parquet, write merges + tokens, and
    the report's vocab accounting holds."""
    import glob
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from imagededupx_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
                "text": pa.array(CORPUS, type=pa.string()),
            }
        ),
        src,
    )
    out = str(tmp_path / "bpe")
    assert (
        main(["bpe", "--input", src, "--output", out, "--merges", "40", "--encode"])
        == 0
    )
    rep = json.loads(capsys.readouterr().out.splitlines()[-1])
    # the tiny corpus exhausts its pair supply before 40 merges (every
    # word fully merged) — the trainer stops early rather than padding
    assert 0 < rep["n_merges"] <= 40
    merges = pq.read_table(out + "/merges.parquet").to_pandas()
    assert len(merges) == rep["n_merges"]
    assert list(merges.columns) == ["rank", "left", "right"]
    toks = pq.read_table(glob.glob(out + "/tokens/*.parquet"))
    assert toks.num_rows == len(CORPUS)
    base_chars = set("".join(CORPUS).replace(" ", "")) | {"▁"}
    assert rep["vocab_size"] == rep["n_merges"] + len(base_chars)


# ---- property gates (driver-side kernels, no Ray session) ----------------
from hypothesis import given, settings, strategies as st

# unicode-heavy word alphabet; excludes whitespace (the tokenizer's split
# key) and the end-of-word marker U+2581 (the documented input contract)
_WORD = st.text(
    alphabet=st.sampled_from(list("abcdeéü汉字🎉x7-&.") ),
    min_size=1,
    max_size=12,
)
_CORPUS = st.lists(
    st.tuples(_WORD, st.integers(min_value=1, max_value=50)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(_CORPUS)
def test_property_trainer_matches_naive(pairs):
    from imagededupx_ray.stages.bpe import bpe_train_from_counts

    wc = {}
    for w, c in pairs:
        wc[w] = wc.get(w, 0) + c
    words = sorted(wc)
    got = bpe_train_from_counts(words, [wc[w] for w in words], 15)
    assert got == _naive_train(wc, 15)


@settings(max_examples=150, deadline=None)
@given(_CORPUS, st.integers(min_value=0, max_value=40))
def test_property_encode_roundtrip(pairs, n_merges):
    """Every word re-assembles exactly from its subwords regardless of how
    many merges were learned — BPE is lossless by construction."""
    from imagededupx_ray.stages.bpe import _encode_word, bpe_train_from_counts

    wc = {}
    for w, c in pairs:
        wc[w] = wc.get(w, 0) + c
    words = sorted(wc)
    merges = bpe_train_from_counts(words, [wc[w] for w in words], n_merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in words:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + "▁", (w, toks)
