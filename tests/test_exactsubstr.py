"""Corpus-level ExactSubstr cleanup (stages/exactsubstr.py): O(n) rolling
hash exactness, content-defined anchor alignment, planted boilerplate
excision across unrelated docs, intra-doc repetition, and no false
positives on a unique corpus."""

import numpy as np
import pyarrow as pa
import pytest

from imagededupx_ray.stages.exactsubstr import (
    _P1,
    _P2,
    rolling_hashes,
    winnow_anchor_positions,
)


def test_rolling_hash_equals_direct():
    rng = np.random.default_rng(5)
    for n, W in [(40, 8), (500, 16), (2000, 64)]:
        data = rng.integers(0, 256, n, dtype=np.uint8)
        for p in (_P1, _P2):
            H = rolling_hashes(data, W, p)
            with np.errstate(over="ignore"):
                pw = np.array(
                    [pow(int(p), k, 1 << 64) for k in range(W)][::-1],
                    dtype=np.uint64,
                )
                direct = (
                    np.lib.stride_tricks.sliding_window_view(data, W).astype(
                        np.uint64
                    )
                    * pw
                ).sum(axis=1, dtype=np.uint64)
            assert np.array_equal(H, direct), (n, W)
    assert len(rolling_hashes(np.empty(0, np.uint8), 8, _P1)) == 0
    assert len(rolling_hashes(rng.integers(0, 256, 5, dtype=np.uint8), 8, _P1)) == 0


def test_winnow_anchor_guarantee():
    """Every w-window of hashes contributes an anchor: consecutive anchors
    are never more than w apart."""
    rng = np.random.default_rng(6)
    h = rng.integers(0, 1 << 63, 5000, dtype=np.uint64)
    w = 32
    an = winnow_anchor_positions(h, w)
    assert an[0] < w
    assert (np.diff(an) <= w).all()
    assert an[-1] >= len(h) - w


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _rand_text(rng, n_tokens):
    return " ".join(f"w{rng.integers(0, 50000)}" for _ in range(n_tokens))


def test_corpus_cleanup_planted_boilerplate(ray_session):
    """A boilerplate paragraph planted in 3 otherwise-unrelated docs (which
    share NO near-dup relationship) survives only in the lowest doc_id."""
    from imagededupx_ray.stages.exactsubstr import corpus_substring_cleanup

    rng = np.random.default_rng(7)
    # internally non-repetitive (an internally repeated paragraph would
    # correctly lose its own later repetitions even in the keeper doc)
    boiler = " ".join(f"boiler{i}" for i in range(40))
    texts = [_rand_text(rng, 80) for _ in range(12)]
    for i in (2, 5, 9):
        texts[i] = texts[i][:200] + boiler + texts[i][200:]

    out = (
        corpus_substring_cleanup(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert boiler in out.loc[2, "text"]  # canonical occurrence kept
    for i in (5, 9):
        assert boiler not in out.loc[i, "text"]
        # winnowing slack: at most W + w - 1 bytes survive at the edges
        assert out.loc[i, "bytes_removed"] >= len(boiler) - (64 + 32 - 1)
    untouched = [i for i in range(12) if i not in (5, 9)]
    assert (out.loc[untouched, "bytes_removed"] == 0).all()
    for i in untouched:
        assert out.loc[i, "text"] == texts[i]

    # determinism
    out2 = (
        corpus_substring_cleanup(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_corpus_cleanup_intra_doc_repeat(ray_session):
    """A long run repeated INSIDE one doc keeps only its first occurrence."""
    from imagededupx_ray.stages.exactsubstr import corpus_substring_cleanup

    rng = np.random.default_rng(8)
    chunk = "repeated block of content that appears twice in this doc " * 4
    texts = [
        _rand_text(rng, 60),
        _rand_text(rng, 30) + " " + chunk + _rand_text(rng, 30) + " " + chunk,
    ]
    out = (
        corpus_substring_cleanup(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = out.loc[1, "text"]
    assert t.count(chunk) <= 1
    assert out.loc[1, "bytes_removed"] >= len(chunk) - (64 + 32 - 1)
    assert out.loc[0, "bytes_removed"] == 0


def test_corpus_cleanup_no_false_positives(ray_session):
    """A corpus of unique random docs loses nothing."""
    from imagededupx_ray.stages.exactsubstr import corpus_substring_cleanup

    rng = np.random.default_rng(9)
    texts = [_rand_text(rng, 120) for _ in range(20)]
    out = corpus_substring_cleanup(_docs(texts)).to_pandas()
    assert (out["bytes_removed"] == 0).all()
    assert (out["n_spans_removed"] == 0).all()


def test_corpus_cleanup_property_no_long_repeats_survive(ray_session):
    """Property gate: after cleanup, no W+2w-byte run appears twice across
    the corpus (interior coverage of the winnowing guarantee; the planted
    repeats have random lengths and byte offsets)."""
    from imagededupx_ray.stages.exactsubstr import corpus_substring_cleanup

    rng = np.random.default_rng(17)
    W, w = 64, 32
    texts = [_rand_text(rng, rng.integers(40, 160)) for _ in range(15)]
    # plant 4 repeated regions at random spots in random doc pairs
    for r in range(4):
        region = " ".join(f"rep{r}x{i}" for i in range(rng.integers(25, 60)))
        i, j = rng.choice(15, size=2, replace=False)
        pi = rng.integers(0, max(1, len(texts[i]) - 1))
        pj = rng.integers(0, max(1, len(texts[j]) - 1))
        texts[i] = texts[i][:pi] + " " + region + " " + texts[i][pi:]
        texts[j] = texts[j][:pj] + " " + region + " " + texts[j][pj:]

    out = (
        corpus_substring_cleanup(_docs(texts), window_bytes=W, winnow_w=w)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    L = W + 2 * w
    seen: dict[bytes, tuple[int, int]] = {}
    dupes = []
    for did, t in enumerate(out["text"].tolist()):
        data = t.encode("utf-8")
        for s in range(0, max(0, len(data) - L + 1)):
            k = data[s : s + L]
            prev = seen.get(k)
            if prev is not None and prev[0] != did:
                dupes.append((prev, (did, s)))
            elif prev is None:
                seen[k] = (did, s)
    assert not dupes, dupes[:3]
    assert (out["bytes_removed"] > 0).sum() >= 4  # every planted pair hit
