"""Fixture generator invariants (FIXTURES.md F1)."""

import collections

import pyarrow.parquet as pq

from imagededupx_ray.functions.text import extract_text
from imagededupx_ray.sources.synthetic import generate_pages


def test_generator_deterministic_and_invariant():
    p1, tp1, tc1 = generate_pages(400, seed=42)
    p2, tp2, tc2 = generate_pages(400, seed=42)
    assert p1.equals(p2) and tp1.equals(tp2) and tc1.equals(tc2)
    for h, t in zip(p1["html"].to_pylist(), p1["text"].to_pylist()):
        assert extract_text(h) == t  # byte-identical per-row invariant
    assert len(set(p1["url"].to_pylist())) == 400  # urls unique


def test_generator_planted_structure():
    pages, tp, tc = generate_pages(1000, seed=42)
    kinds = collections.Counter(tp["kind"].to_pylist())
    assert kinds["exact"] > 0 and kinds["near"] > 0
    assert kinds["substring"] > 0 and kinds["boiler"] > 0
    df = tp.to_pandas()
    assert (df[df.kind == "exact"].jaccard_5gram == 1.0).all()
    assert df[df.kind == "near"].jaccard_5gram.min() < 0.7 < df[df.kind == "near"].jaccard_5gram.max()
    snaps = collections.Counter(pages["snapshot"].to_pylist())
    assert 0 < snaps[1] < snaps[0]


def test_corpus_on_disk(fixture_corpus):
    pages = pq.read_table(f"{fixture_corpus}/pages")
    assert pages.num_rows == 1200
    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet")
    assert tp.num_rows > 0
