"""ICWS weighted minhash + tf-weighted jaccard dup mining (stages/wminhash.py).

Gates:
- kernel: ICWS sample agreement is an unbiased estimate of the weighted
  jaccard (Ioffe 2010), including the exact identity J_w(A, 2A) = 1/2;
  deterministic; sentinel rows for empty docs;
- bag-expansion reduction: unweighted jaccard over the (token, 1..tf)
  expansion EQUALS the weighted jaccard (pure-python exact check);
- engines: icws (LSH candidates + exact verify) returns a value-identical
  SUBSET of exact (bag-expansion PPJoin), with full recall on pairs
  comfortably above threshold;
- DuckDB twin: every returned pair's wjaccard matches the exact SQL
  weighted jaccard over the same tokenization, and every SQL pair above
  threshold + margin is found (margin kills the 2e-8-per-band-set tail).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from imagededupx_ray.functions.wminhash import doc_token_tf, icws_matrix


def _wjac(d1: dict, d2: dict) -> float:
    keys = set(d1) | set(d2)
    mn = sum(min(d1.get(k, 0), d2.get(k, 0)) for k in keys)
    mx = sum(max(d1.get(k, 0), d2.get(k, 0)) for k in keys)
    return mn / mx


def test_icws_estimator_unbiased():
    rng = np.random.default_rng(0)
    K = 256
    errs = []
    for trial in range(40):
        n = 120
        toks = rng.choice(np.arange(1, 10**6), size=n, replace=False).astype(np.uint64)
        tf1 = rng.integers(1, 8, n).astype(np.int64)
        tf2 = tf1.copy()
        mod = rng.random(n) < 0.4
        tf2[mod] = rng.integers(0, 8, int(mod.sum()))
        keep2 = tf2 > 0
        d1 = dict(zip(toks.tolist(), tf1.tolist()))
        d2 = dict(zip(toks[keep2].tolist(), tf2[keep2].tolist()))
        true_j = _wjac(d1, d2)
        flat_tok = np.concatenate([toks, toks[keep2]])
        flat_tf = np.concatenate([tf1, tf2[keep2]]).astype(np.float64)
        counts = np.array([n, int(keep2.sum())], dtype=np.int64)
        M = icws_matrix(flat_tok, flat_tf, counts, K, seed=trial)
        errs.append(float((M[0] == M[1]).mean()) - true_j)
    e = np.array(errs)
    assert abs(e.mean()) < 0.015, f"bias {e.mean():+.4f}"
    assert e.std() < 0.06


def test_icws_doubled_weights_half_jaccard():
    """J_w(A, 2A) = sum(w)/sum(2w) = 1/2 exactly — the weighted identity an
    unweighted minhash cannot express (set jaccard would be 1)."""
    rng = np.random.default_rng(1)
    K = 256
    agree = []
    for trial in range(40):
        n = 100
        toks = rng.choice(np.arange(1, 10**6), size=n, replace=False).astype(np.uint64)
        tf = rng.integers(1, 6, n).astype(np.float64)
        flat_tok = np.concatenate([toks, toks])
        flat_tf = np.concatenate([tf, 2 * tf])
        counts = np.array([n, n], dtype=np.int64)
        M = icws_matrix(flat_tok, flat_tf, counts, K, seed=100 + trial)
        agree.append(float((M[0] == M[1]).mean()))
    m = float(np.mean(agree))
    assert abs(m - 0.5) < 0.02, m


def test_icws_deterministic_and_sentinel():
    from imagededupx_ray.functions.hashing import _EMPTY_SENTINEL

    toks = np.array([3, 4, 5], dtype=np.uint64)
    tf = np.array([1.0, 2.0, 3.0])
    counts = np.array([3, 0], dtype=np.int64)
    a = icws_matrix(toks, tf, counts, 64, seed=9)
    b = icws_matrix(toks, tf, counts, 64, seed=9)
    assert np.array_equal(a, b)
    assert (a[1] == _EMPTY_SENTINEL).all()
    assert not (a[0] == _EMPTY_SENTINEL).any()


def test_bag_expansion_equals_weighted_jaccard():
    """Unweighted jaccard over the (token, level) expansion == weighted
    jaccard with integer tfs — the reduction both engines' verify uses."""
    rng = np.random.default_rng(2)
    from imagededupx_ray.stages.wminhash import _expand_bag

    for _ in range(30):
        n = 30
        toks = rng.choice(np.arange(1, 10**5), size=n, replace=False).astype(np.uint64)
        tf1 = rng.integers(1, 5, n).astype(np.int64)
        tf2 = rng.integers(0, 5, n).astype(np.int64)
        k2 = tf2 > 0
        e1, _ = _expand_bag(toks, tf1, np.array([n], dtype=np.int64))
        e2, _ = _expand_bag(toks[k2], tf2[k2], np.array([int(k2.sum())], dtype=np.int64))
        s1, s2 = set(e1.tolist()), set(e2.tolist())
        j_set = len(s1 & s2) / len(s1 | s2)
        d1 = dict(zip(toks.tolist(), tf1.tolist()))
        d2 = dict(zip(toks[k2].tolist(), tf2[k2].tolist()))
        assert abs(j_set - _wjac(d1, d2)) < 1e-12


_SF = "/root/testdata/sf0.001"
_THR = 0.5


@pytest.fixture(scope="module")
def wpairs(ray_session):
    from imagededupx_ray.queries import docs_weighted_dup_pairs

    return docs_weighted_dup_pairs(_SF, threshold=_THR).to_pandas()


@pytest.fixture(scope="module")
def exact_pairs(ray_session):
    from imagededupx_ray.queries import _read
    from imagededupx_ray.stages.wminhash import weighted_dup_pairs

    return weighted_dup_pairs(
        _read(_SF, "documents"), threshold=_THR, engine="exact"
    ).to_pandas()


@pytest.fixture(scope="module")
def sql_pairs():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{_SF}/documents.parquet')"
    )
    return con.execute(
        "WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), "
        "'\\s+')) AS token FROM documents WHERE length(trim(text)) > 0), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token), "
        "tot AS (SELECT doc_id, SUM(tf) AS total FROM tf GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS a, b.doc_id AS b, SUM(LEAST(a.tf, b.tf)) AS i "
        "FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT i.a, i.b, CAST(i.i AS DOUBLE) / (ta.total + tb.total - i.i) AS wj "
        "FROM inter i JOIN tot ta ON ta.doc_id = i.a JOIN tot tb ON tb.doc_id = i.b"
    ).df()


def test_exact_engine_matches_duckdb(exact_pairs, sql_pairs):
    """The bag-expansion PPJoin engine is COMPLETE: exactly the SQL pairs
    >= threshold, with equal wjaccard values."""
    want = sql_pairs[sql_pairs.wj >= _THR].sort_values(["a", "b"]).reset_index(drop=True)
    got = exact_pairs.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(want) > 20, "fixture must plant weighted-dup structure"
    assert len(got) == len(want), (len(got), len(want))
    assert (got.a.values == want.a.values).all()
    assert (got.b.values == want.b.values).all()
    assert np.allclose(got.wjaccard.values, want.wj.values, atol=1e-6)


def test_icws_engine_subset_and_recall(wpairs, exact_pairs, sql_pairs):
    """The icws engine returns a value-identical subset of exact, and full
    recall on pairs >= threshold + 0.15 (band-miss probability ~2e-8)."""
    key = lambda df, ja, jb: set(zip(df[ja].astype(int), df[jb].astype(int)))
    got = key(wpairs, "a", "b")
    full = key(exact_pairs, "a", "b")
    assert got <= full
    # value equality on the intersection
    m = wpairs.merge(exact_pairs, on=["a", "b"], suffixes=("_i", "_e"))
    assert np.allclose(m.wjaccard_i.values, m.wjaccard_e.values, atol=1e-9)
    hi = sql_pairs[sql_pairs.wj >= _THR + 0.15]
    assert len(hi) > 10
    hi_set = set(zip(hi.a.astype(int), hi.b.astype(int)))
    assert hi_set <= got, f"missed {len(hi_set - got)} high-J_w pairs"


def test_suite_component_ok(wpairs):
    from imagededupx_ray.queries import _component_ok

    assert _component_ok("docs_weighted_dup_pairs", wpairs)
