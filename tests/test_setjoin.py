"""Prefix-filter set-similarity join (stages/setjoin.py) must be
value-identical to the exhaustive tiled miner at any threshold — the
subquadratic exact engine behind ``shingle_jaccard_pairs(engine="prefix")``
(reference exact-Jaccard semantics:
/root/reference/similarities/similarities/utils/distance.py:129-134,
computed there in an O(n^2) loop)."""

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _canon(ds):
    df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return df


@pytest.mark.parametrize("thr", [0.3, 0.6, 0.8, 0.95])
def test_prefix_join_equals_tiled(ray_session, thr):
    from imagededupx_ray import queries as Q

    t = _canon(Q.shingle_jaccard_pairs(SF_DIR, threshold=thr, engine="tiled"))
    p = _canon(Q.shingle_jaccard_pairs(SF_DIR, threshold=thr, engine="prefix"))
    assert len(t) == len(p)
    assert (t["a"].values == p["a"].values).all()
    assert (t["b"].values == p["b"].values).all()
    assert np.allclose(t["jaccard"].values, p["jaccard"].values, atol=1e-9)


def test_set_similarity_join_synthetic(ray_session):
    """Planted pairs on a hand-built sets table: identical sets, a
    just-above-threshold pair, disjoint sets, and a near-miss sharing only a
    few rare elements (the case the q-extended count filter prunes early but
    must NOT drop when it actually qualifies)."""
    import ray.data as rd

    from imagededupx_ray.stages.setjoin import set_similarity_join

    rng = np.random.default_rng(7)
    base = rng.choice(10**6, size=100, replace=False).astype(np.int64)
    other = rng.choice(10**6, size=100, replace=False).astype(np.int64) + 10**7
    sets = {
        1: np.sort(base),
        2: np.sort(base),  # J(1,2) = 1.0
        3: np.sort(np.concatenate([base[:90], other[:10]])),  # J(1,3)=90/110
        4: np.sort(other),  # disjoint from 1/2
        5: np.sort(np.concatenate([base[:5], other[10:100]])),  # J(4,5)=90/105
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(sets), type=pa.int64()),
            "toks": pa.array([v.tolist() for v in sets.values()],
                             type=pa.list_(pa.int64())),
        }
    )
    res = set_similarity_join(rd.from_arrow(tbl), 0.8).to_pandas()
    got = {(int(r.a), int(r.b)): float(r.jaccard) for r in res.itertuples()}
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 3)] - 90 / 110) < 1e-9
    assert abs(got[(2, 3)] - 90 / 110) < 1e-9
    assert abs(got[(4, 5)] - 90 / 105) < 1e-9
    assert set(got) == {(1, 2), (1, 3), (2, 3), (4, 5)}

    # drop the threshold so the near-miss (1,5) qualifies: J(1,5)=5/190
    res2 = set_similarity_join(rd.from_arrow(tbl), 0.02).to_pandas()
    got2 = {(int(r.a), int(r.b)): float(r.jaccard) for r in res2.itertuples()}
    assert abs(got2[(1, 5)] - 5 / 190) < 1e-9
