"""Soft dedup (stages/dedup.softdedup_weights): 1/|cluster| training
weights from any (id, cluster) assignment — DuckDB window-COUNT twin,
blocking invariance, and end-to-end identities over the flagship clusters."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _assignment_ds(df: pd.DataFrame, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(df["doc_id"], type=pa.int64()),
                "cluster_id": pa.array(df["cluster_id"], type=pa.int64()),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def test_softdedup_matches_duckdb_window_count(ray_session):
    """weights == 1.0 / COUNT(*) OVER (PARTITION BY cluster_id), any blocking."""
    from imagededupx_ray.stages.dedup import softdedup_weights

    rng = np.random.default_rng(13)
    n = 500
    # skewed cluster sizes: one mega-cluster, several mid, many singletons
    cl = rng.choice([0, 1, 2, 3] + list(range(10, 300)), size=n)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "cluster_id": cl})
    con = duckdb.connect()
    con.register("assign", df)
    want = con.execute(
        "SELECT doc_id, cluster_id, "
        "COUNT(*) OVER (PARTITION BY cluster_id) AS n_members, "
        "1.0 / COUNT(*) OVER (PARTITION BY cluster_id) AS weight "
        "FROM assign ORDER BY cluster_id, doc_id"
    ).df()
    for blocks in (1, 7):
        got = (
            softdedup_weights(_assignment_ds(df, blocks))
            .to_pandas()
            .sort_values(["cluster_id", "doc_id"])
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["n_members"].tolist() == want["n_members"].tolist()
        assert np.allclose(got["weight"], want["weight"])


def test_softdedup_planted_identities(ray_session):
    """Each community contributes exactly one doc-equivalent: per-cluster
    weight sum == 1, total weight == number of clusters, singletons keep 1.0."""
    from imagededupx_ray.stages.dedup import softdedup_weights

    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "cluster_id": np.array([0, 0, 0, 0, 1, 1, 2, 3, 4, 5]),
        }
    )
    out = softdedup_weights(_assignment_ds(df)).to_pandas()
    per = out.groupby("cluster_id")["weight"].sum()
    assert np.allclose(per, 1.0)
    assert np.isclose(out["weight"].sum(), 6.0)
    singles = out[out["n_members"] == 1]
    assert (singles["weight"] == 1.0).all() and len(singles) == 4


def test_docs_softdedup_weights_query(ray_session):
    """End-to-end over sf0.001 documents: every doc weighted, identities
    hold, and real duplicate communities (weight < 1) exist."""
    from imagededupx_ray.queries import docs_softdedup_weights

    out = docs_softdedup_weights("/root/testdata/sf0.001")
    assert out["doc_id"].is_unique
    assert np.allclose(out["weight"] * out["n_members"], 1.0)
    n_clusters = out["cluster_id"].nunique()
    assert np.isclose(out["weight"].sum(), n_clusters)
    assert (out["n_members"] > 1).any(), "corpus plants duplicate groups"
