"""Cross-snapshot duplicate attribution (stages/dedup.snapshot_dup_attribution):
exact DuckDB window twin on random assignments, blocking-independence, and
the planted-truth driver component over the synthetic multi-snapshot crawl."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TWIN_SQL = """
WITH cl AS (
  SELECT cluster_id,
         count(*) AS sz,
         count(DISTINCT snapshot) AS ns
  FROM t GROUP BY cluster_id
)
SELECT t.snapshot,
       count(*) AS n_docs,
       sum(CASE WHEN cl.sz > 1 THEN 1 ELSE 0 END) AS n_dup_docs,
       sum(CASE WHEN cl.ns > 1 THEN 1 ELSE 0 END) AS n_cross_dup_docs
FROM t JOIN cl USING (cluster_id)
GROUP BY t.snapshot ORDER BY t.snapshot
"""


def _random_assign(rng, n=4000, n_clusters=900, n_snaps=4) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "cluster_id": rng.integers(0, n_clusters, size=n, dtype=np.int64),
            "snapshot": rng.integers(0, n_snaps, size=n, dtype=np.int64),
        }
    )


def _run(df: pd.DataFrame, n_blocks: int = 1) -> pd.DataFrame:
    import ray.data as rd

    from imagededupx_ray.stages.dedup import snapshot_dup_attribution

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if n_blocks > 1:
        ds = ds.repartition(n_blocks)
    out = snapshot_dup_attribution(ds).to_pandas()
    return (
        out.sort_values("snapshot")
        .reset_index(drop=True)
        .astype({"n_docs": np.int64, "n_dup_docs": np.int64, "n_cross_dup_docs": np.int64})
    )


def test_matches_duckdb_window_twin(ray_session):
    rng = np.random.default_rng(23)
    t = _random_assign(rng)
    got = _run(t)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(TWIN_SQL).df().astype(
        {"n_docs": np.int64, "n_dup_docs": np.int64, "n_cross_dup_docs": np.int64}
    )
    pd.testing.assert_frame_equal(got, want)


def test_blocking_independent(ray_session):
    rng = np.random.default_rng(29)
    t = _random_assign(rng, n=2500, n_clusters=400)
    a = _run(t, n_blocks=1)
    b = _run(t, n_blocks=11)
    pd.testing.assert_frame_equal(a, b)


def test_singleton_clusters_are_never_dup(ray_session):
    t = pd.DataFrame(
        {
            "cluster_id": np.arange(50, dtype=np.int64),
            "snapshot": np.arange(50, dtype=np.int64) % 3,
        }
    )
    got = _run(t)
    assert int(got["n_dup_docs"].sum()) == 0
    assert int(got["n_cross_dup_docs"].sum()) == 0
    assert int(got["n_docs"].sum()) == 50


def test_driver_component_planted_truth(ray_session):
    """pages_snapshot_dup_report over the synthetic crawl: the generator's
    snapshot planting (last member of every >=3 group -> snapshot 1) makes
    every snapshot-1 dup cross-snapshot, while snapshot 0 keeps
    within-snapshot (2-member) dups as well."""
    from imagededupx_ray.queries import _component_ok, pages_snapshot_dup_report

    df = pages_snapshot_dup_report("/root/testdata/sf0.001", n=900, seed=8)
    assert _component_ok("pages_snapshot_dup_report", df)
    r = df.set_index("snapshot")
    assert int(r.loc[1, "n_cross_dup_docs"]) == int(r.loc[1, "n_dup_docs"]) > 0
    assert 0 < int(r.loc[0, "n_cross_dup_docs"]) < int(r.loc[0, "n_dup_docs"])
    assert int(df["n_docs"].sum()) == 900
