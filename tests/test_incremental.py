"""Incremental equivalence (SURVEY.md §5.2 item 4): build(A) then merge(B)
must produce the same cluster partition as build(A ∪ B); config-hash
mismatch must refuse to resume; only never-seen texts are re-signed."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from imagededupx_ray.config import DEFAULT_CONFIG as CFG, DedupConfig


def _partition_of(df: pd.DataFrame) -> dict:
    """url → frozenset of cluster members (partition comparison is invariant
    to cluster-id labeling)."""
    groups = df.groupby("cluster_id")["url"].apply(frozenset)
    return {u: g for g in groups for u in g}


@pytest.fixture(scope="module")
def snapshots(ray_session, fixture_corpus, tmp_path_factory):
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    snap0 = pages.filter(expr="snapshot == 0")
    snap1 = pages.filter(expr="snapshot == 1")

    root_inc = str(tmp_path_factory.mktemp("store_inc"))
    root_full = str(tmp_path_factory.mktemp("store_full"))
    store_inc = SnapshotStore(root_inc, CFG)
    store_full = SnapshotStore(root_full, CFG)

    build_snapshot(store_inc, snap0, "a", cfg=CFG)
    cl_merged = build_snapshot(store_inc, snap1, "b", parent="a", cfg=CFG).to_pandas()
    cl_full = build_snapshot(store_full, pages, "ab", cfg=CFG).to_pandas()
    return store_inc, store_full, cl_merged, cl_full


def test_incremental_equals_full(snapshots):
    _, _, cl_merged, cl_full = snapshots
    assert len(cl_merged) == len(cl_full)
    pm, pf = _partition_of(cl_merged), _partition_of(cl_full)
    assert set(pm) == set(pf)
    mismatches = [u for u in pm if pm[u] != pf[u]]
    assert not mismatches, f"{len(mismatches)} docs in different clusters"
    # canonical labels agree too (min doc_id per component)
    lm = cl_merged.set_index("url")["cluster_id"]
    lf = cl_full.set_index("url")["cluster_id"]
    assert (lm.sort_index() == lf.sort_index()).all()


def test_incremental_matches_batch_pipeline(snapshots, fixture_corpus, ray_session):
    """The incremental full-build path agrees with the one-shot run_dedup
    pipeline on the same input."""
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    _, _, _, cl_full = snapshots
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    cl_batch = run_dedup(pages, CFG).clusters.to_pandas()
    lm = cl_full.set_index("url")["cluster_id"].sort_index()
    lb = cl_batch.set_index("url")["cluster_id"].sort_index()
    assert (lm == lb).all()


def test_merge_signs_only_new_texts(snapshots):
    store_inc, _, _, _ = snapshots
    m_a = store_inc.manifest("a")
    m_b = store_inc.manifest("b")
    assert m_b["parent"] == "a"
    # signatures stage rows grow only by the delta's new distinct texts
    assert m_b["stages"]["signatures"]["rows"] >= m_a["stages"]["signatures"]["rows"]
    assert m_b["stages"]["docs_meta"]["rows"] > m_a["stages"]["docs_meta"]["rows"]
    # lineage + per-stage metrics recorded
    for st in ("docs_meta", "signatures", "verified_pairs", "clusters"):
        assert "rows" in m_b["stages"][st] and "wall_sec" in m_b["stages"][st]


def test_config_change_refuses_resume(snapshots, tmp_path):
    from imagededupx_ray.state.checkpoint import SnapshotStore

    store_inc, _, _, _ = snapshots
    other = DedupConfig(jaccard_threshold=0.5)
    store2 = SnapshotStore(store_inc.root, other)
    with pytest.raises(ValueError, match="refusing to resume"):
        store2.check_config("a")
