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


def test_crash_resume_reuses_stages(ray_session, fixture_corpus, tmp_path):
    """Simulate a crash after the signatures stage: re-running must reuse the
    persisted signatures (not re-sign) and produce the identical clusters."""
    import json
    import os
    import shutil

    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    store = SnapshotStore(str(tmp_path / "store"), CFG)
    full = build_snapshot(store, pages, "x", cfg=CFG).to_pandas()

    # craft a "crashed" snapshot: copy docs_meta + signatures, drop the rest
    crashed = SnapshotStore(str(tmp_path / "crashed"), CFG)
    crashed.init_snapshot("x")
    m_full = store.manifest("x")
    for st in ("docs_meta", "lsh_index", "signatures"):
        shutil.copytree(store.stage_dir("x", st), crashed.stage_dir("x", st))
        crashed._update_manifest("x", stage_update={st: m_full["stages"][st]})
    assert not crashed.is_complete("x")

    sig_wall_before = crashed.manifest("x")["stages"]["signatures"]["wall_sec"]
    resumed = build_snapshot(crashed, pages, "x", cfg=CFG).to_pandas()
    # signatures stage untouched (same recorded metrics => not recomputed)
    assert crashed.manifest("x")["stages"]["signatures"]["wall_sec"] == sig_wall_before
    assert crashed.is_complete("x")

    lf = full.set_index("url")["cluster_id"].sort_index()
    lr = resumed.set_index("url")["cluster_id"].sort_index()
    assert (lf == lr).all()

    # fully complete snapshot: rerun returns instantly with identical output
    again = build_snapshot(crashed, pages, "x", cfg=CFG).to_pandas()
    la = again.set_index("url")["cluster_id"].sort_index()
    assert (la == lf).all()


def test_crash_resume_mid_merge(ray_session, fixture_corpus, tmp_path):
    """A merge that crashed between the signatures and verified_pairs stages
    must resume to the SAME clusters — in particular the delta's candidate
    buckets must regenerate from the persisted changed-keys sidecar (a
    silent-empty bucket filter here would drop every delta pair)."""
    import shutil

    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    snap0 = pages.filter(expr="snapshot == 0")
    snap1 = pages.filter(expr="snapshot == 1")
    store = SnapshotStore(str(tmp_path / "full"), CFG)
    build_snapshot(store, snap0, "a", cfg=CFG)
    want = build_snapshot(store, snap1, "b", parent="a", cfg=CFG).to_pandas()

    crashed = SnapshotStore(str(tmp_path / "crashed"), CFG)
    shutil.copytree(store.stage_dir("a", ""), crashed.stage_dir("a", ""))
    crashed.init_snapshot("b", parent="a")
    m_full = store.manifest("b")
    for st in ("docs_meta", "lsh_index", "signatures"):
        shutil.copytree(store.stage_dir("b", st), crashed.stage_dir("b", st))
        crashed._update_manifest("b", stage_update={st: m_full["stages"][st]})
    # sidecars are written before the signatures stage, so a crash after it
    # always leaves them on disk
    for sc in (
        "tombstone_ids",
        "dead_row_keys",
        "extinct_sig_ids",
        "cluster_patch_docs",
        "cluster_patch_sigs",
    ):
        shutil.copy(store.sidecar_path("b", sc), crashed.sidecar_path("b", sc))
    assert not crashed.is_complete("b")

    resumed = build_snapshot(crashed, snap1.limit(0), "b", parent="a", cfg=CFG).to_pandas()
    lw = want.set_index("url")["cluster_id"].sort_index()
    lr = resumed.set_index("url")["cluster_id"].sort_index()
    assert (lw == lr).all()
    # the delta's near-dup pairs were regenerated, not dropped
    assert crashed.manifest("b")["stages"]["verified_pairs"]["rows"] == m_full[
        "stages"
    ]["verified_pairs"]["rows"]


def test_empty_full_build_then_merge(ray_session, fixture_corpus, tmp_path):
    """A zero-page full build must persist valid empty stages, and a merge
    on top of it must equal a fresh full build of the delta."""
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    store = SnapshotStore(str(tmp_path / "s"), CFG)
    empty = build_snapshot(store, pages.limit(0), "empty", cfg=CFG)
    assert empty.count() == 0
    assert store.is_complete("empty")
    merged = build_snapshot(store, pages, "real", parent="empty", cfg=CFG).to_pandas()
    store2 = SnapshotStore(str(tmp_path / "f"), CFG)
    fresh = build_snapshot(store2, pages, "full", cfg=CFG).to_pandas()
    lm = merged.set_index("url")["cluster_id"].sort_index()
    lf = fresh.set_index("url")["cluster_id"].sort_index()
    assert (lm == lf).all()


def test_delete_then_readd_revives_state(ray_session, fixture_corpus, tmp_path):
    """tombstone a slice, then merge the same pages back: the stored rows,
    signatures and pairs must revive in place (no re-signing) and the final
    clusters must equal a never-deleted full build."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages_tbl = pq.read_table(f"{fixture_corpus}/pages")
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    urls = sorted(pages_tbl["url"].to_pylist())
    dead = urls[::7]

    cfg = CFG.__class__(max_bucket_size=4096)
    store = SnapshotStore(str(tmp_path / "inc"), cfg)
    build_snapshot(store, pages, "base", cfg=cfg)
    build_snapshot(
        store, pages.limit(0), "del", parent="base", cfg=cfg, tombstones=dead
    )
    dead_set = set(dead)
    readd = pages.filter(lambda r: r["url"] in dead_set)
    revived = build_snapshot(store, readd, "readd", parent="del", cfg=cfg).to_pandas()

    store2 = SnapshotStore(str(tmp_path / "full"), cfg)
    full = build_snapshot(store2, pages, "full", cfg=cfg).to_pandas()
    assert len(revived) == len(full)
    lr = revived.set_index("url")["cluster_id"].sort_index()
    lf = full.set_index("url")["cluster_id"].sort_index()
    assert (lr == lf).all()
    # nothing was re-signed or re-appended: the re-add delta wrote zero new
    # signature rows (all texts were already signed in the lineage)
    m = store.manifest("readd")
    own = store.read_stage_own("readd", "signatures")
    assert own.count() == 0
    assert m["stages"]["signatures"]["rows"] == store.manifest("base")["stages"][
        "signatures"
    ]["rows"]


def test_tombstone_merge_equals_rebuild(ray_session, fixture_corpus, tmp_path):
    """merge with tombstones == full rebuild on the corpus minus those urls,
    including canonical reassignment when a group's min-id doc is deleted."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages_tbl = pq.read_table(f"{fixture_corpus}/pages")
    pages = rd.read_parquet(f"{fixture_corpus}/pages")

    # tombstone: every 13th url — hits exact-dup members, near-dups, uniques
    urls = pages_tbl["url"].to_pylist()
    dead = sorted(urls)[::13]
    assert len(dead) > 20

    # uncapped buckets: deletion equivalence is exact only when pair
    # emission is all-pairs (window-capped hot buckets emit different window
    # adjacencies on rebuild — connectivity superset, not equality)
    cfg = CFG.__class__(max_bucket_size=4096)

    store = SnapshotStore(str(tmp_path / "inc"), cfg)
    build_snapshot(store, pages, "base", cfg=cfg)
    merged = build_snapshot(
        store, pages.limit(0), "del", parent="base", cfg=cfg, tombstones=dead
    ).to_pandas()

    alive_pages = pages.filter(
        lambda r: r["url"] not in set(dead)
    )
    store2 = SnapshotStore(str(tmp_path / "full"), cfg)
    rebuilt = build_snapshot(store2, alive_pages, "full", cfg=cfg).to_pandas()

    assert len(merged) == len(rebuilt) == len(urls) - len(dead)
    assert not set(dead) & set(merged.url)
    lm = merged.set_index("url")["cluster_id"].sort_index()
    lr = rebuilt.set_index("url")["cluster_id"].sort_index()
    assert (lm == lr).all()


def test_chained_patch_merges_equal_rebuild(ray_session, fixture_corpus, tmp_path):
    """Two successive patch-based merges (the second with tombstones) compose
    to the same clusters as a one-shot rebuild, while each merge's own
    clusters part stays patch-sized (docs whose rows could change), not
    corpus-sized."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages_tbl = pq.read_table(f"{fixture_corpus}/pages")
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    urls = sorted(pages_tbl["url"].to_pylist())
    third = {u: i % 3 for i, u in enumerate(urls)}

    def part(k):
        return pages.filter(lambda r: third[r["url"]] == k)

    cfg = CFG.__class__(max_bucket_size=4096)  # uncapped: exact equivalence
    dead = urls[::17]

    store = SnapshotStore(str(tmp_path / "inc"), cfg)
    build_snapshot(store, part(0), "a", cfg=cfg)
    build_snapshot(store, part(1), "b", parent="a", cfg=cfg)
    merged = build_snapshot(
        store, part(2), "c", parent="b", cfg=cfg, tombstones=dead
    ).to_pandas()

    alive = pages.filter(lambda r: r["url"] not in set(dead))
    store2 = SnapshotStore(str(tmp_path / "full"), cfg)
    rebuilt = build_snapshot(store2, alive, "full", cfg=cfg).to_pandas()

    assert len(merged) == len(rebuilt)
    assert not set(dead) & set(merged.url)
    lm = merged.set_index("url")["cluster_id"].sort_index()
    lr = rebuilt.set_index("url")["cluster_id"].sort_index()
    assert (lm == lr).all()

    # the merges actually took the patch path: composed from parent parts
    # with a parents-scoped exclusion, own part smaller than the corpus
    for snap in ("b", "c"):
        ent = store.manifest(snap)["stages"]["clusters"]
        assert ent["exclude"]["scope"] == "parents"
        assert len(ent["dirs"]) > 1
        own_rows = store.read_stage_own(snap, "clusters").count()
        assert own_rows < len(merged)
    # no duplicate doc rows leak through the composition
    assert merged["doc_id"].is_unique


def test_compact_clusters_mid_lineage(ray_session, fixture_corpus, tmp_path):
    """compact_stage folds a patch-composed clusters stage into one part
    (resetting the churn carry-set) and later merges stay equivalent."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages_tbl = pq.read_table(f"{fixture_corpus}/pages")
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    urls = sorted(pages_tbl["url"].to_pylist())
    third = {u: i % 3 for i, u in enumerate(urls)}

    def part(k):
        return pages.filter(lambda r: third[r["url"]] == k)

    cfg = CFG.__class__(max_bucket_size=4096)
    store = SnapshotStore(str(tmp_path / "inc"), cfg)
    build_snapshot(store, part(0), "a", cfg=cfg)
    build_snapshot(store, part(1), "b", parent="a", cfg=cfg)
    pre = store.read_stage("b", "clusters").to_pandas()
    store.compact_stage("b", "clusters")
    post = store.read_stage("b", "clusters").to_pandas()
    assert len(store.read_sidecar("b", "patched_cluster_docs")) == 0
    lm = pre.set_index("url")["cluster_id"].sort_index()
    lp = post.set_index("url")["cluster_id"].sort_index()
    assert (lm == lp).all() and post["doc_id"].is_unique

    merged = build_snapshot(store, part(2), "c", parent="b", cfg=cfg).to_pandas()
    store2 = SnapshotStore(str(tmp_path / "full"), cfg)
    rebuilt = build_snapshot(store2, pages, "full", cfg=cfg).to_pandas()
    lc = merged.set_index("url")["cluster_id"].sort_index()
    lr = rebuilt.set_index("url")["cluster_id"].sort_index()
    assert (lc == lr).all() and merged["doc_id"].is_unique


def test_compact_after_delete_preserves_resurrection(
    ray_session, fixture_corpus, tmp_path
):
    """Compacting signatures/lsh_index/docs_meta AFTER a tombstone merge must
    keep the hidden rows physical (the exclude filter must not fold), so a
    later re-add still revives them and clusters match a never-deleted
    build. Guards the data-loss path where compaction folded the extinct
    filter and re-added texts lost all near-dup pairs silently."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages_tbl = pq.read_table(f"{fixture_corpus}/pages")
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    urls = sorted(pages_tbl["url"].to_pylist())
    dead = urls[::7]

    cfg = CFG.__class__(max_bucket_size=4096)
    store = SnapshotStore(str(tmp_path / "inc"), cfg)
    build_snapshot(store, pages, "base", cfg=cfg)
    build_snapshot(
        store, pages.limit(0), "del", parent="base", cfg=cfg, tombstones=dead
    )
    for st in ("signatures", "lsh_index", "docs_meta"):
        store.compact_stage("del", st)
        # exclusion survives compaction for revival-bearing stages
        assert "exclude" in store.manifest("del")["stages"][st]

    dead_set = set(dead)
    readd = pages.filter(lambda r: r["url"] in dead_set)
    revived = build_snapshot(store, readd, "readd", parent="del", cfg=cfg).to_pandas()

    store2 = SnapshotStore(str(tmp_path / "full"), cfg)
    full = build_snapshot(store2, pages, "full", cfg=cfg).to_pandas()
    assert len(revived) == len(full)
    lr = revived.set_index("url")["cluster_id"].sort_index()
    lf = full.set_index("url")["cluster_id"].sort_index()
    assert (lr == lf).all()
    # still no re-signing: the physical signature rows survived compaction
    assert store.read_stage_own("readd", "signatures").count() == 0


def test_modified_page_supersedes_old_text(ray_session, fixture_corpus, tmp_path):
    """Re-crawling a url with CHANGED text in a merge is last-write-wins: the
    parent row for that url dies, the clusters keep exactly one row per url,
    and the result equals a rebuild over the latest-per-url corpus
    (reference M10 'modified', improved_faiss_detector.py:269-295)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages_tbl = pq.read_table(f"{fixture_corpus}/pages")
    urls = sorted(pages_tbl["url"].to_pylist())
    changed = set(urls[::9])
    assert len(changed) > 20

    # delta: the changed urls re-crawled with brand-new texts (html rewrites)
    idx = [i for i, u in enumerate(pages_tbl["url"].to_pylist()) if u in changed]
    sub = pages_tbl.take(idx)
    new_htmls = [
        f"<html><body><main><p>fresh recrawl body {i} of {u}</p>"
        f"<p>entirely different content now</p></main></body></html>".encode()
        for i, u in enumerate(sub["url"].to_pylist())
    ]
    from imagededupx_ray.functions.text import extract_text

    delta_tbl = (
        sub.set_column(sub.schema.get_field_index("html"), "html", pa.array(new_htmls, type=pa.binary()))
        .set_column(
            sub.schema.get_field_index("text"),
            "text",
            pa.array([extract_text(h) for h in new_htmls], type=pa.string()),
        )
    )

    cfg = CFG.__class__(max_bucket_size=4096)
    store = SnapshotStore(str(tmp_path / "inc"), cfg)
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    build_snapshot(store, pages, "base", cfg=cfg)
    merged = build_snapshot(
        store, rd.from_arrow(delta_tbl), "recrawl", parent="base", cfg=cfg
    ).to_pandas()

    # latest-per-url rebuild: original pages for unchanged urls + new texts
    keep = pages.filter(lambda r: r["url"] not in changed)
    latest = keep.union(rd.from_arrow(delta_tbl))
    store2 = SnapshotStore(str(tmp_path / "full"), cfg)
    rebuilt = build_snapshot(store2, latest, "full", cfg=cfg).to_pandas()

    assert merged["doc_id"].is_unique and merged["url"].is_unique
    assert len(merged) == len(rebuilt) == len(urls)
    lm = merged.set_index("url")["cluster_id"].sort_index()
    lr = rebuilt.set_index("url")["cluster_id"].sort_index()
    assert (lm == lr).all()


def test_lineage_cli_walks_parent_chain(snapshots, capsys):
    """`lineage` prints the child→parent manifest chain with per-stage rows,
    wall_sec and part counts — the north rule's per-partition lineage +
    metrics surfaced without a Ray session."""
    import json

    from imagededupx_ray.__main__ import main

    store_inc, _, _, _ = snapshots
    assert main(["lineage", "--store", store_inc.root]) == 0
    out = json.loads(capsys.readouterr().out)
    chain = out["lineage"]
    assert [s["snapshot"] for s in chain] == ["b", "a"]
    assert chain[0]["parent"] == "a" and chain[1]["parent"] is None
    for snap in chain:
        assert snap["complete"] is True
        for stage in ("docs_meta", "signatures", "lsh_index", "verified_pairs", "clusters"):
            ent = snap["stages"][stage]
            assert ent["rows"] >= 0 and ent["wall_sec"] >= 0
        # the merged child composes parent parts + its own delta part
    assert chain[0]["stages"]["signatures"]["n_parts"] == 2
    assert chain[1]["stages"]["signatures"]["n_parts"] == 1


def test_incremental_label_path_fires(ray_session, fixture_corpus, tmp_path):
    """VERDICT r4 #8: a mutation-free merge must take the incremental label
    path (no full-pair DSU, no corpus canonical scan) and still equal the
    full rebuild partition."""
    import ray.data as rd

    from imagededupx_ray.pipelines import incremental as inc
    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.state.checkpoint import SnapshotStore

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    snap0 = pages.filter(expr="snapshot == 0")
    snap1 = pages.filter(expr="snapshot == 1")
    store = SnapshotStore(str(tmp_path / "inc"), CFG)
    build_snapshot(store, snap0, "a", cfg=CFG)
    merged = build_snapshot(store, snap1, "b", parent="a", cfg=CFG).to_pandas()
    walls = dict(inc.MERGE_PAIR_WALLS)
    # the fixture corpus plants cross-snapshot dups, so the delta crosses —
    # the incremental (not disjoint) path must have fired, and neither the
    # full-pair DSU nor the corpus canonical scan ran
    assert walls.get("cl_path") == "incremental", walls
    assert "cl_inc_labels_sec" in walls
    assert "cl_dsu_sec" not in walls and "cl_canon_sec" not in walls, walls

    store2 = SnapshotStore(str(tmp_path / "full"), CFG)
    full = build_snapshot(store2, pages, "ab", cfg=CFG).to_pandas()
    assert len(merged) == len(full)
    assert _partition_of(merged) == _partition_of(full)


def test_disjoint_merge_is_delta_bounded(ray_session, tmp_path):
    """A merge whose delta shares no text and no pair with the parent must
    take the fully delta-bounded clusters path (assign over the delta meta
    alone) and equal the full rebuild of the union."""
    import ray.data as rd

    from imagededupx_ray.pipelines import incremental as inc
    from imagededupx_ray.pipelines.incremental import build_snapshot
    from imagededupx_ray.sources.synthetic import write_pages_corpus
    from imagededupx_ray.state.checkpoint import SnapshotStore

    a_dir = str(tmp_path / "corpA")
    b_dir = str(tmp_path / "corpB")
    write_pages_corpus(a_dir, n_pages=300, seed=3)
    write_pages_corpus(b_dir, n_pages=200, seed=900017)
    pa_ds = rd.read_parquet(f"{a_dir}/pages")

    def _other_site(t):
        import pyarrow.compute as pc

        return t.set_column(
            t.column_names.index("url"),
            "url",
            pc.replace_substring(t["url"], "https://", "https://crawlb."),
        )

    # disjoint URL space too — the generator reuses /p/{i} paths across
    # seeds, which would otherwise look like supersedes (same url, new text)
    pb_ds = rd.read_parquet(f"{b_dir}/pages").map_batches(
        _other_site, batch_format="pyarrow"
    )

    store = SnapshotStore(str(tmp_path / "inc"), CFG)
    build_snapshot(store, pa_ds, "a", cfg=CFG)
    merged = build_snapshot(store, pb_ds, "b", parent="a", cfg=CFG).to_pandas()
    walls = dict(inc.MERGE_PAIR_WALLS)
    if walls.get("cl_path") == "disjoint":
        # the delta-bounded path must not have touched the full meta view
        assert "meta_all_sec" not in walls, walls
    else:
        # different seeds can still near-dup by chance; the incremental
        # path is then the correct choice — but it must be one of the two
        assert walls.get("cl_path") == "incremental", walls

    store2 = SnapshotStore(str(tmp_path / "full"), CFG)
    full = build_snapshot(store2, pa_ds.union(pb_ds), "ab", cfg=CFG).to_pandas()
    assert len(merged) == len(full)
    assert _partition_of(merged) == _partition_of(full)
