"""End-to-end pipeline correctness (SURVEY.md §5.2 items 2,3,5).

The recall gate: the Ray pipeline must reproduce the identical-config oracle's
dup pairs (brute-force all-pairs over the SAME 128-perm minhash estimates —
the quantity the reference computes for its candidates,
utils/util.py:170-234) with recall >= 0.99, and its cluster assignments.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from imagededupx_ray.config import DEFAULT_CONFIG as CFG
from tests import oracle


@pytest.fixture(scope="module")
def dedup_result(ray_session, fixture_corpus):
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    res = run_dedup(pages, CFG)
    return fixture_corpus, res


@pytest.fixture(scope="module")
def oracle_pairs(fixture_corpus):
    """Identical-config oracle: minhash-estimated jaccard >= threshold over all
    doc pairs, computed from the SAME signatures semantics in pure Python."""
    pages = pq.read_table(f"{fixture_corpus}/pages")
    texts = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    # oracle works on unique texts (exact dups collapse to min url)
    by_sha: dict[str, str] = {}
    import hashlib

    for url, t in sorted(texts.items()):
        sha = hashlib.sha256(t.encode()).hexdigest()
        by_sha.setdefault(sha, url)
    from imagededupx_ray.functions.hashing import doc_id_of

    reps = {url: t for url, t in texts.items() if url in set(by_sha.values())}
    ids = {url: doc_id_of(url) for url in reps}
    mh = {ids[url]: np.array(oracle.minhash(t, CFG), dtype=np.uint64) for url, t in reps.items()}
    id_list = sorted(mh)
    M = np.stack([mh[i] for i in id_list])
    n = len(id_list)
    pairs = []
    for i0 in range(0, n, 64):  # chunked all-pairs agreement matrix
        i1 = min(i0 + 64, n)
        est = (M[i0:i1, None, :] == M[None, :, :]).mean(axis=2)
        for r in range(i1 - i0):
            i = i0 + r
            hits = np.flatnonzero(est[r] >= CFG.jaccard_threshold)
            for j in hits:
                if j > i:
                    pairs.append((id_list[i], id_list[j], float(est[r, j])))
    return texts, ids, pairs


def test_counts_and_schema(dedup_result):
    corpus, res = dedup_result
    n_pages = pq.read_table(f"{corpus}/pages").num_rows
    clusters = res.clusters.to_pandas()
    assert len(clusters) == n_pages  # every input doc gets an assignment
    assert set(clusters.columns) == {"doc_id", "url", "cluster_id", "is_canonical"}
    assert clusters.url.nunique() == n_pages
    # each cluster has exactly one canonical doc; cluster_id = min member doc_id
    g = clusters.groupby("cluster_id")
    assert (g.is_canonical.sum() == 1).all()
    mins = g.doc_id.min()
    assert (mins.index.values.astype("uint64") == mins.values.astype("uint64")).all()


def test_dup_pair_recall_vs_identical_config_oracle(dedup_result, oracle_pairs):
    corpus, res = dedup_result
    _, _, pairs = oracle_pairs
    cl = res.clusters.to_pandas().set_index("doc_id")["cluster_id"].to_dict()
    hits = sum(1 for a, b, _ in pairs if cl[a] == cl[b])
    recall = hits / max(1, len(pairs))
    assert len(pairs) > 50  # fixture actually plants enough dup structure
    assert recall >= 0.99, f"recall {recall:.4f} ({hits}/{len(pairs)})"


def test_verified_pairs_match_oracle_estimates(dedup_result, oracle_pairs):
    """Every verified pair's est_jaccard must EQUAL the oracle's estimate
    (identical signatures bit-for-bit)."""
    _, res = dedup_result
    texts, ids, _ = oracle_pairs
    vp = res.verified_pairs.to_pandas().head(200)
    id2url = {v: k for k, v in ids.items()}
    for _, r in vp.iterrows():
        ua, ub = id2url.get(int(r.a)), id2url.get(int(r.b))
        if ua is None or ub is None:
            continue
        mh_a = np.array(oracle.minhash(texts[ua], CFG), dtype=np.uint64)
        mh_b = np.array(oracle.minhash(texts[ub], CFG), dtype=np.uint64)
        assert abs(float((mh_a == mh_b).mean()) - r.est_jaccard) < 1e-6


def test_exact_dups_share_cluster(dedup_result, fixture_corpus):
    _, res = dedup_result
    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet").to_pandas()
    cl = res.clusters.to_pandas().set_index("url")["cluster_id"].to_dict()
    exact = tp[tp.kind == "exact"]
    assert all(cl[r.a_url] == cl[r.b_url] for _, r in exact.iterrows())


def test_truth_cluster_recall(dedup_result, fixture_corpus):
    """Against generator ground truth. TRUE jaccard >= 0.85 gives a ~4-sigma
    margin over the est_jaccard threshold (sigma = sqrt(j(1-j)/128) ~ 0.04),
    so misses indicate real pipeline bugs, not estimator noise. The contract
    metric (vs the identical-config oracle) is the test above."""
    _, res = dedup_result
    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet").to_pandas()
    cl = res.clusters.to_pandas().set_index("url")["cluster_id"].to_dict()
    hi = tp[(tp.jaccard_5gram >= 0.85) | (tp.kind == "exact")]
    hits = sum(1 for _, r in hi.iterrows() if cl[r.a_url] == cl[r.b_url])
    assert hits / len(hi) >= 0.99, f"{hits}/{len(hi)}"


def test_low_jaccard_pairs_not_directly_paired(dedup_result, fixture_corpus):
    """Precision guard: verified pair list contains no pair whose true jaccard
    is far below threshold (clusters may transitively merge; direct pairs not)."""
    _, res = dedup_result
    tp = pq.read_table(f"{fixture_corpus}/truth_pairs.parquet").to_pandas()
    pages = pq.read_table(f"{fixture_corpus}/pages")
    from imagededupx_ray.functions.hashing import doc_id_of

    url2id = {u: doc_id_of(u) for u in pages["url"].to_pylist()}
    vp = res.verified_pairs.to_pandas()
    vset = {(int(a), int(b)) for a, b in zip(vp.a, vp.b)}
    lo = tp[tp.jaccard_5gram < 0.35]
    for _, r in lo.iterrows():
        a, b = url2id[r.a_url], url2id[r.b_url]
        key = (min(a, b), max(a, b))
        assert key not in vset, f"low-jaccard pair {r.a_url},{r.b_url} verified"


def test_label_prop_equals_dsu(dedup_result):
    """Distributed large-star/small-star components == driver DSU components
    on the identical edge set (verified pairs + exact member links)."""
    from imagededupx_ray.stages.cluster import (
        cluster_edges,
        dsu_components,
        label_prop_components,
    )

    _, res = dedup_result
    edges = cluster_edges(res.verified_pairs, res.dup_map).materialize()
    lp = label_prop_components(edges)
    dsu = dsu_components(edges)
    # same partition: compare canonical assignment over all nodes in either map
    nodes = set(dsu) | set(lp)
    for n in nodes:
        assert lp.get(n, n) == dsu.get(n, n)


def test_join_verify_equals_broadcast(dedup_result):
    from imagededupx_ray.stages.verify import verify_pairs_join

    _, res = dedup_result
    vj = (
        verify_pairs_join(res.cand_pairs, res.signatures, CFG)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    vb = res.verified_pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        vj[["a", "b", "est_jaccard", "hamming"]], vb[["a", "b", "est_jaccard", "hamming"]]
    )


def test_exact_dedup_join_equals_broadcast(ray_session, fixture_corpus):
    """The extreme-dup-rate join fallback must produce the same docs_unique
    and dup_map as the broadcast path, and the full pipeline the same cluster
    assignment (same shape as test_join_verify_equals_broadcast)."""
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup
    from imagededupx_ray.stages.dedup import exact_dedup
    from imagededupx_ray.stages.extract import extract_stage

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    docs = extract_stage(pages)
    ub, mb = exact_dedup(docs, strategy="broadcast")
    uj, mj = exact_dedup(docs, strategy="join")
    cols = ["doc_id", "url", "text_sha256", "n_exact_dups"]
    dub = ub.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    duj = uj.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dub, duj)
    mcols = ["doc_id", "url", "text_sha256", "canonical_doc_id"]
    dmb = mb.to_pandas()[mcols].sort_values("doc_id").reset_index(drop=True)
    dmj = mj.to_pandas()[mcols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dmb, dmj)
    # end-to-end: identical cluster assignment through the join-exact path
    cb = run_dedup(pages, CFG, exact_strategy="broadcast").clusters.to_pandas()
    cj = run_dedup(pages, CFG, exact_strategy="join").clusters.to_pandas()
    lb = cb.set_index("url")["cluster_id"].sort_index()
    lj = cj.set_index("url")["cluster_id"].sort_index()
    assert (lb == lj).all()


def test_degenerate_corpora(ray_session):
    """Single row / all-identical / all-empty / mixed-empty corpora all
    cluster correctly (skew and empty-shingle paths)."""
    import pyarrow as pa
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    def pages_tbl(texts):
        n = len(texts)
        return pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(n)], type=pa.string()),
                "warc_ts": pa.nulls(n, pa.timestamp("us")),
                "html": pa.nulls(n, pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n, type=pa.string()),
            }
        )

    cases = {
        "one_row": (["hello world single document with enough words here"], 1),
        "all_identical": (["the same page body " * 10] * 120, 1),
        "all_empty": ([""] * 60, 1),
        "mixed_empty": (
            ["", "a b c d e f g h i j k l m n o p", "", "a b c d e f g h i j k l m n o q"],
            2,
        ),
    }
    for name, (texts, want_clusters) in cases.items():
        cl = run_dedup(rd.from_arrow(pages_tbl(texts))).clusters.to_pandas()
        assert len(cl) == len(texts), name
        assert cl["cluster_id"].nunique() == want_clusters, name


def test_partitioning_invariance(ray_session, fixture_corpus):
    """Cluster assignment must be byte-identical under a different read
    fan-out (the determinism contract: content-derived ids, min-id
    canonicals, a<b ordering — no positional or partition-order dependence)."""
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    base = (
        run_dedup(rd.read_parquet(f"{fixture_corpus}/pages"), CFG)
        .clusters.to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    alt = (
        run_dedup(
            rd.read_parquet(f"{fixture_corpus}/pages", override_num_blocks=7), CFG
        )
        .clusters.to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, alt)


def test_salted_lsh_preserves_clusters(ray_session, fixture_corpus):
    """With salt_threshold forced tiny, the boilerplate site's hot buckets
    are split across salted sub-partitions; chained sub-bucket minima must
    keep every cluster identical to the unsalted run."""
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.pipelines.dedup import run_dedup

    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    base = run_dedup(pages, CFG).clusters.to_pandas()
    salted_cfg = DedupConfig(salt_threshold=40, salt_k=4)
    salted = run_dedup(pages, salted_cfg).clusters.to_pandas()
    lb = base.set_index("url")["cluster_id"].sort_index()
    ls = salted.set_index("url")["cluster_id"].sort_index()
    assert (lb == ls).all()


def test_run_dedup_label_prop_path_equals_dsu(dedup_result, ray_session):
    """The flagship pipeline's auto clustering switch: forcing the pair-count
    threshold to 0 exercises the distributed label-propagation path, which
    must produce the identical cluster partition as the default driver DSU."""
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    fixture_corpus, res = dedup_result
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    lp = run_dedup(pages, CFG, label_prop_threshold=0).clusters.to_pandas()
    base = res.clusters.to_pandas()
    lb = base.set_index("url")["cluster_id"].sort_index()
    ll = lp.set_index("url")["cluster_id"].sort_index()
    assert (lb == ll).all()


def test_assign_join_path_equals_broadcast(dedup_result, ray_session):
    """Above the assign-join pair threshold the final label assignment flips
    from a driver root_map dict + broadcast to a star-edge Dataset hash-join
    (stages/cluster.assign_clusters_via_canonical_join); forcing the
    threshold to 0 must reproduce the identical cluster partition AND the
    identical canonical flags."""
    import ray.data as rd

    from imagededupx_ray.pipelines.dedup import run_dedup

    fixture_corpus, res = dedup_result
    pages = rd.read_parquet(f"{fixture_corpus}/pages")
    jn = run_dedup(pages, CFG, assign_join_threshold=0).clusters.to_pandas()
    base = res.clusters.to_pandas()
    b = base.set_index("url")[["cluster_id", "is_canonical"]].sort_index()
    j = jn.set_index("url")[["cluster_id", "is_canonical"]].sort_index()
    assert len(b) == len(j)
    assert (b["cluster_id"] == j["cluster_id"]).all()
    assert (b["is_canonical"] == j["is_canonical"]).all()
