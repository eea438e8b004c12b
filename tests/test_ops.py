"""Extended operator tests: ANN recall vs brute force, language-ID on known
samples, winnowing fingerprint properties, multimodal decode plumbing,
simhash pair symmetry (SURVEY.md §2.3 A4, §2.2 M5, training-data ops)."""

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"


def test_ivf_dup_pairs_recall_and_precision(ray_session):
    """IVF-bucketed near-dup mining: every emitted pair is exact (within-
    bucket matmul) and recall vs the exact all-pairs miner stays high with
    multi-assignment."""
    import ray.data as rd

    from imagededupx_ray.queries import embedding_dup_pairs
    from imagededupx_ray.stages.ann import ivf_dup_pairs

    sf = "/root/testdata/sf0.001"
    exact = embedding_dup_pairs(sf, threshold=0.4).to_pandas()
    want = {(int(r.a), int(r.b)) for _, r in exact.iterrows()}
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    got_df = ivf_dup_pairs(emb, threshold=0.4, n_clusters=8, n_assign=4).to_pandas()
    got = {(int(r.a), int(r.b)) for _, r in got_df.iterrows()}
    assert got <= want  # precision 1: every emitted pair is a true pair
    assert len(got_df) == len(got)  # distinct output
    assert len(want) > 0
    assert len(got & want) / len(want) >= 0.9, (len(got), len(want))


def test_ivf_dup_pairs_mega_bucket_bounded(ray_session):
    """Skew valve: a planted mega-cluster (every vector near-identical, so
    one centroid bucket collects them all) must emit a BOUNDED pair set via
    the banded fallback — not the O(g²) all-pairs explosion."""
    import ray.data as rd

    from imagededupx_ray.stages.ann import ivf_dup_pairs

    rng = np.random.default_rng(7)
    g, d = 2000, 16
    base = rng.normal(size=d)
    base /= np.linalg.norm(base)
    vecs = base[None, :] + rng.normal(scale=1e-3, size=(g, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(g, dtype=np.int64), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float64()), d
            ),
        }
    )
    emb = rd.from_arrow(tbl)
    window, n_assign = 64, 4
    got = ivf_dup_pairs(
        emb,
        threshold=0.99,
        n_clusters=8,
        n_assign=n_assign,
        max_bucket_size=256,
        bucket_window=window,
    ).to_pandas()
    # all g vectors are mutual near-dups: all-pairs would be g*(g-1)/2 ≈ 2M;
    # banded emission is capped at ~g*window per assigned bucket
    assert len(got) > g  # it did find plenty of real pairs
    assert len(got) <= g * window * n_assign
    # every emitted pair is a true pair at the threshold
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    a = got["a"].to_numpy()
    b = got["b"].to_numpy()
    s = np.einsum("ij,ij->i", vn[a], vn[b])
    assert (s >= 0.99 - 1e-9).all()


def test_semdedup_planted_groups(ray_session):
    """SemDeDup verdicts: each planted semantic-duplicate group keeps exactly
    one representative — the member with the LOWEST cosine to its nearest
    centroid (paper's keep rule) — singletons keep trivially, and semdup_id
    is the component min id."""
    import ray.data as rd

    from imagededupx_ray.stages.ann import fit_centroids
    from imagededupx_ray.stages.semdedup import semdedup_verdicts

    rng = np.random.default_rng(11)
    d, groups, gsize, singles = 16, 5, 4, 30
    vecs = []
    for _ in range(groups):
        base = rng.normal(size=d)
        base /= np.linalg.norm(base)
        for _ in range(gsize):
            v = base + rng.normal(scale=5e-3, size=d)
            vecs.append(v / np.linalg.norm(v))
    for _ in range(singles):
        v = rng.normal(size=d)
        vecs.append(v / np.linalg.norm(v))
    V = np.asarray(vecs)
    n = len(V)
    # planted groups must be the only near-dup pairs at the eps we use
    sims = V @ V.T
    gid = np.repeat(np.arange(groups + singles), [gsize] * groups + [1] * singles)
    same = gid[:, None] == gid[None, :]
    eps = 0.95
    assert (sims[same & ~np.eye(n, dtype=bool)] > eps).all()
    assert (sims[~same] < eps).all()

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), type=pa.float64()), d
            ),
        }
    )
    out = (
        semdedup_verdicts(rd.from_arrow(tbl), eps=eps, n_clusters=4, seed=42)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    keep = out["keep"].to_numpy()
    semdup = out["semdup_id"].to_numpy()
    # singletons: keep, own id
    single_mask = np.arange(n) >= groups * gsize
    assert keep[single_mask].all()
    assert (semdup[single_mask] == np.arange(n)[single_mask]).all()
    # groups: one keeper each, semdup_id = min member id, keeper = lowest
    # centroid cosine (min vec_id tie-break)
    C = fit_centroids(rd.from_arrow(tbl), 4, 42)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    csim = np.round((V @ C.T).max(axis=1), 9)
    for g in range(groups):
        ids = np.arange(g * gsize, (g + 1) * gsize)
        assert (semdup[ids] == ids.min()).all()
        kept = ids[keep[ids]]
        assert len(kept) == 1
        want = ids[np.lexsort((ids, csim[ids]))][0]
        assert kept[0] == want
    # deterministic across runs
    out2 = (
        semdedup_verdicts(rd.from_arrow(tbl), eps=eps, n_clusters=4, seed=42)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_ann_recall_vs_brute_force(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.ann import IVFIndex, brute_force_topk

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(expr="vec_id < 20").to_pandas()
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    q_ids = q["vec_id"].to_numpy()

    exact = brute_force_topk(emb, Q, q_ids, k=10)
    idx = IVFIndex(n_clusters=16, nprobe=8).build(emb)
    approx = idx.search(Q, q_ids, k=10)

    # recall@10 over all queries
    hits = 0
    total = 0
    for qid in q_ids:
        want = set(exact[exact.query_id == qid].neighbor_id)
        got = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"
    # exact scores agree where ids overlap
    m = exact.merge(approx, on=["query_id", "neighbor_id"], suffixes=("_e", "_a"))
    assert np.allclose(m.cosine_e, m.cosine_a, atol=1e-9)


def test_ivf_deterministic(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.ann import IVFIndex

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    c1 = IVFIndex(n_clusters=8).build(emb).centroids
    c2 = IVFIndex(n_clusters=8).build(emb).centroids
    assert np.array_equal(c1, c2)


def test_langid_known_samples():
    from imagededupx_ray.functions.textstats import langid_batch

    texts = [
        "the cat sat on the mat and it was happy with the sun",
        "der Hund ist nicht mit der Katze im Haus und das ist gut",
        "le chat est dans la maison et il est content pour le moment",
        "el perro es un animal que vive en la casa con su familia",
        "这是一个中文句子，用来测试语言识别的功能。",
        "",
    ]
    langs, conf = langid_batch(pa.array(texts, type=pa.string()))
    assert langs == ["en", "de", "fr", "es", "zh", "und"]
    assert all(c > 0 for c in conf[:5])


def test_winnow_fingerprints_properties():
    from imagededupx_ray.functions.text import tokenize_batch
    from imagededupx_ray.functions import hashing as H
    from imagededupx_ray.functions.textstats import winnow_fingerprints

    base = " ".join(f"tok{i}" for i in range(100))
    texts = [base, base, base + " extra tail words here now", "short one", ""]
    flat, off = tokenize_batch(pa.array(texts, type=pa.string()))
    th = H.token_hash_flat(flat)
    fps, counts = winnow_fingerprints(th, off)
    segs = np.split(fps, np.cumsum(counts)[:-1])
    # identical docs -> identical fingerprint sets
    assert np.array_equal(segs[0], segs[1])
    # winnowing guarantee: shared prefix keeps most fingerprints
    overlap = len(np.intersect1d(segs[0], segs[2])) / len(segs[0])
    assert overlap > 0.8
    # short doc gets >= 1 fingerprint; empty gets 0
    assert counts[3] >= 1 and counts[4] == 0


def test_image_decode_stage(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.multimodal import (
        FEATURE_DIM,
        decode_images,
        synthetic_images,
    )

    imgs = synthetic_images(64)
    out = decode_images(rd.from_arrow(imgs), batch_size=16).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {"image_id", "width", "height", "mean_luma", "feature"}
    assert (out.width >= 64).all() and (out.height >= 64).all()
    feats = np.stack(out.sort_values("image_id").feature.to_numpy())
    assert feats.shape == (64, FEATURE_DIM)
    # unit-norm features, deterministic across runs
    assert np.allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
    out2 = decode_images(rd.from_arrow(imgs), batch_size=16).to_pandas()
    feats2 = np.stack(out2.sort_values("image_id").feature.to_numpy())
    assert np.array_equal(feats, feats2)


def test_cluster_report_size_ordered(ray_session):
    """Report = size-desc communities with the canonical member's url
    (reference community_detection output semantics, utils/util.py:237-305)."""
    from imagededupx_ray.queries import dedup_cluster_report

    r = dedup_cluster_report("/root/testdata/sf0.001", top=50)
    assert len(r) == 50
    sizes = r["n_members"].to_numpy()
    assert (sizes[:-1] >= sizes[1:]).all()
    assert r["canonical_url"].notna().all()
    # canonical = min doc id of the component = the cluster id's doc
    assert (r["n_members"] >= 1).all()


def test_simhash_pairs_match_bruteforce(ray_session):
    """simhash_dup_pairs equals a direct popcount check over the signature
    table (same pipeline semantics, independent pairing code)."""
    import __ray_entry__ as e
    from imagededupx_ray.config import DEFAULT_CONFIG as CFG
    from imagededupx_ray.functions.hashing import popcount64
    from imagededupx_ray.stages.extract import extract_stage
    from imagededupx_ray.stages.signatures import signature_stage, signatures_to_numpy
    from imagededupx_ray.queries import _documents_as_pages

    from imagededupx_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.simhash_dup_pairs(sf).to_pandas()
    sig = signature_stage(extract_stage(_documents_as_pages(sf)), CFG).to_pandas()
    import pyarrow as pa_

    ids, _, sim, nsh = signatures_to_numpy(pa_.Table.from_pandas(sig), CFG.num_perms)
    ids, sim = ids[nsh > 0], sim[nsh > 0]
    ham = popcount64(sim[:, None] ^ sim[None, :])
    ii, jj = np.nonzero(ham <= CFG.simhash_hamming_max)
    keep = ids[ii] < ids[jj]
    want = {(int(a), int(b)) for a, b in zip(ids[ii[keep]], ids[jj[keep]])}
    assert {(int(r.a), int(r.b)) for _, r in got.iterrows()} == want


def test_dedup_consecutive_tokens_edge_cases(ray_session, tmp_path):
    """Vectorized consecutive-dup collapse: empty / whitespace-only docs,
    all-duplicate runs, cross-doc boundaries (a doc never inherits its
    predecessor's trailing token), single-token docs."""
    import pyarrow.parquet as pq
    import pyarrow as pa_

    from imagededupx_ray import queries as Q

    docs = pa_.table(
        {
            "doc_id": pa_.array([0, 1, 2, 3, 4, 5], type=pa_.int64()),
            "text": pa_.array(
                [
                    "a a a b b c",
                    "",
                    "   ",
                    "x x x x",
                    "c d",  # starts with doc 0's trailing token
                    "solo",
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = (
        Q.docs_dedup_consecutive_tokens(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.clean_text.tolist() == ["a b c", "", "", "x", "c d", "solo"]
    assert got.n_removed.tolist() == [3, 0, 0, 3, 0, 0]
