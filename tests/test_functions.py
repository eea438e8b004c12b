"""Scalar kernels, fusion, and readers (SURVEY.md §2.8, §2.10, §2.1)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from imagededupx_ray.functions import distance as D
from imagededupx_ray.functions.fusion import reciprocal_rank_fusion, weighted_fusion


def test_distances_match_numpy_reference():
    rng = np.random.default_rng(3)
    a, b = rng.normal(size=(16, 8)), rng.normal(size=(16, 8))
    assert np.allclose(D.euclidean_distance(a, b), np.linalg.norm(a - b, axis=1))
    assert np.allclose(D.manhattan_distance(a, b), np.abs(a - b).sum(axis=1))
    assert np.allclose(D.chebyshev_distance(a, b), np.abs(a - b).max(axis=1))
    assert np.allclose(
        D.minkowski_distance(a, b, 3), (np.abs(a - b) ** 3).sum(axis=1) ** (1 / 3)
    )
    S = D.cos_sim(a, b)
    assert S.shape == (16, 16)
    assert np.allclose(np.diag(S), D.pairwise_cos_sim(a, b))


def test_hamming_and_jaccard():
    a = np.array([0b1010, 0], dtype=np.uint64)
    b = np.array([0b0101, 0], dtype=np.uint64)
    assert D.hamming_distance(a, b).tolist() == [4, 0]
    assert D.jaccard_coef(np.array([1, 2, 3]), np.array([2, 3, 4])) == 0.5


@pytest.mark.parametrize(
    "s1,s2,want",
    [("kitten", "sitting", 3), ("", "abc", 3), ("abc", "abc", 0), ("flaw", "lawn", 2)],
)
def test_edit_distance(s1, s2, want):
    assert D.edit_distance(s1, s2) == want


def test_statistical_distances():
    rng = np.random.default_rng(7)
    v1, v2 = rng.normal(size=8), rng.normal(size=8)
    assert np.isclose(D.pearson_correlation(v1, v2), np.corrcoef(v1, v2)[0][1])
    assert np.isclose(D.pearson_correlation(v1, v1), 1.0)
    var = np.var(np.vstack([v1, v2]), axis=0, ddof=1)
    want = np.sqrt(((v1 - v2) ** 2 / (var + 1e-9)).sum())
    assert np.isclose(D.euclidean_distance_standardized(v1, v2), want)


def test_str_match_and_common_substr():
    assert D.is_str_match("abc", "abc")
    assert not D.is_str_match("abc", "abd")
    # kitten/sitting: edit 3, maxlen 7 -> similarity 1 - 3/7 ≈ 0.571
    assert D.is_str_match("kitten", "sitting", threshold=0.5)
    assert not D.is_str_match("kitten", "sitting", threshold=0.9)
    # longest common substring, vs a difflib oracle on random strings
    import difflib

    rng = np.random.default_rng(11)
    for _ in range(20):
        s1 = "".join(rng.choice(list("abcab ")) for _ in range(rng.integers(0, 30)))
        s2 = "".join(rng.choice(list("abcab ")) for _ in range(rng.integers(0, 30)))
        sq = difflib.SequenceMatcher(None, s1, s2, autojunk=False)
        m = sq.find_longest_match(0, len(s1), 0, len(s2))
        assert D.num_of_common_sub_str(s1, s2) == m.size, (s1, s2)
    assert D.num_of_common_sub_str("", "abc") == 0
    assert D.longest_match_ratio("xabcx", "abc") == 1.0


def test_normalizers():
    x = np.array([1.0, 2.0, 3.0])
    assert np.allclose(D.max_min_normalize(x), [0, 0.5, 1])
    assert abs(D.z_score(x).mean()) < 1e-12
    assert np.allclose(D.max_min_normalize(np.ones(3)), 0)


def _res(qd, scores):
    return pd.DataFrame(
        {
            "query_id": [q for q, _ in qd],
            "doc_id": [d for _, d in qd],
            "score": scores,
        }
    )


def test_weighted_fusion_prefers_agreement():
    r1 = _res([(0, 1), (0, 2), (0, 3)], [1.0, 0.8, 0.1])
    r2 = _res([(0, 2), (0, 1), (0, 4)], [0.9, 0.5, 0.4])
    out = weighted_fusion([r1, r2], k=3)
    assert list(out.doc_id[:2]) in ([1, 2], [2, 1])  # consensus docs lead
    assert out.iloc[0]["rank"] == 1


def test_rrf_matches_manual():
    r1 = _res([(0, 1), (0, 2)], [1.0, 0.9])
    r2 = _res([(0, 2), (0, 3)], [1.0, 0.9])
    out = reciprocal_rank_fusion([r1, r2], k=3, c=60)
    want_2 = 1 / 62 + 1 / 61
    got_2 = float(out[out.doc_id == 2].score.iloc[0])
    assert abs(got_2 - want_2) < 1e-12
    assert int(out.iloc[0].doc_id) == 2  # appears in both lists


def test_read_pages_csv_and_parquet(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from imagededupx_ray.sources.readers import read_pages

    df = pd.DataFrame({"id": [1, 2], "text": ["hello world", "second doc"]})
    csv_path = tmp_path / "c.csv"
    df.to_csv(csv_path, index=False)
    ds = read_pages(str(csv_path), format="csv")
    out = ds.to_pandas()
    assert list(out.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert sorted(out.url.tolist()) == ["doc://1", "doc://2"]  # row order is not part of the contract

    pq_path = tmp_path / "p.parquet"
    pq.write_table(pa.table({"text": ["x y z"], "url": ["https://a/1"]}), pq_path)
    out2 = read_pages(str(pq_path)).to_pandas()
    assert out2.url.tolist() == ["https://a/1"]
    assert out2.html.isna().all()


def test_calibration_monotone_and_bounded():
    from imagededupx_ray.functions import calibration as C

    s = np.linspace(0.0, 1.0, 101)
    for fn in (C.sigmoid_calibrate, C.power_calibrate, C.linear_calibrate,
               C.log_calibrate, C.mixed_calibrate):
        y = fn(s)
        assert (np.diff(y) >= -1e-12).all(), fn.__name__  # monotone
        assert y.min() >= -1e-9 and y.max() <= 1.0 + 1e-9, fn.__name__
    # linear remap pins the reference interval
    assert C.linear_calibrate(np.array([0.95, 1.0])).tolist() == [0.0, 1.0]


def test_eval_metrics_known_values():
    from imagededupx_ray.functions import evalmetrics as E

    res = pd.DataFrame(
        {
            "query_id": [0, 0, 0, 1, 1, 1],
            "doc_id": [10, 11, 12, 20, 21, 22],
            "rank": [1, 2, 3, 1, 2, 3],
        }
    )
    qrels = {0: {11}, 1: {20, 22}}
    assert E.mrr_at_k(res, qrels, 3) == (0.5 + 1.0) / 2
    assert E.recall_at_k(res, qrels, 3) == (1.0 + 1.0) / 2
    assert E.accuracy_at_k(res, qrels, 3) == 1.0
    assert abs(E.map_at_k(res, qrels, 3) - ((0.5) + (1.0 + 2 / 3) / 2) / 2) < 1e-12
    import numpy as _np

    ndcg_q0 = (1 / _np.log2(3)) / 1.0
    ndcg_q1 = (1.0 + 1 / _np.log2(4)) / (1.0 + 1 / _np.log2(3))
    assert abs(E.ndcg_at_k(res, qrels, 3) - (ndcg_q0 + ndcg_q1) / 2) < 1e-12
    # rank 1 perfect retrieval
    qrels2 = {0: {10}, 1: {20}}
    assert E.mrr_at_k(res, qrels2, 3) == 1.0


def test_native_signature_kernel_parity():
    """The C fast path (functions/native.py) must be bit-identical to the
    numpy MinHash/SimHash kernels on adversarial shapes: empty docs, 1-shingle
    docs, a mega-doc, and random segment sizes."""
    import numpy as np

    from imagededupx_ray.functions import hashing as H
    from imagededupx_ray.functions import native

    if not native.available():  # no C compiler on this node: fallback path
        rng = np.random.default_rng(7)
        sh = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
        cnt = np.array([100], dtype=np.int64)
        salts = H.make_permutations(8, 1)
        mh, sv = H.minhash_simhash(sh, cnt, salts)
        assert np.array_equal(mh, H.minhash_matrix(sh, cnt, salts))
        return

    rng = np.random.default_rng(7)
    counts = np.array([0, 1, 3, 0, 50_000, 7, 2, 0, 129], dtype=np.int64)
    sh = rng.integers(0, 1 << 64, size=int(counts.sum()), dtype=np.uint64)
    for num_perms in (8, 128):
        salts = H.make_permutations(num_perms, 12345)
        mh_n, sv_n = H.minhash_simhash(sh, counts, salts)
        assert np.array_equal(mh_n, H.minhash_matrix(sh, counts, salts))
        assert np.array_equal(sv_n, H.simhash_vector(sh, counts))
    # all-empty batch
    mh_e, sv_e = H.minhash_simhash(np.empty(0, np.uint64), np.zeros(3, np.int64), salts)
    assert (mh_e == H._EMPTY_SENTINEL).all() and (sv_e == 0).all()


def test_normalize_fast_path_equals_regex_path():
    """The collapse-skip byte scan must never change normalize_batch output:
    rows that trip it fall back to the RE2 pass, rows that pass it are
    provably already collapsed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from imagededupx_ray.functions.text import normalize_batch

    cases = [
        "already collapsed text",
        "",
        " leading", "trailing ", "dou  ble", "tab\there", "nl\nhere",
        "cr\rx", "\x0b", "\x0c", "UPPER Case",
        "unicode 汉字 interior", "édge", "汉",
        "ends uni\xa0", "\xa0starts", "mixed \t \n ws",
        "x", " ", "a b c", "\x1c fs-char",  # \x1c is NOT RE2 \s: token char
    ]
    arr = pa.array(cases, type=pa.string())
    got = normalize_batch(arr)
    # reference: the unconditional kernel chain
    want = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(arr), pattern=r"\s+", replacement=" ")
    )
    assert got.to_pylist() == want.to_pylist()
    # per-row singletons exercise both branches row-by-row
    for s in cases:
        one = normalize_batch(pa.array([s], type=pa.string()))
        assert one.to_pylist() == want.slice(cases.index(s), 1).to_pylist()


def test_lsh_plan_meets_recall_and_prefers_sharp_curves():
    """lsh_plan picks the largest rows meeting the recall bar; the S-curve
    probability it reports matches a Monte-Carlo simulation of banded
    minhash collisions."""
    import numpy as np

    from imagededupx_ray.config import lsh_candidate_probability, lsh_plan

    cfg, stats = lsh_plan(0.7, target_recall=0.99, num_perms=128)
    assert cfg.lsh_bands * cfg.lsh_rows == 128
    p = lsh_candidate_probability(0.7, cfg.lsh_bands, cfg.lsh_rows)
    assert p >= 0.99
    # any sharper split (larger rows) would miss the bar
    for rows in range(cfg.lsh_rows + 1, 129):
        if 128 % rows:
            continue
        assert lsh_candidate_probability(0.7, 128 // rows, rows) < 0.99
    # Monte-Carlo: per-perm agreement is Bernoulli(j) at jaccard j
    rng = np.random.default_rng(9)
    agree = rng.random((20000, 128)) < 0.7
    bands = agree.reshape(-1, cfg.lsh_bands, cfg.lsh_rows).all(axis=2)
    simulated = bands.any(axis=1).mean()
    assert abs(simulated - p) < 0.01
    # fp-rate report at a clearly-below-threshold jaccard
    _, stats2 = lsh_plan(0.7, num_perms=128, max_fp_jaccard=0.3)
    assert stats2["candidate_rate_at_fp_jaccard"] < 0.25
