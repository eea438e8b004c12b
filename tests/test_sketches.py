"""Gates for the mergeable sketches (functions/sketches.py) and their
sketch-backed queries: HLL cardinality error, Misra-Gries undercount
guarantee + certification, equi-rank quantile worst-case bound."""

import numpy as np
import pytest

from imagededupx_ray.functions import sketches as SK

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ kernels


def test_bit_length_exact_at_boundaries():
    xs = []
    for k in range(0, 64):
        xs += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    xs = np.array([x for x in xs if 0 <= x < (1 << 64)], dtype=np.uint64)
    got = SK._bit_length_u64(xs)
    want = np.array([int(x).bit_length() for x in xs], dtype=np.int64)
    assert np.array_equal(got, want)


def test_hll_estimate_within_std_error():
    rng = np.random.default_rng(7)
    for n in (100, 10_000, 200_000):
        h = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        n_distinct = len(np.unique(h))
        est = SK.hll_estimate(SK.hll_partial(h))
        assert abs(est - n_distinct) / n_distinct < 0.03  # 3.7 sigma at p=14


def test_hll_merge_equals_union():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    merged = SK.hll_merge([SK.hll_partial(a), SK.hll_partial(b)])
    direct = SK.hll_partial(np.concatenate([a, b]))
    assert np.array_equal(merged, direct)


def test_mg_undercount_bounded_by_deficit():
    rng = np.random.default_rng(3)
    # zipf-ish stream split into 8 blocks, merged at k=64
    stream = rng.zipf(1.3, size=40_000) % 5_000
    true_keys, true_counts = np.unique(stream, return_counts=True)
    summaries = []
    for part in np.array_split(stream, 8):
        k, c = np.unique(part, return_counts=True)
        summaries.append(SK.mg_truncate(k, c.astype(np.int64), 64))
    keys, counts, deficit = SK.mg_merge(summaries, 64)
    assert len(keys) <= 64 and deficit > 0
    sketch = dict(zip(keys.tolist(), counts.tolist()))
    for tk, tc in zip(true_keys.tolist(), true_counts.tolist()):
        got = sketch.get(tk, 0)
        assert got <= tc  # never overcounts
        assert tc - got <= deficit  # undercount bounded
    # containment guarantee: anything with true count > deficit is kept
    for tk, tc in zip(true_keys.tolist(), true_counts.tolist()):
        if tc > deficit:
            assert tk in sketch


def test_rank_compress_quantile_error_within_bound():
    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.5, size=100_000)
    means, weights, errs = [], [], []
    for part in np.array_split(vals, 16):
        m, w, e = SK.rank_compress(part, buckets=256)
        means.append(m)
        weights.append(w)
        errs.append(e)
    qs = [0.5, 0.9, 0.99]
    est, bound = SK.rank_quantiles(means, weights, errs, qs)
    s = np.sort(vals)
    n = len(s)
    for q, v in zip(qs, est):
        rank = np.searchsorted(s, v, side="right")
        assert abs(rank - q * n) <= bound + 1


def test_rank_recompress_bound_and_weight_conservation():
    rng = np.random.default_rng(9)
    vals = rng.lognormal(2.0, 1.2, size=50_000)
    # level 0: 32 blocks compressed to 128 centroids each
    means, weights, errs = [], [], []
    for part in np.array_split(vals, 32):
        m, w, e = SK.rank_compress(part, buckets=128)
        means.append(m)
        weights.append(w)
        errs.append(e)
    # level 1: recompress the union back to 128 centroids
    m1 = np.concatenate(means)
    w1 = np.concatenate(weights)
    m2, w2, added = SK.rank_recompress(m1, w1, buckets=128)
    assert len(m2) <= 129 and w2.sum() == len(vals)
    assert np.all(np.diff(m2) >= 0)  # sorted output
    qs = [0.5, 0.9, 0.99]
    est, bound = SK.rank_quantiles([m2], [w2], [sum(errs) + added], qs)
    s = np.sort(vals)
    n = len(s)
    for q, v in zip(qs, est):
        rank = np.searchsorted(s, v, side="right")
        assert abs(rank - q * n) <= bound + 1


def test_mg_tree_merge_keeps_containment_guarantee():
    rng = np.random.default_rng(13)
    stream = rng.zipf(1.3, size=60_000) % 5_000
    true_keys, true_counts = np.unique(stream, return_counts=True)
    leaves = []
    for part in np.array_split(stream, 16):
        k, c = np.unique(part, return_counts=True)
        leaves.append(SK.mg_truncate(k, c.astype(np.int64), 64))
    # tree: merge in pairs, then pairs of pairs (vs flat merge)
    level = leaves
    while len(level) > 1:
        level = [
            SK.mg_merge(level[i : i + 2], 64) for i in range(0, len(level), 2)
        ]
    keys, counts, deficit = level[0]
    sketch = dict(zip(keys.tolist(), counts.tolist()))
    for tk, tc in zip(true_keys.tolist(), true_counts.tolist()):
        got = sketch.get(tk, 0)
        assert got <= tc
        assert tc - got <= deficit
        if tc > deficit:
            assert tk in sketch


# ------------------------------------------------------------------ queries


def test_sketch_tree_reduce_matches_flat_merge(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from imagededupx_ray import queries as Q

    rng = np.random.default_rng(21)
    blocks = [
        rng.integers(0, 2**64, size=2000, dtype=np.uint64) for _ in range(17)
    ]
    regs_rows = [SK.hll_partial(b).tobytes() for b in blocks]
    summaries = rd.from_arrow(
        pa.table({"regs": pa.array(regs_rows, type=pa.binary())})
    )

    def merge_rows(batch: pa.Table) -> pa.Table:
        merged = SK.hll_merge(
            [np.frombuffer(b, dtype=np.uint8) for b in batch["regs"].to_pylist()]
        )
        return pa.table({"regs": pa.array([merged.tobytes()], type=pa.binary())})

    # fanout 2 forces ceil(log2(17)) = 5 genuine reduce levels
    rows = Q._sketch_tree_reduce(summaries, merge_rows, fanout=2)
    assert len(rows) <= 2
    tree = SK.hll_merge([np.frombuffer(r["regs"], dtype=np.uint8) for r in rows])
    flat = SK.hll_merge([np.frombuffer(b, dtype=np.uint8) for b in regs_rows])
    assert np.array_equal(tree, flat)


def test_hll_query_matches_exact_distinct(ray_session):
    import duckdb

    from imagededupx_ray import queries as Q

    est = Q.docs_distinct_bigrams_hll(SF_DIR)["n_distinct_est"].iloc[0]
    exact = duckdb.sql(
        "WITH t AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks "
        f"FROM read_parquet('{SF_DIR}/documents.parquet') WHERE trim(text) <> ''), "
        "b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i + 1])) AS ngram FROM t) "
        "SELECT COUNT(DISTINCT ngram) FROM b"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.03


def test_quantile_sketch_within_returned_bound(ray_session):
    import pyarrow.parquet as pq

    from imagededupx_ray import queries as Q

    out = Q.docs_length_quantiles_sketch(SF_DIR)
    nc = np.sort(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["n_chars"])
        .column("n_chars")
        .to_numpy()
    )
    n = len(nc)
    bound = out["max_rank_err"].iloc[0]
    for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        rank = np.searchsorted(nc, out[col].iloc[0], side="right")
        assert abs(rank - q * n) <= bound + 1


def test_mg_topk_query_raises_when_uncertifiable(ray_session):
    from imagededupx_ray import queries as Q

    # k_counters tiny vs the bigram domain -> deficit swamps count_50
    with pytest.raises(ValueError, match="not certifiable"):
        Q.docs_top_ngrams_mg(SF_DIR, topk=50, k_counters=64)
