"""Cross-corpus near-dup decontamination (pipelines/cross.py): planted
cross-corpus exact/near dups are removed from A, intra-A dups survive,
counts reconcile."""

import numpy as np
import pyarrow as pa


def _pages(texts, prefix):
    n = len(texts)
    return pa.table(
        {
            "url": pa.array([f"{prefix}://{i}" for i in range(n)], type=pa.string()),
            "warc_ts": pa.nulls(n, pa.timestamp("us")),
            "html": pa.nulls(n, pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
        }
    )


def test_cross_dedup_removes_only_b_touching_clusters(ray_session):
    import ray.data as rd

    from imagededupx_ray.config import DedupConfig
    from imagededupx_ray.pipelines.cross import cross_dedup
    from imagededupx_ray.stages.extract import _hash64_column

    rng = np.random.default_rng(61)
    vocab = [f"tok{i}" for i in range(5000)]

    def doc():
        return " ".join(rng.choice(vocab, size=120, replace=True))

    a_texts = [doc() for _ in range(20)]
    b_texts = [doc() for _ in range(5)]

    # plant: A[20] = near copy of B[0]; A[21] = exact copy of B[1];
    # A[22]+A[23] = intra-A dup pair (must SURVIVE)
    toks = b_texts[0].split()
    toks[10] = "swapped"
    a_texts.append(" ".join(toks))
    a_texts.append(b_texts[1])
    intra = doc()
    a_texts.append(intra)
    toks2 = intra.split()
    toks2[5] = "changed"
    a_texts.append(" ".join(toks2))

    pages_a = rd.from_arrow(_pages(a_texts, "a"))
    pages_b = rd.from_arrow(_pages(b_texts, "b"))
    clean, report = cross_dedup(pages_a, pages_b, DedupConfig())
    clean_ids = set(
        clean.to_pandas()["doc_id"].astype(np.int64)
    )

    a_ids = np.asarray(
        _hash64_column(
            pa.array([f"a://{i}" for i in range(len(a_texts))], type=pa.string())
        ),
        dtype=np.int64,
    )
    # cross dups removed
    assert int(a_ids[20]) not in clean_ids
    assert int(a_ids[21]) not in clean_ids
    # intra-A dup pair survives (both members)
    assert int(a_ids[22]) in clean_ids
    assert int(a_ids[23]) in clean_ids
    # all untouched docs survive; no B doc in the output
    for i in range(20):
        assert int(a_ids[i]) in clean_ids
    b_ids = np.asarray(
        _hash64_column(
            pa.array([f"b://{i}" for i in range(len(b_texts))], type=pa.string())
        ),
        dtype=np.int64,
    )
    assert not (set(b_ids.tolist()) & clean_ids)

    assert report["n_a"] == len(a_texts)
    assert report["n_b"] == len(b_texts)
    assert report["n_a_removed"] == 2
    assert report["n_a_clean"] == len(a_texts) - 2
    assert report["n_contaminated_clusters"] >= 2
