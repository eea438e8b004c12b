"""Weighted (tf) jaccard near-dup mining: ICWS sketch LSH + exact verify.

The reference weights its SimHash by term frequency
(/root/reference/similarities/similarities/literal_similarity.py:88-117) but
has no weighted-jaccard miner; this stage adds one with two value-identical
engines over the SAME exact verify:

- ``exact``: integer-tf weighted jaccard REDUCES to unweighted jaccard over
  the bag expansion — each (token, tf) becomes tf distinct elements
  (token, 1..tf), since sum(min(tf_a, tf_b)) counts exactly the shared
  (token, level) pairs. The expansion feeds the existing subquadratic
  AllPairs/PPJoin join (stages/setjoin.py) unchanged.
- ``icws``: ICWS weighted-minhash sketches (functions/wminhash.py, Ioffe
  2010) band through the production LSH exchange (stages/lsh.py) for
  candidates, then the SAME exact verify over the expanded sets — so every
  returned pair carries the TRUE weighted jaccard; only recall is
  probabilistic (bands=K/2, rows=2: pair at J_w misses a band with
  1 - J_w^2, all bands with (1-J_w^2)^(K/2) — 2e-8 at J_w=0.65, K=64).

Scale shape: signatures are one vectorized map_batches; candidates ride the
existing coarse-partition LSH exchange; verify broadcasts only candidate
members through fanout-bounded task trees (setjoin.verify_pairs_exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from imagededupx_ray.config import DedupConfig
from imagededupx_ray.functions import hashing as H
from imagededupx_ray.functions.text import tokenize_batch
from imagededupx_ray.functions.wminhash import doc_token_tf, icws_matrix


def _expand_bag(uniq: np.ndarray, tf: np.ndarray, counts: np.ndarray):
    """Bag expansion: (token, tf) -> tf elements splitmix64(tok ^ level*C),
    level = 1..tf. Returns (flat expanded int64 elements, per-doc counts)."""
    if len(uniq) == 0:
        return np.empty(0, dtype=np.int64), np.zeros(len(counts), dtype=np.int64)
    reps = tf.astype(np.int64)
    tok_rep = np.repeat(uniq, reps)
    cum = np.concatenate(([0], np.cumsum(reps)))[:-1]
    level = (np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(cum, reps) + 1).astype(
        np.uint64
    )
    with np.errstate(over="ignore"):
        elem = H.splitmix64(tok_rep ^ level * H._MIX_C)
    # per-doc expanded size = sum of tf over the doc's unique tokens
    doc_of_uniq = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    exp_counts = np.bincount(doc_of_uniq, weights=reps, minlength=len(counts)).astype(
        np.int64
    )
    return elem.view(np.int64), exp_counts


def _sets_and_sigs(batch: pa.Table, num_samples: int, seed: int) -> pa.Table:
    """Per doc: expanded-bag element set (exact weighted-jaccard domain) and
    the ICWS sketch, in one tokenize pass."""
    flat, offsets = tokenize_batch(batch["text"])
    tok_h = H.token_hash_flat(flat)
    uniq, tf, counts = doc_token_tf(tok_h, offsets)
    M = icws_matrix(uniq, tf.astype(np.float64), counts, num_samples, seed)
    elems, exp_counts = _expand_bag(uniq, tf, counts)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(exp_counts))).astype(np.int64)
    # sort each doc's expanded elements (setjoin's prefix filter and the
    # verify lexsort both want canonical ordering; cheap segment sort)
    order = np.lexsort((elems, np.repeat(np.arange(len(doc_ids)), exp_counts)))
    toks_list = pa.ListArray.from_arrays(
        pa.array(off, type=pa.int64()), pa.array(elems[order], type=pa.int64())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(M.reshape(-1), type=pa.uint64()), num_samples
            ),
            "simhash": pa.array(np.zeros(len(doc_ids), dtype=np.uint64), type=pa.uint64()),
            "n_shingles": pa.array(exp_counts.astype(np.int32), type=pa.int32()),
            "toks": toks_list,
        }
    )


def weighted_dup_pairs(
    docs_ds,
    threshold: float = 0.6,
    num_samples: int = 64,
    seed: int = 42,
    engine: str = "icws",
):
    """documents (doc_id, text) -> (a, b, wjaccard) pairs with tf-weighted
    jaccard >= threshold. ``engine="exact"`` runs the bag expansion through
    the subquadratic set-similarity join (complete); ``engine="icws"``
    sketches candidates through the LSH exchange (near-complete recall, see
    module docstring) and exact-verifies them. Both return the TRUE
    weighted jaccard per pair."""
    from imagededupx_ray.stages.setjoin import set_similarity_join, verify_pairs_exact

    sets = docs_ds.map_batches(
        lambda t: _sets_and_sigs(t, num_samples, seed), batch_format="pyarrow"
    ).materialize()

    def _rename(t: pa.Table) -> pa.Table:
        j = np.round(t["jaccard"].to_numpy(zero_copy_only=False), 6)
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "wjaccard": pa.array(j, type=pa.float64()),
            }
        )

    if engine == "exact":
        out = set_similarity_join(sets.select_columns(["doc_id", "toks"]), threshold)
    else:
        from imagededupx_ray.stages.lsh import lsh_candidate_pairs

        if num_samples & 1:
            raise ValueError("num_samples must be even (bands = K/2, rows = 2)")
        # pair-mining semantics need FULL within-bucket enumeration: the
        # dedup config's sliding-window cap keeps buckets CONNECTED (enough
        # for union-find clustering) but drops pairs, and ICWS buckets skew
        # hard — a high-tf element that wins the argmin for many docs puts
        # them all in one band bucket (that concentration is the weighted
        # semantics, not a defect). So the miner lifts the window cap and
        # accepts quadratic work inside heavy buckets; for skew-hostile
        # corpora or low thresholds use engine="exact" (PPJoin prunes by
        # prefix, not buckets).
        wcfg = DedupConfig(
            num_perms=num_samples,
            lsh_bands=num_samples // 2,
            lsh_rows=2,
            max_bucket_size=1 << 20,
            salt_threshold=None,
        )
        cands = lsh_candidate_pairs(
            sets.select_columns(["doc_id", "minhash", "simhash", "n_shingles"]), wcfg
        )
        out = verify_pairs_exact(cands, sets.select_columns(["doc_id", "toks"]), threshold)
    return out.map_batches(_rename, batch_format="pyarrow")
