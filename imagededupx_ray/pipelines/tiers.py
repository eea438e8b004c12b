"""Tiered dedup cascade — the orchestration shape of a web-scale
training-data pipeline (exact → near → template → semantic), each tier
consuming the previous tier's survivors and reporting its own removals.

The reference exposes each dedup capability separately (md5 exact scan,
MinHash/simhash text dup mining, embedding-cosine dup detection,
community clustering); production corpus builds chain them cheapest-first
so every tier only pays for what the cheaper tiers could not catch. This
module composes the repo's existing stages into that cascade:

  tier 1  exact      sha256 collapse            (inside run_dedup)
  tier 2  near       MinHash-LSH + verify       (inside run_dedup;
                     est_jaccard >= t OR simhash hamming <= cfg tight max)
  tier 3  template   loose SimHash hamming-band LSH over tier-2 survivors
                     (catches boilerplate/template families whose shingle
                     jaccard sits below the verify threshold)
  tier 4  semantic   SemDeDup over the survivors' embeddings
                     (different text, same meaning)

Scale notes (what is bounded by what):
- tiers 1+2 are the flagship pipeline — all exchanges documented in
  pipelines/dedup.py;
- tier attribution uses the verified-pair DSU, so every driver-side set in
  tiers 2/3 is DUP-MEMBER-bounded (docs that appear in some dup pair),
  never corpus-bounded;
- tier 3 filters the already-materialized signatures by a broadcast drop
  set and reuses the hamming-band bucket exchange (stages/simhash_lsh.py);
- tier 4 joins embeddings against the canonical survivors with a hash
  join (corpus-sized but narrow: two int64 columns + the vectors), then
  runs the members-bounded SemDeDup verdict map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.config import DEFAULT_CONFIG, DedupConfig


def _not_in_broadcast(ds, id_col: str, drop: np.ndarray):
    """Streaming narrow filter: rows whose id_col is NOT in the (sorted,
    dup-member-bounded) drop array."""
    drop_ref = ray.put(np.sort(np.asarray(drop, dtype=np.int64)))

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(d):
            return batch
        pos = np.searchsorted(d, ids)
        hit = (pos < len(d)) & (d[np.minimum(pos, len(d) - 1)] == ids)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def _member_scores(docs_ds, members: np.ndarray) -> dict[int, int]:
    """(doc_id -> n_bytes) for the given member ids: one narrow broadcast-
    filtered scan; the collected rows are DUP-MEMBER-bounded, never
    corpus-bounded."""
    want_ref = ray.put(np.sort(members))

    def pick(batch: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(w, ids)
        hit = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == ids)
        return batch.filter(pa.array(hit))

    rows = (
        docs_ds.select_columns(["doc_id", "n_bytes"])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    )
    return {int(r["doc_id"]): int(r["n_bytes"]) for r in rows}


def drop_by_quality(root_map: dict[int, int], docs_ds) -> np.ndarray:
    """Quality keep-policy for a dup-component map: instead of keeping the
    min-id root (``drop = root_map.keys()``), each component keeps its
    LONGEST member by extracted ``n_bytes`` (ties -> min doc_id) — the
    SlimPajama/RefinedWeb-style "keep the longest" rule real corpus builds
    use so boilerplate fragments don't displace the fullest page. Returns
    the sorted drop array (same length as ``root_map``: every component
    still removes size-1 docs; only WHICH ids survive changes)."""
    if not root_map:
        return np.empty(0, dtype=np.int64)
    m = np.fromiter(root_map.keys(), dtype=np.int64, count=len(root_map))
    r = np.fromiter(root_map.values(), dtype=np.int64, count=len(root_map))
    roots = np.unique(r)
    members = np.concatenate([m, roots])
    comp = np.concatenate([r, roots])
    scores_map = _member_scores(docs_ds, members)
    scores = np.array([scores_map.get(int(i), -1) for i in members], dtype=np.int64)
    order = np.lexsort((members, -scores, comp))
    members, comp = members[order], comp[order]
    first = np.r_[True, comp[1:] != comp[:-1]]  # keeper = best row per comp
    return np.sort(members[~first])


def dedup_tier_cascade(
    pages_ds,
    emb_ds=None,
    cfg: DedupConfig = DEFAULT_CONFIG,
    loose_hamming_max: int = 10,
    semantic_eps: float = 0.4,
    dedup_result=None,
    keep_policy: str = "min_id",
    collect_drops: list | None = None,
    semantic_encoder: str | None = None,
    lsa_dim: int = 32,
    lsa_vocab: int = 1024,
) -> pd.DataFrame:
    """Run the 4-tier cascade; returns the per-tier report DataFrame
    (tier, method, docs_in, dup_docs_removed, docs_out). Pass a
    pre-computed ``dedup_result`` (pipelines.dedup.run_dedup output) to
    share tiers 1+2 with other consumers. ``emb_ds`` rows are
    (vec_id, embedding) aligned with doc_id; omit to skip tier 4.

    ``keep_policy`` picks each near/template component's survivor:
    "min_id" (deterministic canonical, the flagship pipeline's rule) or
    "longest" (keep the member with the largest extracted ``n_bytes``,
    ties -> min id — the SlimPajama/RefinedWeb rule; see
    ``drop_by_quality``). Exact-tier members are byte-identical, so the
    policy only affects tiers 2 and 3. A tier's removal count is
    policy-invariant GIVEN its input (each component drops size-1 docs),
    but the policy changes WHICH docs survive tier 2, so tier 3 sees a
    different survivor set and its component structure (hence count) may
    differ. Pass a
    list as ``collect_drops`` to receive (tier_name, drop_id_array)
    tuples for the ids each tier removed.

    ``semantic_encoder="lsa"`` enables tier 4 WITHOUT an external
    embedding table: the corpus-learned LSA encoder (stages/lsa.py,
    numpy-only) embeds the survivors and SemDeDup runs over those — the
    full cascade on a pure-text corpus with no model checkpoint."""
    if keep_policy not in ("min_id", "longest"):
        raise ValueError(f"unknown keep_policy: {keep_policy!r}")
    from imagededupx_ray.pipelines.dedup import run_dedup
    from imagededupx_ray.stages.cluster import dsu_components
    from imagededupx_ray.stages.semdedup import semdedup_verdicts
    from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

    res = dedup_result if dedup_result is not None else run_dedup(pages_ds, cfg)

    n_total = res.clusters.count()
    n_unique = res.docs_unique.count()
    removed1 = n_total - n_unique

    # tier 2 attribution: components over VERIFIED pairs only (the exact
    # tier's dup_map edges excluded) — non-root members are the near-tier
    # removals among exact-unique docs; dup-member-bounded driver set
    root2 = dsu_components(res.verified_pairs)
    if keep_policy == "longest":
        drop2 = drop_by_quality(root2, res.docs_unique)
    else:
        drop2 = np.fromiter(root2.keys(), dtype=np.int64, count=len(root2))
    removed2 = len(drop2)
    survivors2 = n_unique - removed2

    # tier 3: loose simhash hamming-band LSH over tier-2 survivors' codes
    sigs3 = _not_in_broadcast(
        res.signatures.select_columns(["doc_id", "simhash"]), "doc_id", drop2
    )
    pairs3 = hamming_band_pairs(
        sigs3, id_col="doc_id", code_col="simhash", hamming_max=loose_hamming_max
    )
    root3 = dsu_components(pairs3)
    if keep_policy == "longest":
        drop3 = drop_by_quality(root3, res.docs_unique)
    else:
        drop3 = np.fromiter(root3.keys(), dtype=np.int64, count=len(root3))
    removed3 = len(drop3)
    survivors3 = survivors2 - removed3
    if collect_drops is not None:
        collect_drops.append(("2_near", drop2))
        collect_drops.append(("3_template", drop3))

    rows = [
        ("1_exact", "sha256 collapse", n_total, removed1, n_unique),
        (
            "2_near",
            f"minhash-lsh verify (j>={cfg.jaccard_threshold} | "
            f"ham<={cfg.simhash_hamming_max})",
            n_unique,
            removed2,
            survivors2,
        ),
        (
            "3_template",
            f"simhash band lsh (ham<={loose_hamming_max})",
            survivors2,
            removed3,
            survivors3,
        ),
    ]

    if emb_ds is None and semantic_encoder == "lsa":
        # no external embedding table: learn the encoder from the corpus
        # itself (stages/lsa.py — numpy-only, fixed V×V global state) and
        # run tier 4 over the learned embeddings. Catches what tiers 1-3
        # structurally cannot (e.g. token-order paraphrases: bag-of-words
        # identical, shingles/simhash destroyed).
        from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit

        docs_txt = res.docs_unique.select_columns(["doc_id", "text"])
        model = lsa_fit(docs_txt, dim=lsa_dim, vocab=lsa_vocab)
        emb_ds = lsa_embed(docs_txt, model).map_batches(
            lambda t: t.rename_columns(["vec_id", "embedding"]),
            batch_format="pyarrow",
        )

    if emb_ds is not None:
        # survivors after tiers 1..3 = everything minus the dup members each
        # tier removed; Arrow hash joins cannot carry a list<float> payload
        # column, so the embedding restriction is an inverse broadcast filter
        # over the DUP-MEMBER-bounded drop union (exact members + near/
        # template non-roots) — the same bound as the pipeline's own exact
        # dup_ref broadcast
        dup_df = res.dup_map.to_pandas()
        drop1 = (
            dup_df["doc_id"].to_numpy().astype(np.int64)
            if "doc_id" in dup_df.columns  # empty dup_map may carry no schema
            else np.empty(0, dtype=np.int64)
        )
        # vec_id must share run_dedup's doc_id domain (hash64(url)); callers
        # remap before passing (queries.dedup_tiers). Materialized because
        # the SemDeDup stage consumes its input in several passes (centroid
        # sample, member sims, verdict scan)
        emb4 = _not_in_broadcast(
            emb_ds.select_columns(["vec_id", "embedding"]),
            "vec_id",
            np.concatenate([drop1, drop2, drop3]),
        ).materialize()
        verdicts = semdedup_verdicts(emb4, eps=semantic_eps, seed=cfg.perm_seed)
        removed4 = verdicts.filter(expr="keep == False").count()
        enc = "lsa " if semantic_encoder == "lsa" else ""
        rows.append(
            (
                "4_semantic",
                f"{enc}semdedup (cos>={semantic_eps})",
                survivors3,
                removed4,
                survivors3 - removed4,
            )
        )

    return pd.DataFrame(
        rows, columns=["tier", "method", "docs_in", "dup_docs_removed", "docs_out"]
    )


def cascade_survivors(
    pages_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    loose_hamming_max: int = 10,
    keep_policy: str = "min_id",
):
    """Materialize the CLEANED CORPUS the cascade's text tiers leave behind:
    returns (survivor docs Dataset, report DataFrame). The survivor set is
    docs_unique minus the near+template drop union — one streaming
    broadcast anti-filter over the already-deduped docs (drop arrays are
    dup-member-bounded), so the output write is the only corpus-sized
    cost. This is the artifact a corpus build actually ships; the report
    is the receipt."""
    from imagededupx_ray.pipelines.dedup import run_dedup

    res = run_dedup(pages_ds, cfg)
    drops: list = []
    report = dedup_tier_cascade(
        pages_ds,
        cfg=cfg,
        loose_hamming_max=loose_hamming_max,
        keep_policy=keep_policy,
        collect_drops=drops,
        dedup_result=res,
    )
    drop_all = (
        np.concatenate([a for _, a in drops])
        if drops
        else np.empty(0, dtype=np.int64)
    )
    survivors = _not_in_broadcast(res.docs_unique, "doc_id", drop_all)
    return survivors, report
