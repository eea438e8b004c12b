"""End-to-end web-corpus REFINEMENT: the RefinedWeb/CCNet build recipe as
one composable pipeline over a pages corpus, with a per-stage attrition
report (the "Macrodata Refinement" table every released corpus publishes —
RefinedWeb Penedo et al. 2023 Fig. 2; CCNet Wenzek et al. 2019 §4).

Stage order (each optional, each a stage this repo already ships):
  0. url_blocklist        — drop blocklisted-host pages first, dot-suffix
                            match (stages/urlfilter.host_blocklist_filter;
                            RefinedWeb §G.1 applies its curated domain
                            blocklist before any content work; off by
                            default)
  1. url_dedup            — canonical-url collapse, earliest crawl wins
                            (stages/urlfilter.py)
  1b. domain_cap          — <= max_per_host pages per url host, earliest
                            crawl first (stages/urlfilter.host_cap; off by
                            default)
  2. extract              — html -> text (stages/extract.py; count-neutral)
  3. line_dedup           — cross-document boilerplate line/paragraph
                            removal + low-retention doc drop
                            (stages/linededup.py; RefinedWeb drops docs
                            that lose most of their content)
  4. quality_filter       — C4/Gopher composite verdicts
                            (functions/textstats.quality_verdict_batch);
                            with ``quality_clf_threshold`` set, the rules
                            instead LABEL the corpus and a trained
                            fasttext-style linear model does the filtering
                            (stages/qualityclf.py — the GPT-3 deployment)
  4b. ppl_filter          — CCNet bigram-LM perplexity tail drop
                            (stages/ngramlm.py; off by default)
  5. dedup tiers          — exact -> MinHash-LSH near -> SimHash template
                            (-> SemDeDup semantic with the LSA encoder)
                            via pipelines/tiers.cascade semantics
  6. decontaminate        — drop every doc whose dup cluster touches a
                            held-out corpus (pipelines/cross.py)

The reference refines one modality at a time (improved_faiss_detector.py
dedups files; similarities' examples chain manually); web-scale corpus
builds run exactly this cascade, so the composition is itself an operator
with a receipt. Every stage streams or exchanges exactly as its underlying
implementation does — this module only sequences materialized Datasets and
counts them (counts are the report's content, and each stage's input is
consumed once).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from imagededupx_ray.config import DEFAULT_CONFIG, DedupConfig


def _pagesify(docs_ds):
    """docs (doc_id, url, warc_ts?, text, ...) -> pages shape whose
    extraction falls back to ``text`` (html column absent), so downstream
    run_dedup re-derives the SAME hash64(url) doc_id domain."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"]
                if "warc_ts" in batch.column_names
                else pa.nulls(n, pa.timestamp("us")),
                "text": batch["text"],
                "lang": batch["lang"]
                if "lang" in batch.column_names
                else pa.nulls(n, pa.string()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def _token_count(ds) -> int:
    """Whitespace token count of a docs Dataset — ONE streaming keyless
    aggregate (util.partial_groupby with no keys: per-block int64 partials,
    fanout-bounded combine). Same M4 tokenizer as docs_token_stats, so the
    receipt's token figures live in the unit corpus papers publish
    (RefinedWeb Fig. 2 is drawn in tokens, not documents)."""
    from imagededupx_ray.functions.text import tokenize_batch
    from imagededupx_ray.util import partial_groupby

    def tok(batch: pa.Table) -> pa.Table:
        _, offsets = tokenize_batch(batch["text"])
        return pa.table({"n": pa.array([int(offsets[-1])], type=pa.int64())})

    out = partial_groupby(
        ds.map_batches(tok, batch_format="pyarrow"), [], [("sum", "n", "n")]
    ).to_pandas()
    return int(out["n"].iloc[0]) if len(out) else 0


def refine_corpus(
    pages_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    *,
    count_tokens: bool = False,
    blocklist_hosts=None,
    with_url_dedup: bool = True,
    max_per_host: int | None = None,
    line_min_doc_rep: int | None = 30,
    line_delimiter: str = " . ",
    min_line_retention: float = 0.3,
    with_quality: bool = True,
    quality_kwargs: dict | None = None,
    quality_clf_threshold: float | None = None,
    quality_clf_iters: int = 40,
    ppl_tail_drop: bool = False,
    ppl_lam: float = 0.8,
    keep_policy: str = "longest",
    semantic_encoder: str | None = None,
    decontam_ds=None,
):
    """Run the full refinement cascade; returns ``(survivors_ds, report)``.

    ``survivors_ds`` is the cleaned docs Dataset (doc_id, url, text, ...);
    ``report`` is the attrition DataFrame — one row per executed stage:
    (stage, docs_in, docs_out, removed), with the dedup cascade's per-tier
    rows inlined as ``tier*`` stages. ``count_tokens=True`` adds a
    ``tokens_out`` column (whitespace tokens surviving each stage — the
    unit corpus papers publish), an ``input`` baseline row and a
    ``dedup_cascade_total`` summary row (per-tier rows count docs only);
    each count is one streaming keyless aggregate of the already
    materialized stage output. ``line_min_doc_rep=None`` /
    ``with_quality=False`` / ``decontam_ds=None`` skip their stages.
    ``max_per_host`` (default off) caps pages per url host after url dedup.
    ``blocklist_hosts`` (default off; a path to a hosts file or an iterable
    of hosts) drops blocklisted-host pages FIRST — dot-suffix semantics,
    see stages/urlfilter.host_blocklist_filter.
    ``min_line_retention`` drops docs keeping less than that fraction of
    their pre-scrub characters (RefinedWeb's document-level line-filter
    drop rule); 0 keeps every doc. ``quality_clf_threshold`` (default off)
    swaps the hard rule filter for the trained-classifier deployment: the
    rules label, a ``quality_clf_iters``-step bit-identical logistic fit
    learns them, and docs keep iff model prob >= threshold — the
    distillation generalizes past the rules, so junk-vocab docs that slip
    the length gates are still dropped. ``ppl_tail_drop`` fits the hashed bigram
    LM on the quality-filtered corpus and drops the perplexity tail tertile
    (CCNet §4.3). ``semantic_encoder="lsa"`` enables the
    cascade's 4th (semantic) tier with the corpus-learned LSA encoder."""
    from imagededupx_ray.pipelines.tiers import (
        _not_in_broadcast,
        dedup_tier_cascade,
    )
    from imagededupx_ray.stages.extract import extract_stage

    rows: list[tuple[str, int, int, int | None]] = []
    ds = pages_ds.materialize()
    n = ds.count()

    def toks(d) -> int | None:
        # pre-extract pages may be html-only; token accounting starts once
        # a text column exists
        if not count_tokens or "text" not in d.schema().names:
            return None
        return _token_count(d)

    if count_tokens:
        rows.append(("input", n, n, toks(ds)))

    def step(name: str, new_ds) -> None:
        nonlocal ds, n
        new_ds = new_ds.materialize()
        m = new_ds.count()
        rows.append((name, n, m, toks(new_ds)))
        ds, n = new_ds, m

    if blocklist_hosts and "url" in ds.schema().names:
        from imagededupx_ray.stages.urlfilter import host_blocklist_filter

        # FIRST: dropping a blocklisted page here costs nothing downstream
        # (RefinedWeb's url filtering precedes every content stage)
        step("url_blocklist", host_blocklist_filter(ds, blocklist_hosts))

    if with_url_dedup and "url" in ds.schema().names:
        from imagededupx_ray.stages.urlfilter import url_dedup

        step("url_dedup", url_dedup(ds).drop_columns(["canonical_url"]))

    if max_per_host and "url" in ds.schema().names:
        from imagededupx_ray.stages.urlfilter import host_cap

        # per-domain volume cap straight after url identity is settled —
        # hot hosts must not dominate the mix the later stages refine
        step("domain_cap", host_cap(ds, max_per_host).drop_columns(["host"]))

    # extraction is count-neutral; recorded so the receipt shows the
    # text domain every later stage operates on
    step("extract", extract_stage(ds))

    if line_min_doc_rep:
        from imagededupx_ray.stages.linededup import dedup_lines

        cleaned, _ = dedup_lines(
            ds,
            text_col="text",
            delimiter=line_delimiter,
            min_doc_rep=line_min_doc_rep,
        )
        keep_frac = float(min_line_retention)

        def drop_low_retention(batch: pa.Table) -> pa.Table:
            kept = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
            removed = batch["line_chars_removed"].to_numpy(zero_copy_only=False)
            before = np.maximum(kept + removed, 1).astype(np.float64)
            mask = (kept / before) >= keep_frac
            return batch.filter(pa.array(mask)).drop_columns(
                ["n_lines", "n_lines_removed", "line_chars_removed"]
            )

        step("line_dedup", cleaned.map_batches(drop_low_retention, batch_format="pyarrow"))

    if with_quality:
        from imagededupx_ray.functions.textstats import quality_verdict_batch

        kw = quality_kwargs or {}

        if quality_clf_threshold is not None:
            # GPT-3-style deployment (Brown et al. 2020 App. A; Touvron et
            # al. 2023 §2): the C4/Gopher rules produce LABELS, a
            # fasttext-style linear model (stages/qualityclf.py) is trained
            # on them, and the DISTILLED model does the filtering — it
            # generalizes past the rules (junk-vocab docs that slip the
            # length gates still score low, because their hashed n-grams
            # co-occur with rule failures) and the keep threshold is
            # calibratable. Fit = T exact integer tree-reduces; filter =
            # one broadcast scan (all columns pass through).
            from imagededupx_ray.stages.qualityclf import (
                fit_quality_classifier,
                quality_filter_by_model,
            )

            def label_by_rules(batch: pa.Table) -> pa.Table:
                verdicts = quality_verdict_batch(batch, **kw)
                return batch.append_column(
                    "label", pc.cast(verdicts["keep"], pa.int8())
                )

            w = fit_quality_classifier(
                ds.map_batches(label_by_rules, batch_format="pyarrow"),
                iters=quality_clf_iters,
            )
            step(
                "quality_clf",
                quality_filter_by_model(ds, w, quality_clf_threshold),
            )
        else:

            def quality_keep(batch: pa.Table) -> pa.Table:
                verdicts = quality_verdict_batch(batch, **kw)
                return batch.filter(verdicts["keep"])

            step(
                "quality_filter",
                ds.map_batches(quality_keep, batch_format="pyarrow"),
            )

    if ppl_tail_drop:
        # CCNet LM-perplexity gate (Wenzek et al. 2019 §4.3): fit the hashed
        # bigram LM on the surviving corpus, drop the tail tertile. Fit is
        # two fixed-size integer tree-reduces; the filter is a second
        # streaming scan against the broadcast LM (stages/ngramlm.py)
        from imagededupx_ray.stages.ngramlm import (
            bigram_lm_counts,
            bigram_logppl,
            ppl_cutoffs,
            ppl_tail_filter,
        )

        counts = bigram_lm_counts(ds, V1=1 << 16, V2=1 << 18)
        cutoffs = ppl_cutoffs(bigram_logppl(ds, counts, lam=ppl_lam))
        step("ppl_filter", ppl_tail_filter(ds, counts, cutoffs[1], lam=ppl_lam))

    # dedup cascade (the flagship exchange stack) over the refined text
    pages2 = _pagesify(ds)
    drops: list = []
    from imagededupx_ray.pipelines.dedup import run_dedup

    res = run_dedup(pages2, cfg)
    tier_report = dedup_tier_cascade(
        pages2,
        cfg=cfg,
        keep_policy=keep_policy,
        collect_drops=drops,
        dedup_result=res,
        semantic_encoder=semantic_encoder,
    )
    drop_all = (
        np.concatenate([a for _, a in drops])
        if drops
        else np.empty(0, dtype=np.int64)
    )
    survivors = _not_in_broadcast(res.docs_unique, "doc_id", drop_all)
    n_before_cascade = n
    for t in tier_report.itertuples(index=False):
        # per-tier rows count docs only — intermediate tier survivor sets
        # are never materialized as text; the cascade's total token
        # attrition lands on the summary row below
        rows.append((f"tier{t.tier}_{t.method}", int(t.docs_in), int(t.docs_out), None))
    ds = survivors.materialize()
    n = ds.count()
    if count_tokens:
        rows.append(("dedup_cascade_total", n_before_cascade, n, toks(ds)))

    if decontam_ds is not None:
        from imagededupx_ray.pipelines.cross import cross_dedup

        # collect only the CONTAMINATED ids (contamination-bounded) and
        # broadcast-anti-filter — the clean set is corpus-sized and must
        # never be driver-collected
        bad: list = []
        cross_dedup(_pagesify(ds), decontam_ds, cfg, collect_bad=bad)
        bad_ids = bad[0] if bad else np.empty(0, dtype=np.int64)
        step("decontaminate", _not_in_broadcast(ds, "doc_id", bad_ids))

    report = pd.DataFrame(
        rows, columns=["stage", "docs_in", "docs_out", "tokens_out"]
    )
    report["removed"] = report["docs_in"] - report["docs_out"]
    if not count_tokens:
        report = report.drop(columns=["tokens_out"])
    return ds, report
