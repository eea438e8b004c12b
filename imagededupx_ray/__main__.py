"""CLI entry points (SURVEY.md §2.10; reference analogue: the ``fire`` CLI
verbs in similarities/similarities/cli.py:15-29 and the detector
``--mode build|update|search`` main, improved_faiss_detector.py:612-738).

    python -m imagededupx_ray dedup   --input DIR --output DIR
    python -m imagededupx_ray build   --input DIR --store DIR --snapshot ID
    python -m imagededupx_ray merge   --input DIR --store DIR --snapshot ID --parent ID
    python -m imagededupx_ray spans   --input DIR --output DIR
    python -m imagededupx_ray synth   --output DIR --pages N
    python -m imagededupx_ray media   --modality image|audio|video --input DIR --output DIR
    python -m imagededupx_ray export  --input DIR --output DIR --seed S --shards N

Owns its Ray session (guarded init + shutdown); the driver contract
(__ray_entry__) never goes through here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init() -> bool:
    """Init Ray if no session exists; returns True iff WE initialized it
    (an embedding caller's live session must not be shut down by the CLI)."""
    import os

    import ray

    inited = False
    if not ray.is_initialized():
        # Under `ray job submit` / an existing cluster, RAY_ADDRESS points at
        # the running GCS and we attach; standalone runs get a local instance.
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
        inited = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return inited


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="imagededupx_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="one-shot near-dup pipeline: pages parquet -> clusters parquet")
    d.add_argument("--input", required=True, help="directory of pages parquet files")
    d.add_argument("--output", required=True)
    d.add_argument(
        "--partition-shards",
        type=int,
        default=0,
        help="write output partitioned into shard=<doc_id %% N> directories "
        "(resumable: a re-run can skip finished shard dirs); 0 = flat",
    )
    d.add_argument(
        "--url-dedup",
        action="store_true",
        help="pre-step: canonicalize urls (lowercase host, strip default "
        "ports/fragments/tracking params/trailing slash) and keep one page "
        "per canonical url (earliest warc_ts) before content dedup",
    )
    d.add_argument(
        "--jaccard",
        type=float,
        default=None,
        help="near-dup jaccard threshold (default: config default)",
    )
    d.add_argument(
        "--auto-plan",
        action="store_true",
        help="derive (lsh_bands, lsh_rows) from --jaccard via the S-curve "
        "planner (config.lsh_plan, recall target 0.99) instead of the "
        "config defaults",
    )
    d.add_argument(
        "--signer",
        choices=("kperm", "oph"),
        default="kperm",
        help="minhash signer: kperm = 128 independent permutations (the "
        "north-star config); oph = one-permutation hashing with optimal "
        "densification — one hash per shingle, same signature shape and "
        "LSH semantics, ~100x less signing compute at equal recall",
    )

    b = sub.add_parser("build", help="checkpointed full build into a snapshot store")
    b.add_argument("--input", required=True)
    b.add_argument("--store", required=True)
    b.add_argument("--snapshot", required=True)

    m = sub.add_parser("merge", help="incremental merge of a new snapshot")
    m.add_argument("--input", required=True)
    m.add_argument("--store", required=True)
    m.add_argument("--snapshot", required=True)
    m.add_argument("--parent", default=None, help="defaults to the store's latest snapshot")
    m.add_argument(
        "--tombstones",
        default=None,
        help="file of urls (one per line) deleted in this snapshot",
    )

    c = sub.add_parser(
        "compact",
        help="fold a snapshot stage's multi-part lineage (+ patch exclusions) "
        "into one fresh part — maintenance for long merge chains",
    )
    c.add_argument("--store", required=True)
    c.add_argument("--snapshot", default=None, help="defaults to the latest snapshot")
    c.add_argument(
        "--stage",
        default="clusters",
        help="stage to compact (clusters, signatures, lsh_index, verified_pairs, docs_meta)",
    )

    s = sub.add_parser("spans", help="substring spans for verified pairs of a dedup run")
    s.add_argument("--input", required=True, help="pages parquet directory")
    s.add_argument("--output", required=True)

    tr = sub.add_parser(
        "tiers",
        help="tiered dedup cascade report: exact -> near -> template "
        "[-> semantic when --embeddings given]",
    )
    tr.add_argument("--input", required=True, help="pages parquet directory")
    tr.add_argument(
        "--embeddings",
        default=None,
        help="parquet of (vec_id, embedding) with vec_id in the pipeline's "
        "hash64(url) doc_id domain; enables the semantic tier",
    )
    tr.add_argument("--output", default=None, help="also write the report parquet here")
    tr.add_argument("--loose-hamming", type=int, default=10)
    tr.add_argument("--eps", type=float, default=0.4)
    tr.add_argument(
        "--keep-policy",
        choices=["min_id", "longest"],
        default="min_id",
        help="per-component survivor rule for the near/template tiers: "
        "deterministic min doc_id, or the longest member by n_bytes "
        "(SlimPajama/RefinedWeb rule)",
    )
    tr.add_argument(
        "--semantic-encoder",
        choices=["lsa"],
        default=None,
        help="enable the semantic tier WITHOUT --embeddings by learning an "
        "LSA encoder from the corpus itself (numpy-only)",
    )
    tr.add_argument(
        "--survivors-output",
        default=None,
        help="also write the cleaned corpus (cascade text-tier survivors) "
        "as parquet to this directory",
    )

    rf = sub.add_parser(
        "refine",
        help="end-to-end corpus refinement: url dedup -> extract -> line "
        "boilerplate dedup -> quality filter [-> ppl tail drop] -> dedup "
        "tiers [-> decontaminate vs --heldout]; prints the per-stage "
        "attrition report",
    )
    rf.add_argument("--input", required=True, help="pages parquet directory")
    rf.add_argument("--output", default=None, help="write survivor docs parquet here")
    rf.add_argument("--report-output", default=None, help="write the report parquet here")
    rf.add_argument("--heldout", default=None, help="held-out pages parquet dir to decontaminate against")
    rf.add_argument("--line-min-doc-rep", type=int, default=30)
    rf.add_argument("--line-delimiter", default=" . ")
    rf.add_argument("--min-line-retention", type=float, default=0.3)
    rf.add_argument("--no-url-dedup", action="store_true")
    rf.add_argument(
        "--blocklist",
        default=None,
        help="host blocklist file (one host per line, # comments); pages "
        "whose url host matches a blocked host or any dot-suffix of one "
        "are dropped before every other stage",
    )
    rf.add_argument(
        "--max-per-host",
        type=int,
        default=None,
        help="cap pages per url host (earliest crawl first) after url dedup",
    )
    rf.add_argument("--no-quality", action="store_true")
    rf.add_argument(
        "--quality-clf",
        type=float,
        default=None,
        metavar="THRESHOLD",
        help="swap the hard rule filter for a trained fasttext-style "
        "classifier: the C4/Gopher rules label the corpus, the distilled "
        "linear model keeps docs with prob >= THRESHOLD (GPT-3 App. A)",
    )
    rf.add_argument(
        "--ppl-tail-drop",
        action="store_true",
        help="fit a hashed bigram LM on the filtered corpus and drop the "
        "perplexity tail tertile (CCNet)",
    )
    rf.add_argument(
        "--count-tokens",
        action="store_true",
        help="add a tokens_out column to the attrition report (whitespace "
        "tokens surviving each stage — the unit corpus papers publish)",
    )
    rf.add_argument(
        "--keep-policy", choices=["min_id", "longest"], default="longest"
    )
    rf.add_argument("--semantic-encoder", choices=["lsa"], default=None)

    cx = sub.add_parser(
        "cross",
        help="cross-corpus decontamination: drop from A every doc whose dup "
        "cluster touches B (exact/near/transitive at pipeline thresholds)",
    )
    cx.add_argument("--input-a", required=True, help="corpus-A pages parquet dir")
    cx.add_argument("--input-b", required=True, help="corpus-B pages parquet dir")
    cx.add_argument(
        "--output", default=None, help="write clean-A (doc_id, cluster_id) parquet here"
    )

    tp = sub.add_parser(
        "topics",
        help="distributed spherical k-means topic clustering: embeddings "
        "parquet (vec_id, embedding) OR pages parquet via the corpus-learned "
        "LSA encoder -> per-cluster report [+ assignment parquet]",
    )
    tp.add_argument("--input", required=True, help="embeddings or pages parquet dir")
    tp.add_argument("--clusters", type=int, default=8)
    tp.add_argument("--iters", type=int, default=10)
    tp.add_argument(
        "--encoder",
        choices=["none", "lsa"],
        default="none",
        help="'lsa': treat --input as pages/docs with a text column and "
        "embed with the corpus-learned LSA encoder first",
    )
    tp.add_argument("--lsa-dim", type=int, default=32)
    tp.add_argument("--lsa-vocab", type=int, default=1024)
    tp.add_argument(
        "--output", default=None, help="write (vec_id, cluster, sim) parquet here"
    )

    ln = sub.add_parser(
        "lineage",
        help="print a snapshot's lineage chain + per-stage metrics from the manifests",
    )
    ln.add_argument("--store", required=True, help="snapshot store root")
    ln.add_argument("--snapshot", help="snapshot name (default: latest complete)")

    se = sub.add_parser(
        "search",
        help="ad-hoc text retrieval over a docs parquet: BM25 / TF-IDF "
        "cosine / learned LSA / RRF ensemble",
    )
    se.add_argument("--input", required=True, help="parquet with doc_id+text")
    se.add_argument(
        "--query", action="append", required=True, help="query string (repeatable)"
    )
    se.add_argument(
        "--engine",
        choices=["bm25", "tfidf", "lsa", "ensemble"],
        default="bm25",
    )
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--output", help="optionally also write results parquet")

    bp = sub.add_parser(
        "bpe",
        help="train a BPE subword vocab on a text parquet; optionally "
        "encode it (stages/bpe.py)",
    )
    bp.add_argument("--input", required=True, help="parquet dir/file with doc_id+text")
    bp.add_argument("--output", required=True, help="output dir (merges/, tokens/)")
    bp.add_argument("--merges", type=int, default=1000, help="merge rules to learn")
    bp.add_argument("--max-words", type=int, default=30000, help="trainer word cap")
    bp.add_argument(
        "--encode",
        action="store_true",
        help="also encode the input and write (doc_id, n_tokens, tokens)",
    )

    g = sub.add_parser("synth", help="write a synthetic pages corpus")
    g.add_argument("--output", required=True)
    g.add_argument("--pages", type=int, default=10000)
    g.add_argument("--seed", type=int, default=42)

    md = sub.add_parser(
        "media",
        help="multimodal near-dup mining: payload parquet -> pairs parquet",
    )
    md.add_argument("--modality", choices=["image", "audio", "video"], required=True)
    md.add_argument("--input", help="parquet dir of (id, payload, format) rows")
    md.add_argument("--output", required=True)
    md.add_argument(
        "--synth",
        type=int,
        default=0,
        help="generate a synthetic corpus of this size instead of --input",
    )
    md.add_argument(
        "--encoder",
        default=None,
        help="plugin:<module>:<Class> heavy-encoder spec (stages/plugin.py "
        "contract): swaps the built-in image feature block for YOUR model "
        "(one load per actor) and mines embedding-cosine dup pairs on its "
        "output; image modality only",
    )
    md.add_argument(
        "--encoder-gpus",
        type=float,
        default=0.0,
        help="GPU share per encoder actor (forwarded to map_batches num_gpus)",
    )
    md.add_argument(
        "--encoder-threshold",
        type=float,
        default=0.99,
        help="embedding-cosine dup threshold for the --encoder path",
    )

    ex = sub.add_parser(
        "export",
        help="seeded deterministic global shuffle -> resumable shard=K/ "
        "parquet training shards + verifiable manifest",
    )
    ex.add_argument("--input", required=True, help="parquet dir with a text column")
    ex.add_argument("--output", required=True)
    ex.add_argument("--seed", default="42")
    ex.add_argument("--shards", type=int, default=16)
    ex.add_argument("--text-col", default="text")
    ex.add_argument(
        "--no-sort",
        action="store_true",
        help="skip intra-shard key ordering (shuffle-free export for loaders "
        "that shuffle their read window anyway)",
    )

    args = p.parse_args(argv)

    if args.cmd == "export":
        _owns_ray = _ray_init()
        import ray
        import ray.data as rd

        from imagededupx_ray.pipelines.export import shuffle_export

        try:
            manifest = shuffle_export(
                rd.read_parquet(args.input),
                args.output,
                seed=args.seed,
                n_shards=args.shards,
                text_col=args.text_col,
                sort_within_shards=not args.no_sort,
            )
            print(
                json.dumps(
                    {
                        "output": args.output,
                        "n_shards": int(len(manifest)),
                        "n_docs": int(manifest["n_docs"].sum()),
                        "manifest": manifest.to_dict(orient="records"),
                    }
                )
            )
            return 0
        finally:
            if _owns_ray:
                ray.shutdown()

    if args.cmd == "media":
        _owns_ray = _ray_init()
        import ray
        import ray.data as rd

        try:
            if args.modality == "image":
                from imagededupx_ray.stages.multimodal import (
                    perceptual_hashes,
                    synthetic_mixed_images,
                )
                from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

                ds = (
                    rd.from_arrow(synthetic_mixed_images(args.synth))
                    if args.synth
                    else rd.read_parquet(args.input)
                )
                if args.encoder:
                    # plugin heavy-encoder path: the user's model class runs
                    # as the actor-pool stage (one load per actor, GPU share
                    # per --encoder-gpus); its `embedding` output feeds the
                    # IVF cosine dup miner unchanged
                    from imagededupx_ray.stages.ann import ivf_dup_pairs
                    from imagededupx_ray.stages.plugin import encoder_stage

                    emb = encoder_stage(
                        ds,
                        args.encoder,
                        concurrency=(2, 8),
                        batch_size=8,
                        num_gpus=args.encoder_gpus,
                    )
                    # miner wants (vec_id, embedding); accept image_id too
                    emb = emb.map_batches(
                        lambda t: t.rename_columns(
                            [
                                "vec_id" if c == "image_id" else c
                                for c in t.column_names
                            ]
                        ),
                        batch_format="pyarrow",
                    )
                    pairs = ivf_dup_pairs(emb, threshold=args.encoder_threshold)
                else:
                    hashes = perceptual_hashes(ds)
                    pairs = hamming_band_pairs(
                        hashes.select_columns(["image_id", "phash"]),
                        id_col="image_id",
                        code_col="phash",
                        hamming_max=10,
                    )
            elif args.modality == "audio":
                from imagededupx_ray.stages.audio import (
                    audio_features,
                    fingerprint_dup_pairs,
                    synthetic_wav_clips,
                )

                ds = (
                    rd.from_arrow(synthetic_wav_clips(args.synth))
                    if args.synth
                    else rd.read_parquet(args.input)
                )
                pairs = fingerprint_dup_pairs(audio_features(ds))
            else:
                from imagededupx_ray.stages.video import (
                    synthetic_video_clips,
                    video_dup_pairs,
                    video_frame_hashes,
                )

                ds = (
                    rd.from_arrow(synthetic_video_clips(args.synth))
                    if args.synth
                    else rd.read_parquet(args.input)
                )
                pairs = video_dup_pairs(video_frame_hashes(ds))
            pairs.write_parquet(args.output)
            print(
                json.dumps(
                    {
                        "modality": args.modality,
                        "pairs": args.output,
                        "rows": rd.read_parquet(args.output).count(),
                    }
                )
            )
            return 0
        finally:
            if _owns_ray:
                ray.shutdown()

    if args.cmd == "synth":
        from imagededupx_ray.sources.synthetic import write_pages_corpus

        out = write_pages_corpus(args.output, n_pages=args.pages, seed=args.seed)
        print(json.dumps({"written": out, "n_pages": args.pages}))
        return 0

    if args.cmd == "search":
        _owns_ray = _ray_init()
        import ray
        import ray.data as rd

        try:
            docs = (
                rd.read_parquet(args.input)
                .select_columns(["doc_id", "text"])
                .materialize()
            )
            if args.engine == "bm25":
                from imagededupx_ray.stages.bm25 import bm25_topk

                res = bm25_topk(docs, args.query, k=args.k)
            elif args.engine == "tfidf":
                from imagededupx_ray.stages.tfidf import tfidf_topk

                res = tfidf_topk(docs, args.query, k=args.k)
            elif args.engine == "lsa":
                from imagededupx_ray.stages.lsa import lsa_topk

                res = lsa_topk(docs, args.query, k=args.k)
            else:  # ensemble: RRF of BM25 + TF-IDF (reference
                # EnsembleSimilarity, ensemble_similarity.py:27-170)
                from imagededupx_ray.functions.fusion import reciprocal_rank_fusion
                from imagededupx_ray.stages.bm25 import bm25_topk
                from imagededupx_ray.stages.tfidf import tfidf_topk

                res = reciprocal_rank_fusion(
                    [
                        bm25_topk(docs, args.query, k=3 * args.k),
                        tfidf_topk(docs, args.query, k=3 * args.k),
                    ],
                    k=args.k,
                )
            if args.output:
                import pyarrow as _pa
                import pyarrow.parquet as _pq

                os.makedirs(args.output, exist_ok=True)
                _pq.write_table(
                    _pa.Table.from_pandas(res, preserve_index=False),
                    os.path.join(args.output, "results.parquet"),
                )
            out = {
                "engine": args.engine,
                "k": args.k,
                "results": [
                    {
                        "query": args.query[int(qi)],
                        "hits": [
                            {
                                "doc_id": int(r.doc_id),
                                "score": float(r.score),
                                "rank": int(r.rank),
                            }
                            for r in g.itertuples()
                        ],
                    }
                    for qi, g in res.groupby("query_id", sort=True)
                ],
            }
            print(json.dumps(out))
            return 0
        finally:
            if _owns_ray:
                ray.shutdown()

    if args.cmd == "bpe":
        _owns_ray = _ray_init()
        import ray
        import ray.data as rd

        try:
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            from imagededupx_ray.stages.bpe import (
                bpe_encode,
                bpe_train_from_counts,
                bpe_vocab,
                bpe_word_counts,
            )

            docs = rd.read_parquet(args.input)
            wc = bpe_word_counts(docs, max_words=args.max_words)
            merges = bpe_train_from_counts(
                wc["word"].tolist(), wc["n"].to_numpy(), args.merges
            )
            os.makedirs(args.output, exist_ok=True)
            _pq.write_table(
                _pa.table(
                    {
                        "rank": _pa.array(range(len(merges)), type=_pa.int32()),
                        "left": _pa.array([a for a, _ in merges]),
                        "right": _pa.array([b for _, b in merges]),
                    }
                ),
                os.path.join(args.output, "merges.parquet"),
            )
            vocab = bpe_vocab(merges, wc)
            report = {
                "output": args.output,
                "n_merges": len(merges),
                "n_words_seen": int(len(wc)),
                "vocab_size": len(vocab),
            }
            if args.encode:
                enc = bpe_encode(docs, merges)
                enc.write_parquet(os.path.join(args.output, "tokens"))
                report["encoded"] = os.path.join(args.output, "tokens")
            print(json.dumps(report))
            return 0
        finally:
            if _owns_ray:
                ray.shutdown()

    if args.cmd == "lineage":
        # manifests are plain JSON on disk — no Ray session needed
        from imagededupx_ray.config import DEFAULT_CONFIG
        from imagededupx_ray.state.checkpoint import SnapshotStore

        store = SnapshotStore(args.store, DEFAULT_CONFIG)
        name = args.snapshot or store.latest_snapshot()
        if name is None:
            print(json.dumps({"error": "no complete snapshot in store"}))
            return 1
        chain = []
        seen = set()
        while name is not None and name not in seen:
            seen.add(name)
            m = store.manifest(name)
            if m is None:
                chain.append({"snapshot": name, "error": "manifest missing"})
                break
            chain.append(
                {
                    "snapshot": name,
                    "parent": m.get("parent"),
                    "config_hash": m.get("config_hash"),
                    "complete": store.is_complete(name),
                    "stages": {
                        s: {
                            "rows": e.get("rows"),
                            "wall_sec": e.get("wall_sec"),
                            "n_parts": len(e.get("dirs", [])),
                            "own_part": e.get("own"),
                        }
                        for s, e in m.get("stages", {}).items()
                    },
                }
            )
            name = m.get("parent")
        print(json.dumps({"store": args.store, "lineage": chain}, indent=1))
        return 0

    _owns_ray = _ray_init()
    import ray
    import ray.data as rd

    from imagededupx_ray.config import DEFAULT_CONFIG

    try:
        if args.cmd == "dedup":
            from imagededupx_ray.pipelines.dedup import run_dedup

            pages = rd.read_parquet(args.input)
            if args.url_dedup:
                from imagededupx_ray.stages.urlfilter import url_dedup

                pages = url_dedup(pages).drop_columns(["canonical_url"])
            cfg = DEFAULT_CONFIG
            if args.auto_plan:
                from imagededupx_ray.config import lsh_plan

                t = args.jaccard if args.jaccard is not None else cfg.jaccard_threshold
                cfg, plan_stats = lsh_plan(t, target_recall=0.99)
                print(json.dumps({"lsh_plan": {
                    "bands": cfg.lsh_bands, "rows": cfg.lsh_rows, **plan_stats
                }}))
            elif args.jaccard is not None:
                from dataclasses import replace

                cfg = replace(cfg, jaccard_threshold=args.jaccard)
            if args.signer != cfg.signer:
                from dataclasses import replace

                cfg = replace(cfg, signer=args.signer)
            res = run_dedup(pages, cfg)
            clusters = res.clusters
            if args.partition_shards > 0:
                import pyarrow as pa

                n_shards = args.partition_shards

                def with_shard(t: pa.Table) -> pa.Table:
                    import numpy as np

                    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                    return t.append_column(
                        "shard",
                        pa.array((ids % n_shards).astype(np.int32), type=pa.int32()),
                    )

                clusters = clusters.map_batches(with_shard, batch_format="pyarrow")
                clusters.write_parquet(args.output, partition_cols=["shard"])
            else:
                clusters.write_parquet(args.output)
            print(json.dumps({"clusters": args.output, "rows": res.clusters.count()}))
        elif args.cmd == "compact":
            from imagededupx_ray.config import DEFAULT_CONFIG
            from imagededupx_ray.state.checkpoint import SnapshotStore

            store = SnapshotStore(args.store, DEFAULT_CONFIG)
            snap = args.snapshot or store.latest_snapshot()
            if snap is None:
                print(json.dumps({"error": "store has no snapshots"}))
                return 2
            final = store.compact_stage(snap, args.stage)
            print(
                json.dumps(
                    {
                        "snapshot": snap,
                        "stage": args.stage,
                        "dir": final,
                        "rows": store.manifest(snap)["stages"][args.stage]["rows"],
                    }
                )
            )
        elif args.cmd in ("build", "merge"):
            from imagededupx_ray.pipelines.incremental import build_snapshot
            from imagededupx_ray.state.checkpoint import SnapshotStore

            store = SnapshotStore(args.store, DEFAULT_CONFIG)
            parent = getattr(args, "parent", None)
            if args.cmd == "merge" and parent is None:
                parent = store.latest_snapshot()
            tombstones = None
            if getattr(args, "tombstones", None):
                with open(args.tombstones) as f:
                    tombstones = [l.strip() for l in f if l.strip()]
            clusters = build_snapshot(
                store,
                rd.read_parquet(args.input),
                args.snapshot,
                parent=parent,
                tombstones=tombstones,
            )
            print(
                json.dumps(
                    {
                        "snapshot": args.snapshot,
                        "parent": parent,
                        "rows": clusters.count(),
                        "manifest": store.manifest(args.snapshot),
                    }
                )
            )
        elif args.cmd == "spans":
            from imagededupx_ray.pipelines.dedup import run_dedup
            from imagededupx_ray.stages.spans import substring_spans

            res = run_dedup(rd.read_parquet(args.input), DEFAULT_CONFIG)
            spans = substring_spans(
                res.verified_pairs,
                res.docs_unique.select_columns(["doc_id", "text"]),
                DEFAULT_CONFIG,
            )
            spans.write_parquet(args.output)
            print(json.dumps({"spans": args.output, "rows": spans.count()}))
        elif args.cmd == "tiers":
            from imagededupx_ray.pipelines.tiers import dedup_tier_cascade

            emb = rd.read_parquet(args.embeddings) if args.embeddings else None
            if args.survivors_output:
                from imagededupx_ray.pipelines.tiers import cascade_survivors

                survivors, report = cascade_survivors(
                    rd.read_parquet(args.input),
                    cfg=DEFAULT_CONFIG,
                    loose_hamming_max=args.loose_hamming,
                    keep_policy=args.keep_policy,
                )
                survivors.write_parquet(args.survivors_output)
            else:
                report = dedup_tier_cascade(
                    rd.read_parquet(args.input),
                    emb_ds=emb,
                    cfg=DEFAULT_CONFIG,
                    loose_hamming_max=args.loose_hamming,
                    semantic_eps=args.eps,
                    keep_policy=args.keep_policy,
                    semantic_encoder=args.semantic_encoder,
                )
            if args.output:
                import pyarrow.parquet as pq

                import pyarrow as pa

                pq.write_table(pa.Table.from_pandas(report), args.output)
            print(json.dumps({"tiers": report.to_dict(orient="records")}))
        elif args.cmd == "refine":
            from imagededupx_ray.pipelines.refine import refine_corpus

            heldout = rd.read_parquet(args.heldout) if args.heldout else None
            survivors, report = refine_corpus(
                rd.read_parquet(args.input),
                DEFAULT_CONFIG,
                blocklist_hosts=args.blocklist,
                with_url_dedup=not args.no_url_dedup,
                max_per_host=args.max_per_host,
                line_min_doc_rep=args.line_min_doc_rep or None,
                line_delimiter=args.line_delimiter,
                min_line_retention=args.min_line_retention,
                count_tokens=args.count_tokens,
                with_quality=not args.no_quality,
                quality_clf_threshold=args.quality_clf,
                ppl_tail_drop=args.ppl_tail_drop,
                keep_policy=args.keep_policy,
                semantic_encoder=args.semantic_encoder,
                decontam_ds=heldout,
            )
            if args.output:
                survivors.write_parquet(args.output)
            if args.report_output:
                import pyarrow as pa
                import pyarrow.parquet as pq

                pq.write_table(pa.Table.from_pandas(report), args.report_output)
            # docs-only tier rows carry NaN tokens_out -> null, not bare NaN
            clean = report.astype(object).where(report.notna(), None)
            print(json.dumps({"refine": clean.to_dict(orient="records")}))
        elif args.cmd == "topics":
            import pyarrow as pa

            from imagededupx_ray.stages.kmeans import (
                kmeans_assign,
                kmeans_fit_distributed,
            )

            ds = rd.read_parquet(args.input)
            if args.encoder == "lsa":
                from imagededupx_ray.stages.extract import extract_stage
                from imagededupx_ray.stages.lsa import lsa_embed, lsa_fit

                names = ds.schema().names
                if "doc_id" not in names:
                    ds = extract_stage(ds)
                docs_txt = ds.select_columns(["doc_id", "text"])
                model = lsa_fit(docs_txt, dim=args.lsa_dim, vocab=args.lsa_vocab)
                ds = lsa_embed(docs_txt, model).map_batches(
                    lambda t: t.rename_columns(["vec_id", "embedding"]),
                    batch_format="pyarrow",
                )
            centroids, history = kmeans_fit_distributed(
                ds, n_clusters=args.clusters, n_iter=args.iters
            )
            assigned = kmeans_assign(ds, centroids).materialize()
            if args.output:
                assigned.write_parquet(args.output)
            from imagededupx_ray.util import partial_groupby

            rep = partial_groupby(
                assigned,
                ["cluster"],
                [("count", "cluster", "n_members"), ("mean", "sim", "mean_sim")],
            ).to_pandas().sort_values("cluster")
            print(
                json.dumps(
                    {
                        "topics": {
                            "k": int(len(centroids)),
                            "inertia": [round(h, 6) for h in history],
                            "clusters": [
                                {
                                    "cluster": int(r.cluster),
                                    "n_members": int(r.n_members),
                                    "mean_sim": round(float(r.mean_sim), 4),
                                }
                                for r in rep.itertuples(index=False)
                            ],
                        }
                    }
                )
            )
        elif args.cmd == "cross":
            from imagededupx_ray.pipelines.cross import cross_dedup

            clean, report = cross_dedup(
                rd.read_parquet(args.input_a),
                rd.read_parquet(args.input_b),
                DEFAULT_CONFIG,
            )
            if args.output:
                clean.write_parquet(args.output)
            else:
                # cross_dedup already executed the pipeline to compute
                # n_a_clean — re-counting `clean` would re-run the whole
                # union dedup + broadcast filter just to discard it
                report = {**report, "_note": "pass --output to write clean-A rows"}
            print(json.dumps({"cross": report}))
    finally:
        if _owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
