"""End-to-end corpus refinement gates (pipelines/refine.py): each stage's
planted failure mode must be removed by exactly its stage, the chain must be
consistent, and the composition must hold up through the CLI."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _pages(rows):
    import ray.data as rd

    n = len(rows)
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array([r["url"] for r in rows], type=pa.string()),
                "warc_ts": pa.array(
                    [r.get("warc_ts") for r in rows], type=pa.timestamp("us")
                ),
                "html": pa.nulls(n, pa.binary()),
                "text": pa.array([r["text"] for r in rows], type=pa.string()),
                "lang": pa.array(["en"] * n, type=pa.string()),
            }
        )
    )


def _let(n: int) -> str:
    return "".join(chr(97 + int(c)) for c in str(n))


def _body(i: int, n_tok: int = 40) -> str:
    """Per-doc fully distinct token stream — distinct in LETTERS (line-dedup
    normalization strips digits, so digit-only differences would make every
    body one hot normalized line), and with no cross-doc shingles so the
    dedup tiers only collapse the dups a test plants on purpose."""
    return " ".join(f"d{_let(i)}w{_let(j)}x" for j in range(n_tok))


NAV = "site nav home about contact"


def test_each_stage_removes_its_planted_failure(ray_session):
    import datetime as dt

    from imagededupx_ray.pipelines.refine import refine_corpus

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    rows = []
    # 6 distinct good docs, all carrying the nav paragraph
    for i in range(6):
        rows.append(
            {
                "url": f"http://a.example/{i}",
                "warc_ts": t0,
                "text": f"{NAV} . {_body(i)}",
            }
        )
    # url-dup: same page recrawled later under a tracking url
    rows.append(
        {
            "url": "http://a.example/0?utm_source=x",
            "warc_ts": t1,
            "text": f"{NAV} . {_body(0)}",
        }
    )
    # line-dedup retention drop: boilerplate-only page
    rows.append({"url": "http://a.example/boiler", "warc_ts": t0, "text": f"{NAV} . tail"})
    # quality drop: long enough chars to pass retention, too few tokens
    rows.append(
        {
            "url": "http://a.example/short",
            "warc_ts": t0,
            "text": f"{NAV} . smallish document nine tokens right here okay yes sir",
        }
    )
    # exact dup of doc 1 under a different (non-tracking) url
    rows.append(
        {"url": "http://mirror.example/1", "warc_ts": t0, "text": f"{NAV} . {_body(1)}"}
    )

    survivors, report = refine_corpus(
        _pages(rows),
        line_min_doc_rep=6,
        min_line_retention=0.5,
        quality_kwargs={"min_tok": 10, "ttr_min": 0.0, "top_max": 1.0},
    )
    rep = report.set_index("stage")
    assert rep.loc["url_dedup", "removed"] == 1
    assert rep.loc["line_dedup", "removed"] == 1  # boiler-only page
    assert rep.loc["quality_filter", "removed"] == 1  # the 9-token doc
    tier1 = rep[rep.index.str.startswith("tier1")]
    assert int(tier1["removed"].iloc[0]) == 1  # the mirror exact dup
    top = report[~report["stage"].str.startswith("tier")]
    assert (top["docs_out"] <= top["docs_in"]).all()
    got = survivors.to_pandas()
    # the nav paragraph is gone from every survivor text
    assert not got["text"].str.contains(NAV).any()
    # all six distinct good docs survive (recrawl + mirror collapsed onto them)
    assert len(got) == 6


def test_decontaminate_drops_clusters_touching_heldout(ray_session):
    from imagededupx_ray.pipelines.refine import refine_corpus

    rows = [
        {"url": f"http://a.example/{i}", "text": _body(i)} for i in range(5)
    ]
    held = [{"url": "http://b.example/0", "text": rows[2]["text"]}]
    survivors, report = refine_corpus(
        _pages(rows),
        with_url_dedup=False,
        line_min_doc_rep=None,
        with_quality=False,
        decontam_ds=_pages(held),
    )
    rep = report.set_index("stage")
    assert rep.loc["decontaminate", "removed"] == 1
    got = survivors.to_pandas()
    assert len(got) == 4
    assert "http://a.example/2" not in set(got["url"])


def test_report_query_is_deterministic_and_all_stages_attrit(ray_session):
    from imagededupx_ray.queries import _component_ok, corpus_refine_report

    a = corpus_refine_report("/root/testdata/sf0.001")
    b = corpus_refine_report("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert _component_ok("corpus_refine_report", a)
    rep = a.set_index("stage")
    for stage in ("url_dedup", "line_dedup", "quality_filter", "decontaminate"):
        assert rep.loc[stage, "removed"] > 0, stage
    assert rep[rep.index.str.startswith("tier")]["removed"].sum() > 0
    # the chain is conservative: nothing is ever added
    assert (a["docs_out"] <= a["docs_in"]).all()


def test_refine_cli_roundtrip(ray_session, tmp_path):
    from imagededupx_ray.__main__ import main as cli_main
    from imagededupx_ray.sources.synthetic import write_pages_corpus

    d = tmp_path / "corpus"
    write_pages_corpus(str(d), n_pages=300, seed=7, with_truth=False)
    out = tmp_path / "survivors"
    rep = tmp_path / "report.parquet"
    rc = cli_main(
        [
            "refine",
            "--input",
            str(d / "pages"),
            "--output",
            str(out),
            "--report-output",
            str(rep),
            "--line-min-doc-rep",
            "0",
            "--no-quality",
        ]
    )
    assert rc == 0
    import pyarrow.parquet as pq

    report = pq.read_table(str(rep)).to_pandas()
    assert {"url_dedup", "extract"} <= set(report["stage"])
    import ray.data as rd

    surv = rd.read_parquet(str(out))
    assert surv.count() == int(report["docs_out"].iloc[-1])


def test_refine_domain_cap_stage(ray_session, tmp_path):
    """--max-per-host inserts the domain_cap stage after url dedup: the
    report carries its attrition and no surviving host exceeds the cap."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.__main__ import main as cli_main
    from imagededupx_ray.sources.synthetic import write_pages_corpus
    from imagededupx_ray.stages.urlfilter import extract_hosts

    d = tmp_path / "corpus"
    write_pages_corpus(str(d), n_pages=300, seed=11, with_truth=False)
    out = tmp_path / "survivors"
    rep = tmp_path / "report.parquet"
    rc = cli_main(
        [
            "refine", "--input", str(d / "pages"), "--output", str(out),
            "--report-output", str(rep), "--max-per-host", "5",
            "--line-min-doc-rep", "0", "--no-quality",
        ]
    )
    assert rc == 0
    report = pq.read_table(str(rep)).to_pandas().set_index("stage")
    assert report.loc["domain_cap", "removed"] > 0
    # stage order: the cap consumes url_dedup's survivors
    stages = report.index.tolist()
    assert stages.index("domain_cap") == stages.index("url_dedup") + 1
    surv = rd.read_parquet(str(out)).to_pandas()
    hosts = extract_hosts(__import__("pyarrow").array(surv["url"].tolist()))
    counts = __import__("pandas").Series(hosts.to_pylist()).value_counts()
    assert counts.max() <= 5


def test_topics_cli(ray_session, tmp_path, capsys):
    """topics verb end-to-end on both input shapes: a raw embeddings
    parquet, and a pages corpus through the LSA encoder."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from imagededupx_ray.__main__ import main as cli_main
    from imagededupx_ray.sources.synthetic import write_pages_corpus

    rng = np.random.default_rng(31)
    centers = rng.normal(size=(3, 12))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.vstack([c + 0.04 * rng.normal(size=(30, 12)) for c in centers])
    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(X)), type=pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in X], type=pa.list_(pa.float64())
                ),
            }
        ),
        str(emb_dir / "part0.parquet"),
    )
    out = tmp_path / "assign"
    rc = cli_main(
        [
            "topics", "--input", str(emb_dir), "--clusters", "3",
            "--iters", "8", "--output", str(out),
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.splitlines()[-1])["topics"]
    assert rep["k"] == 3
    assert sum(c["n_members"] for c in rep["clusters"]) == len(X)
    assert all(b <= a + 1e-9 for a, b in zip(rep["inertia"], rep["inertia"][1:]))
    assigned = rd.read_parquet(str(out)).to_pandas()
    assert len(assigned) == len(X) and assigned["cluster"].nunique() == 3

    # pages -> LSA encoder -> clusters
    d = tmp_path / "corpus"
    write_pages_corpus(str(d), n_pages=120, seed=12, with_truth=False)
    rc = cli_main(
        [
            "topics", "--input", str(d / "pages"), "--encoder", "lsa",
            "--clusters", "4", "--iters", "5",
            "--lsa-dim", "16", "--lsa-vocab", "256",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.splitlines()[-1])["topics"]
    assert rep["k"] == 4 and sum(c["n_members"] for c in rep["clusters"]) > 0


def test_refine_token_attrition_receipt(ray_session):
    """count_tokens=True: the receipt gains tokens_out, whose figures match
    an independent whitespace count — the input row equals the corpus's
    total tokens, every counted stage is non-increasing, and the
    dedup_cascade_total row counts exactly the survivors' tokens."""
    from imagededupx_ray.pipelines.refine import refine_corpus

    rows = [
        {"url": f"http://a.example/{i}", "text": _body(i, n_tok=30)}
        for i in range(8)
    ]
    rows.append({"url": "http://mirror.example/1", "text": _body(1, n_tok=30)})
    survivors, report = refine_corpus(
        _pages(rows),
        count_tokens=True,
        with_url_dedup=False,
        line_min_doc_rep=None,
        with_quality=False,
    )
    assert "tokens_out" in report.columns
    rep = report.set_index("stage")
    assert int(rep.loc["input", "tokens_out"]) == 9 * 30
    counted = report.dropna(subset=["tokens_out"])
    t = counted["tokens_out"].to_numpy()
    assert (t[1:] <= t[:-1]).all()  # refinement never adds tokens
    got = survivors.to_pandas()
    want = int(got["text"].str.split().str.len().sum())
    assert int(rep.loc["dedup_cascade_total", "tokens_out"]) == want
    # per-tier rows are docs-only by design
    assert report[report["stage"].str.startswith("tier")]["tokens_out"].isna().all()
    # flag off -> no column (existing consumers unchanged)
    _, plain = refine_corpus(
        _pages(rows), with_url_dedup=False, line_min_doc_rep=None, with_quality=False
    )
    assert "tokens_out" not in plain.columns


def test_refine_quality_clf_generalizes_past_rules(ray_session):
    """quality_clf_threshold swaps the hard rule filter for the trained
    classifier (rules label -> model filters): rule-failing short junk is
    dropped, AND long junk docs that PASS every rule are dropped too,
    because their hashed n-grams co-occur with the labeled failures — the
    generalization a hard rule filter cannot provide. Clean docs survive
    and the report carries the quality_clf stage (not quality_filter)."""
    from imagededupx_ray.pipelines.refine import refine_corpus

    rng = np.random.default_rng(17)
    clean_vocab = [f"w{_let(i)}x" for i in range(50)]
    junk_vocab = [f"zz{_let(i)}q" for i in range(30)]
    rows = []
    # 20 clean docs: shared clean vocab, per-doc random order (distinct
    # shingles, so the dedup tiers collapse nothing)
    for i in range(20):
        rows.append(
            {
                "url": f"http://a.example/{i}",
                "text": " ".join(rng.permutation(clean_vocab)[:40]),
            }
        )
    # 12 short junk docs: 9 tokens < min_tok=10 -> the rules LABEL them 0
    shorts = [" ".join(rng.choice(junk_vocab, size=9)) for _ in range(12)]
    for i, t in enumerate(shorts):
        rows.append({"url": f"http://junk.example/short{i}", "text": t})
    # 3 long junk docs: concatenations of four short junk docs each, so
    # every rule PASSES (36 tokens, label 1) but their hashed n-grams are
    # exactly the labeled failures' n-grams — the model must drop them on
    # vocabulary (12 negative pushes outweigh 3 positive on shared buckets)
    for i in range(3):
        rows.append(
            {
                "url": f"http://junk.example/long{i}",
                "text": " ".join(shorts[4 * i : 4 * i + 4]),
            }
        )
    survivors, report = refine_corpus(
        _pages(rows),
        with_url_dedup=False,
        line_min_doc_rep=None,
        quality_kwargs={"min_tok": 10, "ttr_min": 0.0, "top_max": 1.0},
        quality_clf_threshold=0.5,
    )
    stages = set(report["stage"])
    assert "quality_clf" in stages and "quality_filter" not in stages
    rep = report.set_index("stage")
    assert rep.loc["quality_clf", "removed"] == 15  # 12 short + 3 long junk
    got = survivors.to_pandas()
    assert not got["url"].str.startswith("http://junk.").any()
    assert (got["url"].str.startswith("http://a.")).sum() == 20


def test_refine_ppl_filter_drops_gibberish_tail(ray_session):
    """ppl_tail_drop inserts the CCNet LM stage after quality: planted
    gibberish (singleton tokens -> high perplexity under the corpus-fit
    LM) is removed, shared-vocab docs survive, and the report carries the
    stage's attrition."""
    from imagededupx_ray.pipelines.refine import refine_corpus

    rng = np.random.default_rng(31)
    vocab = [f"w{_let(i)}x" for i in range(50)]
    rows = []
    # 30 shared-vocab docs in per-doc random order: common unigrams (low
    # perplexity) but distinct 5-gram shingles (no near-dup collapse)
    for i in range(30):
        rows.append(
            {
                "url": f"http://a.example/{i}",
                "text": " ".join(rng.permutation(vocab)[:40]),
            }
        )
    for i in range(12):
        rows.append(
            {
                "url": f"http://gib.example/{i}",
                "text": " ".join(
                    "".join(rng.choice(list("qxzjvkwy"), size=9))
                    for _ in range(20)
                ),
            }
        )
    survivors, report = refine_corpus(
        _pages(rows),
        with_url_dedup=False,
        line_min_doc_rep=None,
        with_quality=False,
        ppl_tail_drop=True,
    )
    rep = report.set_index("stage")
    assert rep.loc["ppl_filter", "removed"] >= 12
    got = survivors.to_pandas()
    assert not got["url"].str.startswith("http://gib.").any()
    assert (got["url"].str.startswith("http://a.")).sum() >= 25
