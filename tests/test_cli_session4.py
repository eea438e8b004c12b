"""In-process CLI gates for the fourth-session verbs: dedup --url-dedup
--auto-plan, tiers --keep-policy/--semantic-encoder/--survivors-output,
cross --input-a/--input-b."""

import glob
import json

import pyarrow.parquet as pq


def _synth(tmp_path, name, n, seed):
    from imagededupx_ray.sources.synthetic import write_pages_corpus

    d = str(tmp_path / name)
    write_pages_corpus(d, n_pages=n, seed=seed)
    return f"{d}/pages"


def _rows(path_glob):
    return sum(pq.read_metadata(f).num_rows for f in glob.glob(path_glob))


def test_cli_new_verbs(ray_session, tmp_path, capsys):
    from imagededupx_ray.__main__ import main

    a = _synth(tmp_path, "a", 200, 3)
    b = _synth(tmp_path, "b", 80, 4)

    assert (
        main(
            [
                "dedup", "--input", a, "--output", str(tmp_path / "cl"),
                "--url-dedup", "--jaccard", "0.85", "--auto-plan",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    plan = json.loads(out.splitlines()[0])["lsh_plan"]
    assert plan["bands"] * plan["rows"] == 128
    assert plan["candidate_recall_at_threshold"] >= 0.99
    assert _rows(str(tmp_path / "cl" / "*.parquet")) == 200

    assert (
        main(
            [
                "tiers", "--input", a, "--keep-policy", "longest",
                "--semantic-encoder", "lsa", "--eps", "0.95",
                "--survivors-output", str(tmp_path / "surv"),
            ]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.splitlines()[-1])["tiers"]
    last = rep[-1]
    # survivors-output path runs the TEXT tiers; report ends at 3_template
    assert last["tier"] == "3_template"
    assert _rows(str(tmp_path / "surv" / "*.parquet")) == last["docs_out"]

    assert (
        main(
            [
                "cross", "--input-a", a, "--input-b", b,
                "--output", str(tmp_path / "cleanA"),
            ]
        )
        == 0
    )
    crep = json.loads(capsys.readouterr().out.splitlines()[-1])["cross"]
    assert crep["n_a"] == 200 and crep["n_b"] == 80
    assert _rows(str(tmp_path / "cleanA" / "*.parquet")) == crep["n_a_clean"]


def test_cli_search_verb(ray_session, tmp_path, capsys):
    """search CLI: all four engines return k ranked hits per query with
    the hit lists ordered by rank and scores descending."""
    import pyarrow as pa

    from imagededupx_ray.__main__ import main

    texts = [
        "fast table scan with vectorized filters",
        "window aggregate over event streams",
        "hash join build and probe phases",
        "fast scan of a columnar table",
        "broadcast the small dimension table",
    ] * 4
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        src,
    )
    for engine in ["bm25", "tfidf", "lsa", "ensemble"]:
        assert (
            main(
                [
                    "search", "--input", src, "--query", "fast table scan",
                    "--query", "hash join", "--engine", engine, "--k", "3",
                ]
            )
            == 0
        )
        rep = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert rep["engine"] == engine and len(rep["results"]) == 2
        for r in rep["results"]:
            assert len(r["hits"]) == 3
            ranks = [h["rank"] for h in r["hits"]]
            scores = [h["score"] for h in r["hits"]]
            assert ranks == [1, 2, 3]
            assert scores == sorted(scores, reverse=True)
