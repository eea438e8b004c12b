"""Line-level boilerplate dedup gates (stages/linededup.py): CCNet/RefinedWeb
semantics on hand corpora plus an exact DuckDB twin — including the cleaned
text itself — over the deterministic lined view of the sf0.001 documents."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _run(docs, **kw):
    import ray.data as rd

    from imagededupx_ray.stages.linededup import dedup_lines

    clean, n_hot = dedup_lines(rd.from_items(docs), **kw)
    return clean.to_pandas().sort_values("doc_id").reset_index(drop=True), n_hot


def test_boilerplate_removed_everywhere_below_threshold_kept(ray_session):
    docs = [
        {"doc_id": 1, "text": "Cookie Notice 2024\nunique alpha\nAll Rights Reserved"},
        {"doc_id": 2, "text": "cookie notice 9\nunique beta\nall rights reserved"},
        {"doc_id": 3, "text": "COOKIE  NOTICE 77\nunique gamma"},
        {"doc_id": 4, "text": "solo document"},
    ]
    out, n_hot = _run(docs, min_doc_rep=3)
    # normalized "cookie notice" hits 3 distinct docs (case/digit/ws invariant)
    assert n_hot == 1
    assert out.loc[out.doc_id == 1, "text"].item() == "unique alpha\nAll Rights Reserved"
    assert out.loc[out.doc_id == 2, "text"].item() == "unique beta\nall rights reserved"
    assert out.loc[out.doc_id == 3, "text"].item() == "unique gamma"
    # "all rights reserved" only spans 2 docs -> kept at min_doc_rep=3
    assert list(out["n_lines_removed"]) == [1, 1, 1, 0]
    assert list(out["n_lines"]) == [3, 3, 2, 1]
    # chars removed = length of the REMOVED original lines, not normalized
    assert out.loc[out.doc_id == 1, "line_chars_removed"].item() == len("Cookie Notice 2024")


def test_within_doc_repeats_count_one_document(ray_session):
    docs = [
        {"doc_id": 1, "text": "nav bar\nnav bar\nnav bar\nbody one"},
        {"doc_id": 2, "text": "body two"},
    ]
    out, n_hot = _run(docs, min_doc_rep=2)
    # 3 copies inside one doc = 1 distinct document -> not boilerplate
    assert n_hot == 0
    assert out.loc[out.doc_id == 1, "n_lines_removed"].item() == 0
    # ... but once a second doc carries it, ALL copies go (CCNet removes all)
    docs[1]["text"] = "NAV BAR\nbody two"
    out, n_hot = _run(docs, min_doc_rep=2)
    assert n_hot == 1
    assert out.loc[out.doc_id == 1, "text"].item() == "body one"
    assert out.loc[out.doc_id == 1, "n_lines_removed"].item() == 3


def test_empty_normalized_lines_are_structure_not_content(ray_session):
    docs = [
        {"doc_id": 1, "text": "a1\n\n  42  \nkeep me"},
        {"doc_id": 2, "text": "A 1\n\n777\nother"},
        {"doc_id": 3, "text": "\n\n"},
    ]
    # "" (blank) and digit-only lines normalize to "" -> never counted/removed,
    # while "a1"/"A 1" normalize to "a" vs "a" ... they differ ("a" vs "a ")? no:
    # ws collapse + trim makes both "a", spanning 2 docs -> removed.
    out, n_hot = _run(docs, min_doc_rep=2)
    assert n_hot == 1
    assert out.loc[out.doc_id == 1, "text"].item() == "\n  42  \nkeep me"
    assert out.loc[out.doc_id == 3, "text"].item() == "\n\n"
    assert out.loc[out.doc_id == 3, "n_lines_removed"].item() == 0


@pytest.mark.parametrize("min_rep", [3, 10])
def test_matches_duckdb_oracle_on_lined_sf_corpus(ray_session, min_rep):
    """Exact twin — per-doc cleaned TEXT and all stat columns — of the full
    pipeline (lined view -> normalize -> distinct-doc count -> scrub) against
    DuckDB over the same lined view. Both sides compile RE2, so the
    normalization regexes are the same language."""
    from imagededupx_ray.queries import docs_line_dedup, lined_documents
    from imagededupx_ray.stages.linededup import dedup_lines

    lined = lined_documents(SF)
    lined_df = lined.to_pandas()
    clean, n_hot = dedup_lines(lined, min_doc_rep=min_rep)
    got = clean.to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("lined", lined_df)
    want = con.execute(
        f"""
        WITH lines AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS i
          FROM lined
        ), norm AS (
          SELECT doc_id, line, i,
                 trim(regexp_replace(regexp_replace(lower(line), '[0-9]+', '', 'g'),
                                     '\\s+', ' ', 'g')) AS nline
          FROM lines
        ), hot AS (
          SELECT nline FROM norm WHERE nline <> ''
          GROUP BY nline HAVING count(DISTINCT doc_id) >= {min_rep}
        ), marked AS (
          SELECT doc_id, line, i,
                 (nline <> '' AND nline IN (SELECT nline FROM hot)) AS rm
          FROM norm
        )
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY i) FILTER (WHERE NOT rm), '') AS text,
               count(*)::BIGINT AS n_lines,
               sum(CASE WHEN rm THEN 1 ELSE 0 END)::BIGINT AS n_lines_removed,
               sum(CASE WHEN rm THEN length(line) ELSE 0 END)::BIGINT AS line_chars_removed
        FROM marked GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    assert len(got) == len(want) == 500
    assert (want["n_lines_removed"].sum() > 0) == (n_hot > 0)
    for col in ["doc_id", "n_lines", "n_lines_removed", "line_chars_removed"]:
        assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col
    assert got["text"].tolist() == want["text"].tolist()

    if min_rep == 3:
        # planted boilerplate (cookie banner on ~250 docs, footer on ~167)
        # must be hot and gone from every survivor text
        assert n_hot >= 2
        joined = "\n".join(got["text"].tolist())
        assert "Cookie Consent Accept All Tracking Technologies" not in joined
        assert "Copyright 2024 Example Site" not in joined
        # and the driver evidence digest stays consistent with this run
        ddf = (
            docs_line_dedup(SF, min_doc_rep=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert np.array_equal(ddf["n_lines_removed"].to_numpy(), want["n_lines_removed"].to_numpy())
        assert np.array_equal(
            ddf["clean_chars"].to_numpy(), want["text"].str.len().to_numpy().astype(np.int64)
        )


def test_lined_view_is_deterministic(ray_session):
    from imagededupx_ray.queries import lined_documents

    a = lined_documents(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = lined_documents(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # planted boilerplate present pre-dedup
    assert a.loc[a.doc_id % 2 == 0, "text"].str.startswith("Cookie Consent").all()
    assert a.loc[a.doc_id % 3 == 0, "text"].str.endswith("All Rights Reserved").all()
