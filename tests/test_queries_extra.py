"""DuckDB-oracle gates for suite-only queries (driver-artifact entries are
capped at 50, so these run their exact SQL twin here instead of via
__ray_entry__.oracle_sql; their execution evidence rides nonsql_suite)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    yield con
    con.close()


def test_stratified_sample_matches_rownumber_oracle(ray_session, ddb):
    from imagededupx_ray.queries import docs_stratified_sample

    out = docs_stratified_sample(SF, k=20, seed=42).to_pandas()
    oracle = ddb.execute(
        "WITH r AS (SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY md5(concat('s42:', CAST(doc_id AS VARCHAR))), doc_id) "
        "AS sample_rank FROM documents) "
        "SELECT lang, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank "
        "FROM r WHERE sample_rank <= 20"
    ).fetchdf()
    a, b = _normalize(out), _normalize(oracle)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stratified_sample_quota_and_determinism(ray_session):
    from imagededupx_ray.queries import docs_stratified_sample

    out1 = docs_stratified_sample(SF, k=5, seed=7).to_pandas()
    out2 = docs_stratified_sample(SF, k=5, seed=7).to_pandas()
    pd.testing.assert_frame_equal(_normalize(out1), _normalize(out2))
    per = out1.groupby("lang").size()
    assert (per <= 5).all()
    assert set(out1["sample_rank"]) <= set(range(1, 6))
    # a different seed draws a different sample
    out3 = docs_stratified_sample(SF, k=5, seed=8).to_pandas()
    assert set(out3["doc_id"]) != set(out1["doc_id"])


def test_pii_scrub_matches_duckdb_regex_oracle(ray_session, tmp_path):
    """Planted emails/phones/IPs scrub identically in Arrow-RE2 and
    DuckDB-RE2, including the sequential-rule no-double-count semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from imagededupx_ray.queries import PII_EMAIL, PII_IP, PII_PHONE, docs_pii_scrub

    texts = [
        "contact me at jane.doe+spam@example.co.uk or bob@x.io today",
        "call 415-555-0123 or 415.555.9876 now",
        "server at 192.168.0.1 and 10.0.0.255 ping 999.1.1.1",
        "mixed: a@b.com then 212-555-1212 then 8.8.8.8",
        "clean text with no pii at all",
        "",
        "edge a@b.c single-letter tld does not match",
        "phone-in-email 123-456-7890@host.com is an email first",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = _normalize(docs_pii_scrub(str(tmp_path)).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = _normalize(
        con.execute(
            "WITH s1 AS (SELECT doc_id, "
            f"len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails, "
            f"regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1 "
            "FROM documents), "
            "s2 AS (SELECT doc_id, n_emails, "
            f"len(regexp_extract_all(t1, '{PII_PHONE}')) AS n_phones, "
            f"regexp_replace(t1, '{PII_PHONE}', '<PHONE>', 'g') AS t2 FROM s1), "
            "s3 AS (SELECT doc_id, n_emails, n_phones, "
            f"len(regexp_extract_all(t2, '{PII_IP}')) AS n_ips, "
            f"regexp_replace(t2, '{PII_IP}', '<IP>', 'g') AS clean_text FROM s2) "
            "SELECT doc_id, clean_text, CAST(n_emails AS BIGINT) AS n_emails, "
            "CAST(n_phones AS BIGINT) AS n_phones, CAST(n_ips AS BIGINT) AS n_ips "
            "FROM s3"
        ).fetchdf()
    )
    con.close()
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    scrubbed = out.set_index("doc_id")["clean_text"]
    assert "<EMAIL>" in scrubbed[0] and "@" not in scrubbed[0]
    assert scrubbed[1].count("<PHONE>") == 2
    assert "192.168.0.1" not in scrubbed[2]
    assert scrubbed[4] == texts[4]


def test_pack_bins_matches_window_oracle(ray_session, ddb):
    from imagededupx_ray.queries import docs_pack_bins

    out = _normalize(docs_pack_bins(SF, budget=512).to_pandas())
    oracle = _normalize(
        ddb.execute(
            "WITH c AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(lower(trim(text)), '\\s+')) END AS n_tokens "
            "FROM documents), "
            "w AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before FROM c) "
            "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(cum_before // 512 AS BIGINT) AS bin_id FROM w"
        ).fetchdf()
    )
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    # bins fill in doc_id order: bin ids are nondecreasing and start at 0
    srt = out.sort_values("doc_id")
    b = srt["bin_id"].to_numpy()
    assert b[0] == 0 and (b[1:] >= b[:-1]).all()


def test_pack_bins_parallelism_invariant(ray_session):
    import ray.data as rd

    from imagededupx_ray.queries import docs_pack_bins

    a = _normalize(docs_pack_bins(SF, budget=100).to_pandas())
    b = _normalize(docs_pack_bins(SF, budget=100).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_new_queries_on_empty_corpus(ray_session, tmp_path):
    """0-row documents table: the fourth-session queries return empty
    results with their declared schemas instead of raising."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from imagededupx_ray.queries import (
        docs_pack_bins,
        docs_pii_scrub,
        docs_quality_verdicts,
        docs_stratified_sample,
        lsa_semdedup,
    )

    pq.write_table(
        pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
        ).empty_table(),
        str(tmp_path / "documents.parquet"),
    )
    d = str(tmp_path)
    assert docs_pack_bins(d).count() == 0
    assert docs_stratified_sample(d).num_rows == 0
    assert docs_pii_scrub(d).count() == 0
    assert docs_quality_verdicts(d).count() == 0
    assert len(lsa_semdedup(d)) == 0


def test_chunking_matches_generate_series_oracle(ray_session, ddb):
    from imagededupx_ray.queries import docs_chunk

    C, O = 24, 4
    S = C - O
    out = _normalize(docs_chunk(SF, chunk=C, overlap=O).to_pandas())
    oracle = _normalize(
        ddb.execute(
            "WITH t AS (SELECT doc_id, "
            "string_split_regex(lower(trim(text)), '\\s+') AS toks "
            "FROM documents WHERE trim(text) <> ''), "
            "s AS (SELECT doc_id, toks, len(toks) AS n FROM t), "
            "e AS (SELECT doc_id, toks, n, unnest(range(0, "
            f"1 + CAST(ceil(greatest(n - {C}, 0) / {S}.0) AS BIGINT))) AS chunk_idx FROM s), "
            "c AS (SELECT doc_id, chunk_idx, "
            f"list_slice(toks, chunk_idx * {S} + 1, "
            f"least(chunk_idx * {S} + {C}, n)) AS ctoks FROM e) "
            "SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, "
            "CAST(len(ctoks) AS BIGINT) AS n_tokens, "
            "array_to_string(ctoks, ' ') AS chunk_text FROM c"
        ).fetchdf()
    )
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    # overlap property: consecutive chunks share O tokens
    one = out[out["doc_id"] == out["doc_id"].iloc[0]].sort_values("chunk_idx")
    if len(one) >= 2:
        a = one.iloc[0]["chunk_text"].split()
        b = one.iloc[1]["chunk_text"].split()
        assert a[S:] == b[: len(a) - S]
    # ADVICE r4: no window may be a SUBSET of its predecessor (the old
    # ceil(n/stride) count emitted a contained tail when tail <= overlap)
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        lens = g["n_tokens"].to_numpy()
        if len(g) >= 2:
            assert lens[-1] > O, (g["doc_id"].iloc[0], lens)


def test_chunking_no_contained_tail_window(ray_session, tmp_path):
    """Regression (ADVICE r4): n=57, chunk=64, overlap=8 used to emit a
    second window [56,57) fully contained in [0,57)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from imagededupx_ray.queries import docs_chunk

    text = " ".join(f"w{i}" for i in range(57))
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text]),
                  "lang": pa.array(["en"])}),
        str(tmp_path / "documents.parquet"),
    )
    out = docs_chunk(str(tmp_path), chunk=64, overlap=8).to_pandas()
    assert len(out) == 1 and out["n_tokens"].iloc[0] == 57
    # and a doc one token past the window still gets exactly 2 chunks
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([" ".join(f"w{i}" for i in range(65))]),
                  "lang": pa.array(["en"])}),
        str(tmp_path / "documents.parquet"),
    )
    out2 = docs_chunk(str(tmp_path), chunk=64, overlap=8).to_pandas()
    assert sorted(out2["n_tokens"]) == [9, 64]


def test_corpus_datasheet_matches_oracle(ray_session, ddb):
    from imagededupx_ray.queries import corpus_datasheet

    out = corpus_datasheet(SF).set_index("metric")["value"]
    o = ddb.execute(
        "WITH t AS (SELECT doc_id, "
        "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "FROM documents WHERE trim(text) <> '') "
        "SELECT (SELECT COUNT(*) FROM documents) AS n_docs, "
        "(SELECT COUNT(DISTINCT lang) FROM documents) AS n_langs, "
        "(SELECT COUNT(*) FROM t) AS total_tokens, "
        "(SELECT SUM(length(text)) FROM documents) AS total_chars, "
        "(SELECT COUNT(DISTINCT md5(text)) FROM documents) AS n_distinct"
    ).fetchdf().iloc[0]
    assert out["n_docs"] == float(o["n_docs"])
    assert out["n_langs"] == float(o["n_langs"])
    assert out["total_tokens"] == float(o["total_tokens"])
    assert out["total_chars"] == float(o["total_chars"])
    assert out["n_distinct_texts"] == float(o["n_distinct"])
    assert abs(out["exact_dup_rate"] - (1 - o["n_distinct"] / o["n_docs"])) < 1e-6
    # keep-rate consistent with the verdicts query itself
    from imagededupx_ray.queries import docs_quality_verdicts

    v = docs_quality_verdicts(SF).to_pandas()
    assert abs(out["quality_keep_rate"] - v["keep"].mean()) < 1e-6
    top = ddb.execute(
        "SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM documents GROUP BY lang)"
    ).fetchone()[0]
    assert abs(out["top_lang_share"] - top / o["n_docs"]) < 1e-6


def test_suite_ok_invariants(ray_session):
    """VERDICT r4 #9: every suite evidence row carries an ok boolean so the
    driver artifact distinguishes "changed md5" from "broken component".
    The similarity suite at sf0.001 must report ok=True throughout, and
    _component_ok must actually reject broken shapes."""
    from imagededupx_ray.queries import _component_ok, similarity_suite

    df = similarity_suite("/root/testdata/sf0.001")
    assert set(df.columns) == {"component", "n_rows", "n_cols", "result_md5", "ok"}
    bad = df[~df["ok"]]
    assert bad.empty, bad.to_string()

    # the checks have teeth: empty frame, unordered pairs, out-of-range
    # cosine, NaN floats, multi-canonical clusters all fail
    assert not _component_ok("x", pd.DataFrame({"a": []}))
    assert not _component_ok("x", pd.DataFrame({"a": [2], "b": [1]}))
    assert not _component_ok("x", pd.DataFrame({"cosine": [1.5]}))
    assert not _component_ok("x", pd.DataFrame({"v": [float("nan")]}))
    assert not _component_ok(
        "dedup_clusters",
        pd.DataFrame({"cluster_id": [1, 1], "is_canonical": [True, True]}),
    )
    assert _component_ok(
        "dedup_clusters",
        pd.DataFrame({"cluster_id": [1, 1], "is_canonical": [True, False]}),
    )
    # round-5 components: cap overshoot / missing attrition / broken
    # weight-members identity all fail
    assert not _component_ok(
        "pages_domain_cap", pd.DataFrame({"n_in": [5], "n_kept": [6]})
    )
    assert not _component_ok(
        "pages_domain_cap", pd.DataFrame({"n_in": [3, 4], "n_kept": [3, 4]})
    )
    assert _component_ok(
        "pages_domain_cap", pd.DataFrame({"n_in": [9, 4], "n_kept": [3, 4]})
    )
    assert not _component_ok(
        "docs_softdedup_weights",
        pd.DataFrame({"n_members": [2], "weight": [1.0]}),
    )
    assert _component_ok(
        "docs_softdedup_weights",
        pd.DataFrame({"n_members": [2, 1], "weight": [0.5, 1.0]}),
    )


def test_attach_dim_paths_match_oracle(ray_session):
    """VERDICT r4 #6: the TPC-H dimension attach must hash-match its oracle
    on BOTH paths — the worker-assembled broadcast (no driver .to_pandas()
    of the dimension) and the coarse-partition union exchange (forced via
    DIM_BROADCAST_MAX_ROWS=0)."""
    import duckdb

    import imagededupx_ray.queries as Q
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    osql = E.oracle_sql()
    saved = Q.DIM_BROADCAST_MAX_ROWS
    try:
        for cap in (saved, 0):
            Q.DIM_BROADCAST_MAX_ROWS = cap
            for name in ["orders_per_customer", "q3_shipping_priority"]:
                out = getattr(Q, name)(SF)
                df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
                ora = con.execute(osql[name]).fetchdf()
                pd.testing.assert_frame_equal(
                    _normalize(df), _normalize(ora), check_dtype=False
                )
    finally:
        Q.DIM_BROADCAST_MAX_ROWS = saved
    con.close()
