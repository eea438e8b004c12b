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
