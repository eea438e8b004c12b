"""Driver-contract parity: every ``queries()`` entry with an ``oracle_sql()``
twin must value-match DuckDB on the same parquet tables (SURVEY.md §5.2
item 6) — the exact comparison the driver performs at sf=0.01, run here at
sf=0.001 for speed. Rows-only entries are smoke-checked for execution + rows.
"""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracle_cases():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(ray_session, ddb, name):
    import __ray_entry__ as e

    ray_df = _norm(_to_pandas(e.queries()[name](SF_DIR)))
    sql_df = _norm(ddb.execute(e.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_exact=True, check_dtype=False)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    rows_only = set(q) - set(e.oracle_sql())
    assert rows_only  # dedup family present
    for name in sorted(rows_only):
        df = _to_pandas(q[name](SF_DIR))
        assert len(df) >= 0 and len(df.columns) >= 2, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) > 0
    assert {"doc_id", "cluster_id", "is_canonical"} <= set(df.columns)
