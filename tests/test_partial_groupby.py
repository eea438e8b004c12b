"""util.partial_groupby must match Ray's native aggregate (and SQL
semantics) on keyed, keyless, and empty inputs — it replaces the
sort-shuffle for bounded key domains throughout queries.py."""

import numpy as np
import pyarrow as pa
import pytest


def _pg(ds, keys, specs):
    from imagededupx_ray.util import partial_groupby

    return partial_groupby(ds, keys, specs).to_pandas()


@pytest.fixture()
def items_ds(ray_session):
    import ray.data as rd

    rows = [
        {"k": ["a", "b", "c"][i % 3], "v": float(i), "w": i}
        for i in range(1000)
    ]
    return rd.from_items(rows).repartition(13)


def test_keyed_matches_pandas(items_ds):
    import pandas as pd

    got = (
        _pg(
            items_ds,
            ["k"],
            [
                ("sum", "v", "sv"),
                ("count", "", "n"),
                ("mean", "v", "mv"),
                ("min", "w", "lo"),
                ("max", "w", "hi"),
            ],
        )
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(
        [{"k": ["a", "b", "c"][i % 3], "v": float(i), "w": i} for i in range(1000)]
    )
    want = (
        df.groupby("k")
        .agg(sv=("v", "sum"), n=("v", "size"), mv=("v", "mean"),
             lo=("w", "min"), hi=("w", "max"))
        .reset_index()
    )
    assert list(got["k"]) == list(want["k"])
    assert np.allclose(got["sv"], want["sv"])
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["mv"], want["mv"])
    assert (got["lo"].to_numpy() == want["lo"].to_numpy()).all()
    assert (got["hi"].to_numpy() == want["hi"].to_numpy()).all()
    assert str(got["n"].dtype) == "int64"


def test_keyless_global_aggregate(items_ds):
    got = _pg(items_ds, [], [("count", "", "n"), ("sum", "w", "s"), ("mean", "v", "m")])
    assert len(got) == 1
    assert int(got["n"].iloc[0]) == 1000
    assert int(got["s"].iloc[0]) == sum(range(1000))
    assert abs(float(got["m"].iloc[0]) - np.mean(np.arange(1000.0))) < 1e-9


def test_empty_input_declared_schema(ray_session):
    from imagededupx_ray.util import partial_groupby
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"k": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.float64())})
    )
    out = partial_groupby(empty, ["k"], [("sum", "v", "s"), ("count", "", "n")])
    # assert on the Dataset schema: Ray's to_pandas() drops columns for
    # 0-row datasets (conversion artifact, not helper output)
    sch = out.schema()
    assert sch.names == ["k", "s", "n"]
    assert [str(t) for t in sch.types] == ["string", "double", "int64"]
    assert out.count() == 0
