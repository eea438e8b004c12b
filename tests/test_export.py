"""Deterministic training-shard export (pipelines/export.py): shard
membership and intra-shard order must be content-keyed (identical at any
parallelism / input sharding), the shard union must equal the corpus, and
the manifest must verify a finished export shard by shard."""

import glob
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from imagededupx_ray.pipelines.export import (
    assign_shards,
    export_manifest,
    shuffle_export,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


def _export(docs, tmp, n_blocks, seed="42", n_shards=8):
    out = f"{tmp}/shards_{n_blocks}"
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.from_arrow(docs).repartition(n_blocks)
    manifest = shuffle_export(ds, out, seed=seed, n_shards=n_shards)
    return out, manifest


def test_export_deterministic_across_parallelism(docs, tmp_path):
    out2, m2 = _export(docs, tmp_path, n_blocks=2)
    out7, m7 = _export(docs, tmp_path, n_blocks=7)
    pd.testing.assert_frame_equal(
        m2.reset_index(drop=True), m7.reset_index(drop=True)
    )
    # shard contents identical row-for-row in key order
    for shard_dir in sorted(glob.glob(f"{out2}/shard=*")):
        name = shard_dir.split("/")[-1]
        a = pq.read_table(shard_dir).to_pandas().sort_values("shuffle_key")
        b = pq.read_table(f"{out7}/{name}").to_pandas().sort_values("shuffle_key")
        np.testing.assert_array_equal(
            a["doc_id"].to_numpy(), b["doc_id"].to_numpy()
        )


def test_export_union_equals_corpus(docs, tmp_path):
    out, manifest = _export(docs, tmp_path, n_blocks=3)
    got = pq.read_table(out).to_pandas()
    assert int(manifest["n_docs"].sum()) == docs.num_rows == len(got)
    assert sorted(got["doc_id"]) == sorted(docs["doc_id"].to_pylist())


def test_export_intra_shard_sorted_and_seed_sensitive(docs, tmp_path):
    out, _ = _export(docs, tmp_path, n_blocks=3)
    for f in sorted(glob.glob(f"{out}/shard=*/*.parquet")):
        keys = pq.read_table(f, columns=["shuffle_key"])["shuffle_key"].to_pylist()
        assert keys == sorted(keys)
    # a different seed must produce a different permutation
    a = assign_shards(rd.from_arrow(docs), seed="42").to_pandas()
    b = assign_shards(rd.from_arrow(docs), seed="43").to_pandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shard_a"] != merged["shard_b"]).any()
    assert (merged["shuffle_key_a"] != merged["shuffle_key_b"]).all()


def test_export_manifest_verifies_resume(docs, tmp_path):
    out, manifest = _export(docs, tmp_path, n_blocks=3)
    # manifest recomputed from disk matches the one the export returned
    again = export_manifest(out, n_shards=8)
    pd.testing.assert_frame_equal(
        manifest.reset_index(drop=True), again.reset_index(drop=True)
    )
    # deleting one shard is detected (that shard vanishes; others verify)
    victim = sorted(glob.glob(f"{out}/shard=*"))[0]
    shutil.rmtree(victim)
    partial = export_manifest(out, n_shards=8)
    assert len(partial) == len(manifest) - 1
    kept = manifest[manifest["shard"].isin(partial["shard"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(kept, partial.reset_index(drop=True))


def test_export_cli_smoke(ray_session, tmp_path, capsys):
    import json

    from imagededupx_ray.__main__ import main

    out = f"{tmp_path}/cli_shards"
    rc = main(
        [
            "export",
            "--input",
            f"{SF_DIR}/documents.parquet",
            "--output",
            out,
            "--shards",
            "4",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_shards"] == 4 and rep["n_docs"] == 500
    again = export_manifest(out, n_shards=4)
    assert [r["checksum"] for r in rep["manifest"]] == list(again["checksum"])
