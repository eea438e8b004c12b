"""Plugin heavy-encoder seam gates (VERDICT r4 #4): a fake "heavy model"
callable class driven through the real actor-pool stage proves the contract
a torch/SBERT/CLIP user relies on — one model load per ACTOR (never per
batch), vectorized Arrow batches, and GPU resource plumbing."""

import os

import numpy as np
import pyarrow as pa
import pytest

from imagededupx_ray.stages.plugin import (
    encoder_map_kwargs,
    encoder_stage,
    resolve_encoder,
)


def test_resolve_encoder_specs():
    from imagededupx_ray.stages.multimodal import ImageDecodeStage

    assert (
        resolve_encoder("plugin:imagededupx_ray.stages.multimodal:ImageDecodeStage")
        is ImageDecodeStage
    )
    # dotted form: attr = last component
    assert (
        resolve_encoder("plugin:imagededupx_ray.stages.multimodal.ImageDecodeStage")
        is ImageDecodeStage
    )
    with pytest.raises(ValueError):
        resolve_encoder("imagededupx_ray.stages.multimodal:ImageDecodeStage")
    with pytest.raises(ValueError):
        resolve_encoder("plugin:noattr")
    with pytest.raises((ImportError, ModuleNotFoundError)):
        resolve_encoder("plugin:no_such_module_xyz:Cls")
    with pytest.raises(AttributeError):
        resolve_encoder("plugin:imagededupx_ray.stages.multimodal:NoSuchCls")
    with pytest.raises(TypeError):
        # resolves to a function, not a class
        resolve_encoder("plugin:imagededupx_ray.stages.multimodal:decode_images")


def test_gpu_resource_plumbing():
    class Dummy:
        def __call__(self, b):
            return b

    kw = encoder_map_kwargs(Dummy, num_gpus=0.25, num_cpus=2, batch_size=16)
    assert kw["num_gpus"] == 0.25
    assert kw["num_cpus"] == 2
    assert kw["batch_size"] == 16
    assert kw["batch_format"] == "pyarrow"
    # num_gpus=0 must be OMITTED (a zero-GPU request still forces GPU
    # scheduling constraints on some Ray versions)
    assert "num_gpus" not in encoder_map_kwargs(Dummy, num_gpus=0.0)


def test_fake_heavy_model_one_init_per_actor(ray_session, tmp_path):
    """64 docs / batch_size 8 / 2 actors: the fake model's __init__ (the
    "model load") must run once per actor process while __call__ handles
    many multi-row Arrow batches — init count < batch count, one init line
    per distinct worker pid, embeddings deterministic."""
    import ray.data as rd

    init_log = str(tmp_path / "inits.log")

    class FakeHeavyEncoder:
        DIM = 16

        def __init__(self, init_log: str, scale: float = 1.0):
            # stands in for the expensive model load; one line per __init__
            with open(init_log, "a") as f:
                f.write(f"{os.getpid()}\n")
            self.init_log = init_log
            self.scale = scale
            self.table = np.arange(self.DIM, dtype=np.float64) + 1.0

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            # vectorized "inference": deterministic embedding per doc_id
            emb = np.outer(ids.astype(np.float64) + 1.0, self.table) * self.scale
            emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(emb.reshape(-1).astype(np.float32),
                                 type=pa.float32()),
                        self.DIM,
                    ),
                    "actor_pid": pa.array(
                        np.full(len(ids), os.getpid()), type=pa.int64()
                    ),
                    "batch_rows": pa.array(
                        np.full(len(ids), len(ids)), type=pa.int64()
                    ),
                }
            )

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(64), type=pa.int64())})
    ).repartition(8)
    out = encoder_stage(
        ds,
        FakeHeavyEncoder,
        concurrency=2,
        batch_size=8,
        num_gpus=0.0,
        fn_constructor_kwargs={"init_log": init_log, "scale": 2.0},
    ).to_pandas()

    assert len(out) == 64 and sorted(out["doc_id"]) == list(range(64))
    with open(init_log) as f:
        init_pids = [int(x) for x in f.read().split()]
    # one init per actor process, never per batch
    assert sorted(set(init_pids)) == sorted(set(out["actor_pid"])), (
        init_pids,
        sorted(set(out["actor_pid"])),
    )
    assert len(init_pids) == len(set(init_pids)), "re-inited within an actor"
    assert len(init_pids) <= 2  # concurrency cap
    assert (out["batch_rows"] > 1).all(), "rows fed one-by-one, not batched"
    assert out["batch_rows"].max() == 8
    # embeddings are unit-norm f32[16] — the downstream-consumable layout
    emb0 = np.asarray(out.sort_values("doc_id")["embedding"].iloc[0])
    assert emb0.shape == (16,) and abs(np.linalg.norm(emb0) - 1.0) < 1e-5


def test_encoder_stage_feeds_dup_mining(ray_session):
    """End-to-end seam: plugin embeddings flow into the existing
    embedding-cosine dup miner unchanged (planted dup pair found)."""
    import ray.data as rd

    from imagededupx_ray.stages.ann import ivf_dup_pairs

    class TwinEncoder:
        """Maps doc_id -> embedding where ids 0 and 1 are near-twins."""

        DIM = 8

        def __init__(self):
            rng = np.random.default_rng(7)
            base = rng.normal(size=(32, self.DIM))
            base[1] = base[0] + 1e-3  # planted near-dup
            base /= np.linalg.norm(base, axis=1, keepdims=True)
            self.base = base

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            emb = self.base[ids].astype(np.float32)
            return pa.table(
                {
                    "vec_id": batch["doc_id"],
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(emb.reshape(-1), type=pa.float32()), self.DIM
                    ),
                }
            )

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(32), type=pa.int64())})
    )
    emb = encoder_stage(ds, TwinEncoder, concurrency=2, batch_size=16)
    pairs = ivf_dup_pairs(emb, threshold=0.999).to_pandas()
    assert {(0, 1)} == set(zip(pairs["a"], pairs["b"]))


def test_cli_media_encoder_plugin(ray_session, tmp_path, capsys):
    """CLI seam: media --encoder plugin:... runs the reference
    ClassicalImageEncoder through the actor-pool stage and mines
    embedding-cosine dup pairs (planted recode dups found)."""
    from imagededupx_ray.__main__ import main

    assert (
        main(
            [
                "media", "--modality", "image", "--synth", "40",
                "--encoder",
                "plugin:imagededupx_ray.stages.plugin:ClassicalImageEncoder",
                "--encoder-threshold", "0.99",
                "--output", str(tmp_path / "pairs"),
            ]
        )
        == 0
    )
    import json

    rep = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rep["modality"] == "image" and rep["rows"] > 0


def test_length_sorted_batches_reach_encoder_sorted(ray_session):
    """O6 length-sorted batching: with the window covering the corpus, every
    inference batch the encoder sees is internally length-sorted
    (descending), batches slice a monotone run (each batch's max <= the
    previous batch's min), and the id<->length pairing is untouched."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from imagededupx_ray.stages.plugin import encoder_stage

    rng = np.random.default_rng(13)
    n = 200
    lens = rng.integers(1, 120, size=n)
    texts = ["x" * int(k) for k in lens]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )

    class LenEncoder:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ln = np.array([len(t) for t in batch["text"].to_pylist()])
            assert (np.diff(ln) <= 0).all(), "batch not length-sorted"
            return pa.table(
                {
                    "vec_id": batch["doc_id"],
                    "n_chars": pa.array(ln, type=pa.int64()),
                    "batch_max": pa.array(
                        np.full(len(ln), ln.max()), type=pa.int64()
                    ),
                }
            )

    out = (
        encoder_stage(
            ds, LenEncoder, concurrency=1, batch_size=32,
            sort_by_length="text", sort_window=n,
        )
        .to_pandas()
    )
    assert len(out) == n
    # ids still map to their own lengths (sort permutes rows, never pairs)
    want = {i: int(k) for i, k in enumerate(lens)}
    assert {int(r.vec_id): int(r.n_chars) for r in out.itertuples()} == want
    # single sorted window -> successive batches hold non-increasing runs
    seen = out.drop_duplicates("batch_max", keep="first")["batch_max"].tolist()
    assert seen == sorted(seen, reverse=True)


def test_length_sorted_binary_and_list_columns(ray_session):
    """length_sorted dispatches on column type: binary payloads and
    pre-tokenized list columns sort by their own length kernels."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from imagededupx_ray.stages.plugin import length_sorted

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "payload": pa.array([b"aa", b"aaaa", b"a"], type=pa.binary()),
            "toks": pa.array([[1], [1, 2, 3], [1, 2]], type=pa.list_(pa.int32())),
        }
    )
    by_bin = length_sorted(rd.from_arrow(tbl), "payload").to_pandas()
    assert by_bin["doc_id"].tolist() == [1, 0, 2]
    by_list = length_sorted(
        rd.from_arrow(tbl), "toks", descending=False
    ).to_pandas()
    assert by_list["doc_id"].tolist() == [0, 2, 1]
