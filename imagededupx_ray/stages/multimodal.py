"""Multimodal (image/audio) columns as opaque binary + typed metadata
(SURVEY.md §2.1 S11, §2.3 A1 — the reference's image decode + deep feature
extraction, re-expressed as actor-pool map_batches stages).

The container ships no image/audio libraries, so the DECODE KERNEL is
stubbed: with ``allow_fake=True`` (default) a deterministic fake decoder
derives (width, height, mean_luma) and a 64-d feature vector from the bytes'
blake2b stream; with ``allow_fake=False`` the stage raises
NotImplementedError at construction unless PIL is importable. Everything
Ray-side — schema, actor-pool shape, batch sizing, zero-copy binary access,
output layout — is real and tested; swapping in a real decoder touches only
``_decode_one`` / ``_features_one``.

Batch sizing note (SURVEY.md §4): binary payloads are wide — callers should
pass small ``batch_size`` (default 64) so batch x concurrency stays within
worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 64

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("payload", pa.binary()),
        ("format", pa.string()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_luma", pa.float32()),
        ("feature", pa.list_(pa.float32())),  # fixed FEATURE_DIM
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


class ImageDecodeStage:
    """Callable class for ``map_batches(ImageDecodeStage, concurrency=N,
    batch_size=64, num_cpus=1)``. Setup (library import / model load) happens
    once per actor in ``__init__`` (reference analogue: encoder construction
    improved_faiss_detector.py:97-143); ``__call__`` decodes a batch."""

    def __init__(self, allow_fake: bool = True):
        self._pil = _try_import_pil()
        if self._pil is None and not allow_fake:
            raise NotImplementedError(
                "no image decoder available in this environment; "
                "install Pillow or pass allow_fake=True"
            )

    # ---- kernels (swap these for real decode when PIL/torch exist) -----
    def _decode_one(self, payload: bytes) -> tuple[int, int, float]:
        if self._pil is not None:
            import io

            with self._pil.open(io.BytesIO(payload)) as im:
                g = im.convert("L")
                arr = np.asarray(g, dtype=np.float32)
                return im.width, im.height, float(arr.mean())
        h = hashlib.blake2b(payload, digest_size=16).digest()
        w = 64 + h[0] % 192  # deterministic fake dimensions
        ht = 64 + h[1] % 192
        return w, ht, float(int.from_bytes(h[2:4], "big") % 25600) / 100.0

    def _features_one(self, payload: bytes) -> np.ndarray:
        # deterministic fake embedding: chained blake2b keystream (max digest
        # is 64 bytes, so derive FEATURE_DIM*4 bytes over counter blocks)
        raw = b"".join(
            hashlib.blake2b(payload, digest_size=64, salt=bytes([i])).digest()
            for i in range((FEATURE_DIM * 4 + 63) // 64)
        )[: FEATURE_DIM * 4]
        v = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
        v = (v / 2**31) - 1.0
        return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        luma = np.zeros(n, dtype=np.float32)
        feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            w[i], h[i], luma[i] = self._decode_one(p)
            feats[i] = self._features_one(p)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), FEATURE_DIM
        ).cast(pa.list_(pa.float32()))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "width": pa.array(w, type=pa.int32()),
                "height": pa.array(h, type=pa.int32()),
                "mean_luma": pa.array(luma, type=pa.float32()),
                "feature": feat_col,
            }
        )


def decode_images(
    images_ds,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
    allow_fake: bool = True,
):
    """images (image_id, payload, format) → decoded features via an actor
    pool (the genuinely-stateful-stage case: decoder/model loaded per actor)."""
    from imagededupx_ray.util import clamp_actor_pool

    return images_ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"allow_fake": allow_fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_actor_pool(concurrency),
        num_cpus=1,
    )


def synthetic_images(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake binary payloads (pseudo-image bytes) for tests."""
    rng = np.random.default_rng(seed)
    payloads = [
        rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    return pa.table(
        {
            "image_id": pa.array(np.arange(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "format": pa.array(["fake"] * n, type=pa.string()),
        }
    )
