"""Video ingestion stages: frame-packed JPEG payloads → sampled frame
hashes (actor-pool map_batches) → video-level near-dup pairs.

Extends the reference's image dedup pipeline (improved_faiss_detector.py:
145-257) to the video modality: a video is an opaque binary column holding
an MJV1 container (a motion-JPEG shape: length-prefixed baseline-JPEG
frames — every frame decodes through the real numpy codec in
functions/jpeg.py, no fake kernel on this path). The frame-sample stage is
the classic large-scale video-dedup recipe: decode every k-th frame, pHash
it, and mine duplicates at the FRAME level with the same hamming-band LSH
exchange as the image tier, then lift frame pairs to video pairs by
match-fraction — so the expensive work stays per-frame-parallel and no
video ever needs to be decoded whole on one worker beyond its own payload.

Batch sizing note (SURVEY.md §4): video payloads are the widest column in
the engine — default ``batch_size`` is small (8) so batch × concurrency
stays inside worker heaps; at real scale the payload column would be
chunked at ingest (one row per shard of frames), which this container's
(video_id, frame_idx) output layout already supports.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from imagededupx_ray.util import clamp_actor_pool

VIDEO_MAGIC = b"MJV1"

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.int64()),
        ("payload", pa.binary()),
        ("format", pa.string()),
    ]
)


def encode_video(frames: list[np.ndarray], fps: int = 8, quality: int = 90) -> bytes:
    """uint8 frames (h, w[, 3]) → MJV1 bytes: magic + u16 n_frames + u8 fps
    + per frame (u32 length + baseline-JPEG bytes)."""
    from imagededupx_ray.functions.jpeg import encode_jpeg

    out = bytearray(VIDEO_MAGIC)
    out += struct.pack("<HB", len(frames), fps)
    for f in frames:
        data = encode_jpeg(f, quality=quality)
        out += struct.pack("<I", len(data)) + data
    return bytes(out)


def iter_video_frames(payload: bytes, every_k: int = 1):
    """Yield (frame_idx, decoded uint8 array) for every ``every_k``-th
    frame. Non-sampled frames are SKIPPED WITHOUT DECODING (length-prefix
    seek) — sampling cost scales with sampled frames, not video length."""
    from imagededupx_ray.functions.jpeg import decode_jpeg

    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not an MJV1 payload")
    n_frames, _fps = struct.unpack("<HB", payload[4:7])
    pos = 7
    for i in range(n_frames):
        (length,) = struct.unpack("<I", payload[pos : pos + 4])
        start = pos + 4
        pos = start + length
        if i % every_k == 0:
            yield i, decode_jpeg(payload[start:pos])


class VideoFrameHashStage:
    """Callable class for ``map_batches(VideoFrameHashStage, concurrency=N,
    batch_size=8, num_cpus=1)``: video payload → one output row per sampled
    frame (video_id, frame_idx, phash, width, height) — a fan-out batch
    transform (more rows out than in)."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from imagededupx_ray.functions import imagehash as IH

        vids, idxs, grays = [], [], []
        widths, heights = [], []
        for vid, payload in zip(
            batch["video_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for fi, arr in iter_video_frames(payload or b"", self.every_k):
                vids.append(vid)
                idxs.append(fi)
                grays.append(IH.to_grayscale(arr))
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
        hashes = np.array([IH.phash(g) for g in grays], dtype=np.uint64)
        return pa.table(
            {
                "video_id": pa.array(vids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "phash": pa.array(hashes.view(np.int64), type=pa.int64()),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
            }
        )


_VIDEO_PROC_CACHE: dict = {}


def _video_task(every_k: int):
    """Task-mode twin with per-worker-process stage cache (the
    signature_stage discipline — skips actor-pool cold start)."""

    def fn(batch):
        stage = _VIDEO_PROC_CACHE.get(every_k)
        if stage is None:
            stage = _VIDEO_PROC_CACHE[every_k] = VideoFrameHashStage(every_k=every_k)
        return stage(batch)

    return fn


def video_frame_hashes(
    videos_ds,
    every_k: int = 2,
    concurrency: int | tuple[int, int] | None = 2,
    batch_size: int = 8,
):
    """videos (video_id, payload, format) → sampled frame-hash rows.
    ``concurrency=None`` = task mode with a per-process cached stage;
    pass ``concurrency`` for a genuine actor pool (heavy-model shape)."""
    if concurrency is None:
        return videos_ds.map_batches(
            _video_task(every_k), batch_format="pyarrow", batch_size=batch_size
        )
    return videos_ds.map_batches(
        VideoFrameHashStage,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_actor_pool(concurrency),
        num_cpus=1,
    )


def video_dup_pairs(
    frame_hashes_ds,
    hamming_max: int = 10,
    min_frame_matches: int = 2,
    min_frac: float = 0.5,
):
    """Frame-hash rows → video-level near-dup pairs (a, b, frame_matches,
    match_frac). Frame pairs come from the image tier's hamming-band LSH
    exchange over (video_id << 16 | frame_idx) uids; a narrow packed-key
    groupby lifts them to video level; accept when the matched-frame count
    covers >= ``min_frac`` of the smaller video's sampled frames."""
    from imagededupx_ray.stages.simhash_lsh import hamming_band_pairs

    fh = frame_hashes_ds.select_columns(
        ["video_id", "frame_idx", "phash"]
    ).materialize()

    def uid(t: pa.Table) -> pa.Table:
        v = t["video_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = t["frame_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        # the packed (video<<16)|frame uid silently aliases videos >= 2^47 or
        # frame indexes >= 2^16 — fail loudly instead of corrupting pairs
        if len(v) and (int(v.max()) >= 1 << 47 or int(f.max()) >= 1 << 16):
            raise ValueError("video frame uid requires video_id < 2^47 and frame_idx < 2^16")
        return pa.table(
            {
                "frame_uid": pa.array((v << np.int64(16)) | f, type=pa.int64()),
                "phash": t["phash"],
            }
        )

    frame_pairs = hamming_band_pairs(
        fh.map_batches(uid, batch_format="pyarrow"),
        id_col="frame_uid",
        code_col="phash",
        hamming_max=hamming_max,
    )

    # sampled-frame counts per video (tiny: one row per video)
    counts = (
        fh.groupby("video_id")
        .count()
        .to_pandas()
        .set_index("video_id")["count()"]
    )
    import ray

    counts_ref = ray.put(
        (counts.index.to_numpy(np.int64), counts.to_numpy(np.int64))
    )

    def to_video_pairs(df: pd.DataFrame) -> pd.DataFrame:
        va = df["a"].to_numpy(np.int64) >> np.int64(16)
        vb = df["b"].to_numpy(np.int64) >> np.int64(16)
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        keep = lo != hi
        key = (lo[keep] << np.int64(32)) | hi[keep]
        uniq, n = np.unique(key, return_counts=True)
        return pd.DataFrame({"pair": uniq, "n": n})

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("pair", sort=False)["n"].sum()
        agg = agg[agg >= min_frame_matches]
        key = agg.index.to_numpy(np.int64)
        a = key >> np.int64(32)
        b = key & np.int64(0xFFFFFFFF)
        ids_s, ns_s = ray.get(counts_ref)
        na = ns_s[np.searchsorted(ids_s, a)]
        nb = ns_s[np.searchsorted(ids_s, b)]
        frac = agg.to_numpy(np.float64) / np.maximum(np.minimum(na, nb), 1)
        out = pd.DataFrame(
            {"a": a, "b": b, "frame_matches": agg.to_numpy(np.int64), "match_frac": frac}
        )
        return out[out["match_frac"] >= min_frac]

    return (
        frame_pairs.map_batches(to_video_pairs, batch_format="pandas")
        .groupby("pair")
        .map_groups(reduce_pairs, batch_format="pandas")
        .sort(["a", "b"])
    )


def _video_block(start: int, stop: int, seed: int, dup_every: int, n_frames: int):
    from imagededupx_ray.functions.imagehash import resize_area

    rng = np.random.default_rng((seed, start))
    out = []
    prev_frames = None
    for i in range(start, stop):
        if prev_frames is not None and i % dup_every == dup_every - 1:
            out.append((prev_frames, 78))  # re-encode at lower quality
        else:
            h, w = 48, 64
            base = rng.random((h // 4 + 4, w // 4 + 4))
            big = resize_area(base, h + 4 * n_frames, w + 4 * n_frames)
            frames = [
                (big[4 * f : 4 * f + h, 4 * f : 4 * f + w] * 255).astype(np.uint8)
                for f in range(n_frames)
            ]
            out.append((frames, 92))
            prev_frames = frames
            continue
        prev_frames = out[-1][0]
    return out


def synthetic_video_clips(
    n: int, seed: int = 42, dup_every: int = 5, n_frames: int = 10
) -> pa.Table:
    """Deterministic MJV1 corpus with planted near-duplicates: every
    ``dup_every``-th video is its predecessor RE-ENCODED at a different
    JPEG quality (the classic re-upload dup); the rest are independent
    smooth drifting fields (consecutive frames differ by translation, so
    frame hashes vary within a video but match across the planted pair).
    Generated in dup-chain-aligned blocks over Ray tasks when a session
    exists (util.parallel_block_table)."""
    from imagededupx_ray.util import parallel_block_table

    block_size = dup_every * max(2, -(-n // (32 * dup_every)))

    def block(s: int, e: int) -> pa.Table:
        payloads = [
            encode_video(frames, quality=q)
            for frames, q in _video_block(s, e, seed, dup_every, n_frames)
        ]
        return pa.table(
            {
                "video_id": pa.array(np.arange(s, e), type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
                "format": pa.array(["mjv1"] * (e - s), type=pa.string()),
            }
        )

    return parallel_block_table(n, block_size, block)
