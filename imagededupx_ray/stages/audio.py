"""Audio ingestion stages: WAV payloads → clip features + landmark
fingerprints (actor-pool map_batches), and fingerprint-bucket near-dup
mining (groupby exchange).

The multimodal generalization of the reference's image feature pipeline
(improved_faiss_detector.py:145-257: decode → feature → index → dup pairs)
to audio: decode via the stdlib WAV codec (functions/wav.py), features +
Wang-2003 constellation fingerprints via numpy kernels
(functions/audiofeat.py), and near-dup pairs via an exact landmark-hash
bucket join — the SAME execution shape as MinHash LSH banding
(stages/lsh.py): explode (clip, hash) rows → coarse-partition groupby →
vectorized per-bucket pair emission with the shared skew valve → partial
match counts → one narrow packed-key sum. No O(n²) stage anywhere; scales
like the text LSH tier.

Batch sizing note (SURVEY.md §4): WAV payloads are wide (16-bit PCM ≈
32 KB/sec/channel) — keep ``batch_size`` small so batch × concurrency
stays inside worker heaps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from imagededupx_ray.functions import audiofeat as AF
from imagededupx_ray.stages.lsh import _pow2, emit_pairs_vectorized
from imagededupx_ray.util import clamp_actor_pool, suggest_num_partitions

AUDIO_SCHEMA = pa.schema(
    [
        ("clip_id", pa.int64()),
        ("payload", pa.binary()),
        ("format", pa.string()),
    ]
)


class AudioFeatureStage:
    """Callable class for ``map_batches(AudioFeatureStage, concurrency=N,
    batch_size=B, num_cpus=1)``: WAV payload → scalar descriptors +
    landmark fingerprint set. Decoder/window state set up once per actor."""

    def __init__(self, frame: int = 1024, hop: int = 512, n_bands: int = 6):
        self.frame = frame
        self.hop = hop
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from imagededupx_ray.functions.wav import decode_wav

        payloads = batch["payload"].to_pylist()
        feats = []
        fps = []
        for p in payloads:
            x, rate = decode_wav(p or b"")
            feats.append(AF.clip_features(x, rate, self.frame, self.hop))
            fps.append(
                AF.landmark_fingerprints(
                    x, rate, self.frame, self.hop, self.n_bands
                )
            )
        cols: dict = {"clip_id": batch["clip_id"]}
        for k in (
            "duration_sec",
            "rms",
            "zcr_hz",
            "centroid_hz",
            "bandwidth_hz",
            "rolloff_hz",
        ):
            cols[k] = pa.array([f[k] for f in feats], type=pa.float64())
        cols["n_landmarks"] = pa.array([len(f) for f in fps], type=pa.int32())
        cols["fingerprints"] = pa.array(
            [f.tolist() for f in fps], type=pa.list_(pa.int64())
        )
        return pa.table(cols)


_AUDIO_PROC_CACHE: dict = {}


def _audio_task():
    """Task-mode twin with per-worker-process stage cache (the
    signature_stage discipline — skips actor-pool cold start; stage state
    is stdlib-codec cheap)."""

    def fn(batch):
        stage = _AUDIO_PROC_CACHE.get("audio")
        if stage is None:
            stage = _AUDIO_PROC_CACHE["audio"] = AudioFeatureStage()
        return stage(batch)

    return fn


def audio_features(
    clips_ds,
    concurrency: int | tuple[int, int] | None = 2,
    batch_size: int = 32,
):
    """clips (clip_id, payload, format) → features + fingerprints.
    ``concurrency=None`` = task mode with a per-process cached stage;
    pass ``concurrency`` for a genuine actor pool (heavy-model shape)."""
    if concurrency is None:
        return clips_ds.map_batches(
            _audio_task(), batch_format="pyarrow", batch_size=batch_size
        )
    return clips_ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_actor_pool(concurrency),
        num_cpus=1,
    )


def fingerprint_dup_pairs(
    features_ds,
    min_matches: int = 8,
    min_frac: float = 0.25,
    num_partitions: int | None = None,
    max_bucket_size: int = 4096,
    bucket_window: int = 16,
):
    """(clip_id, fingerprints, n_landmarks) → (a, b, matches, match_frac)
    for pairs sharing >= ``min_matches`` landmark hashes AND whose shared
    count covers >= ``min_frac`` of the smaller clip's fingerprint set (the
    scale-free accept rule — short clips have few landmarks). One
    bucket-groupby exchange emits per-bucket pairs with partial counts; a
    second narrow exchange sums counts over a packed (a << 32 | b) key;
    the frac verify reads n_landmarks through a pair-member-restricted
    scan (4+4 bytes/row — the stages/verify.py broadcast pattern). Hot
    buckets (a landmark shared by thousands of clips carries no
    discriminative signal) go through the shared skew valve from the
    MinHash shuffle."""
    if num_partitions is None:
        num_partitions = suggest_num_partitions(per_cpu=2)
    p = _pow2(num_partitions)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["clip_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t["fingerprints"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fp = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = pa.compute.list_value_length(col).to_numpy(zero_copy_only=False)
        owner = np.repeat(ids, lengths)
        return pa.table(
            {
                "_part": pa.array((fp & np.int64(p - 1)).astype(np.int32)),
                "bucket": pa.array(fp, type=pa.int64()),
                "doc_id": pa.array(owner, type=pa.int64()),
            }
        )

    def emit_counts(df: pd.DataFrame) -> pd.DataFrame:
        a, b = emit_pairs_vectorized(
            df["bucket"].to_numpy(),
            df["doc_id"].to_numpy(),
            max_bucket_size,
            bucket_window,
        )
        if not len(a):
            return pd.DataFrame({"pair": np.empty(0, np.int64), "n": np.empty(0, np.int64)})
        # the packed (a<<32)|b pair key silently aliases ids >= 2^32 — fail
        # loudly instead of corrupting pairs (clip ids fit easily today; a
        # >4e9-clip corpus must widen the key to two columns)
        if int(b.max()) >= 1 << 32 or int(a.max()) >= 1 << 31:
            raise ValueError("audio pair packing requires clip ids < 2^31/2^32")
        key = (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)
        uniq, counts = np.unique(key, return_counts=True)
        return pd.DataFrame({"pair": uniq, "n": counts})

    def reduce_counts(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("pair", sort=False)["n"].sum()
        keep = agg[agg >= min_matches]
        key = keep.index.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "a": key >> np.int64(32),
                "b": key & np.int64(0xFFFFFFFF),
                "matches": keep.to_numpy(dtype=np.int64),
            }
        )

    feats = features_ds.materialize()
    pairs = (
        feats.select_columns(["clip_id", "fingerprints"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_counts, batch_format="pandas")
        .groupby("pair")
        .map_groups(reduce_counts, batch_format="pandas")
        .materialize()
    )

    # pair-member-restricted landmark-count lookup (narrow 12-byte/row scan)
    members = []
    for b in pairs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        members.append(b["a"].to_numpy(zero_copy_only=False).astype(np.int64))
        members.append(b["b"].to_numpy(zero_copy_only=False).astype(np.int64))
    member_ids = (
        np.unique(np.concatenate(members)) if members else np.empty(0, np.int64)
    )
    ids_l, ns_l = [], []
    for b in feats.select_columns(["clip_id", "n_landmarks"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        cid = b["clip_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.searchsorted(member_ids, cid)
        mask = (keep < len(member_ids)) & (member_ids[np.minimum(keep, len(member_ids) - 1)] == cid) if len(member_ids) else np.zeros(len(cid), bool)
        ids_l.append(cid[mask])
        ns_l.append(b["n_landmarks"].to_numpy(zero_copy_only=False).astype(np.int64)[mask])
    lookup_ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
    lookup_ns = np.concatenate(ns_l) if ns_l else np.empty(0, np.int64)
    order = np.argsort(lookup_ids)
    lookup_ids, lookup_ns = lookup_ids[order], lookup_ns[order]
    import ray

    lookup_ref = ray.put((lookup_ids, lookup_ns))

    def add_frac(t: pa.Table) -> pa.Table:
        ids_s, ns_s = ray.get(lookup_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["matches"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = ns_s[np.searchsorted(ids_s, a)]
        nb = ns_s[np.searchsorted(ids_s, b)]
        frac = m / np.maximum(np.minimum(na, nb), 1)
        out = t.append_column("match_frac", pa.array(frac, type=pa.float64()))
        return out.filter(pa.array(frac >= min_frac))

    return pairs.map_batches(add_frac, batch_format="pyarrow").sort(["a", "b"])


def _clip_block(start: int, stop: int, seed: int, dup_every: int, rate: int):
    rng = np.random.default_rng((seed, start))
    clips = []
    prev = None
    for i in range(start, stop):
        if prev is not None and i % dup_every == dup_every - 1:
            x = prev * 0.9 + rng.normal(0, 0.003, len(prev))
        else:
            dur = float(rng.uniform(1.0, 2.0))
            t = np.arange(int(dur * rate)) / rate
            x = np.zeros_like(t)
            for _ in range(int(rng.integers(3, 6))):
                # chirps, not stationary tones: sweeping spectra give each
                # frame distinct peaks, like real-world audio
                f0 = float(rng.uniform(200, 2500))
                slope = float(rng.uniform(-800, 800))
                x += float(rng.uniform(0.1, 0.4)) * np.sin(
                    2 * np.pi * (f0 * t + 0.5 * slope * t**2)
                )
            x *= np.minimum(1.0, 10 * np.minimum(t, t[::-1]))  # fade in/out
        clips.append(x)
        prev = x
    return clips


def synthetic_wav_clips(
    n: int, seed: int = 42, dup_every: int = 5, rate: int = 8000
) -> pa.Table:
    """Deterministic WAV corpus with planted near-duplicates: every
    ``dup_every``-th clip is its predecessor re-gained + lightly noised
    (same spectral peaks → overlapping landmark fingerprints); the rest are
    independent random chirp mixtures. Generated in independent
    dup-chain-aligned blocks fanned out over Ray tasks when a session
    exists (util.parallel_block_table)."""
    from imagededupx_ray.functions.wav import encode_wav
    from imagededupx_ray.util import parallel_block_table

    block_size = dup_every * max(4, -(-n // (32 * dup_every)))

    def block(s: int, e: int) -> pa.Table:
        payloads = [
            encode_wav(np.clip(x, -1, 1), rate)
            for x in _clip_block(s, e, seed, dup_every, rate)
        ]
        return pa.table(
            {
                "clip_id": pa.array(np.arange(s, e), type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
                "format": pa.array(["wav"] * (e - s), type=pa.string()),
            }
        )

    return parallel_block_table(n, block_size, block)
