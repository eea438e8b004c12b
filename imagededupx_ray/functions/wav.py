"""Dependency-free WAV (RIFF PCM) codec — stdlib struct + numpy only.

Audio enters the pipeline as opaque binary payloads (SURVEY.md §2.1 S11
multimodal ingestion shape, generalized from the reference's image-file
inputs, utils/image_util.py:23-107). WAV needs no codec library: RIFF
chunks wrapping raw PCM (the public RIFF/WAVE specification). Supported:
PCM (format 1) 8-bit unsigned / 16-bit signed, any channel count and
sample rate; float32 (format 3) decode. Everything else raises ValueError
so callers can fall through to a library-backed path when one exists.

decode_wav: bytes -> (float64 samples in [-1, 1], shape (n,) mono or
            (n, ch), sample_rate)
encode_wav: samples -> PCM16 bytes (the test-vector generator).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIGNATURE = b"RIFF"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            audio_fmt, nch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            fmt = (audio_fmt, nch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, nch, rate, bits = fmt
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(samples, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(samples, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(samples, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"wav: unsupported format {audio_fmt}/{bits}-bit")
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch)
    return x, rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (mono (n,) or (n, ch)) -> PCM16 WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    nch = 1 if x.ndim == 1 else x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    block = nch * 2
    fmt = struct.pack("<HHIIHH", 1, nch, sample_rate, sample_rate * block, block, 16)
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(out)) + out
