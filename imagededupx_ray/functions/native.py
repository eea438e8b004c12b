"""Optional native (C, via ctypes) fast path for the signature hot loop.

The numpy MinHash/SimHash kernels in ``functions.hashing`` are already
cache-blocked, but numpy evaluates SplitMix64 one ufunc op at a time —
~150 M perm-hashes/s/core, with the (shingle x perm) temporaries making
6 passes through L2. Fusing the whole per-shingle loop (salt-XOR +
SplitMix64 + running column min + SimHash bit counts) into one C kernel
measures ~6.7x faster per batch on the same input, bit-for-bit identical
(uint64 arithmetic wraps mod 2^64 in both C and numpy).

Build model: the C source is embedded below and compiled ONCE PER NODE into
a content-addressed shared object under /tmp on first use (cc -O3; every
worker process dlopens the same cached .so). On a multi-node cluster each
node compiles its own — the cache key includes the source hash so upgrades
never load a stale binary. If no C compiler is present or the compile
fails, ``signature_kernel`` returns None and callers fall back to the
numpy path (tests/test_functions.py pins native == numpy on random input).

This is a per-batch kernel optimization in the same spirit as numpy itself
(native code driven from Python); the dataflow stays pure Ray Data.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SOURCE = r"""
#define _GNU_SOURCE
#include <stdint.h>
#include <string.h>

static inline uint64_t splitmix64(uint64_t z) {
    z ^= z >> 30; z *= 0xBF58476D1CE4E5B9ULL;
    z ^= z >> 27; z *= 0x94D049BB133111EBULL;
    z ^= z >> 31;
    return z;
}

/* Fused MinHash + SimHash-bit-count kernel over flat shingle hashes.
   shingles: uint64 flat shingle hashes (nonempty docs' segments, contiguous)
   bounds:   int64[n_nonempty+1] segment bounds into shingles
   doc_idx:  int64[n_nonempty] output row per nonempty doc
   salts:    uint64[num_perms] XOR salts (h_i(x) = splitmix64(x ^ c_i))
   mh_out:   uint64[n_docs*num_perms], caller-preset to the empty sentinel
   ones_out: int64[n_docs*64], caller-preset to 0; MSB-first per-bit counts
*/
void signature_kernel(const uint64_t* shingles, const int64_t* bounds,
                      const int64_t* doc_idx, int64_t n_nonempty,
                      const uint64_t* salts, int64_t num_perms,
                      uint64_t* mh_out, int64_t* ones_out) {
    for (int64_t d = 0; d < n_nonempty; ++d) {
        uint64_t* row = mh_out + doc_idx[d] * num_perms;
        int64_t* ones = ones_out + doc_idx[d] * 64;
        for (int64_t s = bounds[d]; s < bounds[d+1]; ++s) {
            uint64_t x = shingles[s];
            for (int64_t p = 0; p < num_perms; ++p) {
                uint64_t v = splitmix64(x ^ salts[p]);
                if (v < row[p]) row[p] = v;
            }
            for (int b = 0; b < 64; ++b)
                ones[b] += (int64_t)((x >> (63 - b)) & 1ULL);
        }
    }
}

/* Fused one-permutation-hashing (OPH) binned-min + SimHash-bit-count kernel.
   ONE hash evaluation per shingle (vs num_perms in signature_kernel): each
   shingle's v = splitmix64(x ^ salt) lands in bin v >> (64 - logk) and the
   per-bin running min is kept. Empty bins stay at the caller's sentinel;
   densification happens in numpy afterwards (cold path, matrix-shaped).
   SimHash counts bits of the RAW shingle hash x — bit-identical to
   signature_kernel's simhash regardless of signer. */
void oph_kernel(const uint64_t* shingles, const int64_t* bounds,
                const int64_t* doc_idx, int64_t n_nonempty,
                uint64_t salt, int64_t logk,
                uint64_t* mh_out, int64_t* ones_out) {
    int64_t num_perms = (int64_t)1 << logk;
    int shift = (int)(64 - logk);
    for (int64_t d = 0; d < n_nonempty; ++d) {
        uint64_t* row = mh_out + doc_idx[d] * num_perms;
        int64_t* ones = ones_out + doc_idx[d] * 64;
        for (int64_t s = bounds[d]; s < bounds[d+1]; ++s) {
            uint64_t x = shingles[s];
            uint64_t v = splitmix64(x ^ salt);
            uint64_t b = v >> shift;
            if (v < row[b]) row[b] = v;
            for (int k = 0; k < 64; ++k)
                ones[k] += (int64_t)((x >> (63 - k)) & 1ULL);
        }
    }
}

/* One-pass web-page text extract: first-<main> slice -> <[^>]+> tag strip ->
   standard-entity decode (&lt; &gt; &quot; &#39; &amp;) -> ASCII-whitespace
   collapse + edge trim. Byte-identical to the chained pyarrow.compute path
   in stages/extract.py (entity outputs are never rescanned, matching
   non-rescanning chained replaces; tested in tests/test_extract_fuzz.py).
   Rows where a '&' does not start a standard entity get slow[r]=1 and empty
   output — the caller recomputes them via the frozen scalar extract_text
   (same routing as the pyarrow probe). Caller pre-filters non-ASCII rows.
   out must hold total input bytes (output never exceeds input). */
/* python isspace semantics on ASCII: \t-\r, FS/GS/RS/US (0x1C-0x1F), space —
   matches both python re \s and arrow utf8_split_whitespace for ASCII rows */
static inline int is_ws(uint8_t c) {
    return (c >= 0x09 && c <= 0x0D) || (c >= 0x1C && c <= 0x1F) || c == 0x20;
}

void extract_kernel(const uint8_t* data, const int64_t* off, int64_t n_rows,
                    uint8_t* out, int64_t* out_off, uint8_t* slow) {
    int64_t o = 0;
    out_off[0] = 0;
    for (int64_t r = 0; r < n_rows; ++r) {
        const uint8_t* in = data + off[r];
        int64_t n = off[r + 1] - off[r];
        if (n >= 13) {  /* "<main></main>" is 13 bytes */
            const uint8_t* p = (const uint8_t*)memmem(in, (size_t)n, "<main>", 6);
            if (p) {
                const uint8_t* q = (const uint8_t*)memmem(
                    p + 6, (size_t)(n - (p - in) - 6), "</main>", 7);
                if (q) { in = p + 6; n = q - in; }
            }
        }
        int64_t row_start = o;
        int pending = 0, started = 0;
        uint8_t is_slow = 0;
        for (int64_t i = 0; i < n; ) {
            uint8_t c = in[i];
            if (c == '<') {
                int64_t j = i + 1;
                while (j < n && in[j] != '>') j++;
                if (j < n && j > i + 1) {  /* <[^>]+> -> whitespace */
                    if (started) pending = 1;
                    i = j + 1; continue;
                }
                if (pending) { out[o++] = ' '; pending = 0; }
                out[o++] = '<'; started = 1; i++; continue;
            }
            if (c == '&') {
                uint8_t rep = 0; int64_t len = 0;
                if (i+3 < n && in[i+1]=='l' && in[i+2]=='t' && in[i+3]==';') { rep='<'; len=4; }
                else if (i+3 < n && in[i+1]=='g' && in[i+2]=='t' && in[i+3]==';') { rep='>'; len=4; }
                else if (i+5 < n && in[i+1]=='q' && in[i+2]=='u' && in[i+3]=='o' && in[i+4]=='t' && in[i+5]==';') { rep='"'; len=6; }
                else if (i+4 < n && in[i+1]=='#' && in[i+2]=='3' && in[i+3]=='9' && in[i+4]==';') { rep='\''; len=5; }
                else if (i+4 < n && in[i+1]=='a' && in[i+2]=='m' && in[i+3]=='p' && in[i+4]==';') { rep='&'; len=5; }
                if (len) {
                    if (pending) { out[o++] = ' '; pending = 0; }
                    out[o++] = rep; started = 1; i += len; continue;
                }
                is_slow = 1; break;
            }
            if (is_ws(c)) { if (started) pending = 1; i++; continue; }
            if (pending) { out[o++] = ' '; pending = 0; }
            out[o++] = c; started = 1; i++;
        }
        slow[r] = is_slow;
        if (is_slow) o = row_start;
        out_off[r + 1] = o;
    }
}
"""

_lib = None
_tried = False


def _build_and_load():
    """Compile the embedded source into a content-addressed .so (once per
    node) and dlopen it. Concurrent workers race benignly: each compiles to
    its own temp file and os.rename's into place (atomic on POSIX)."""
    src_hash = hashlib.blake2b(_SOURCE.encode(), digest_size=8).hexdigest()
    # per-uid cache dir, created 0700 — a world-shared predictable /tmp path
    # would let another local user pre-plant a .so that every worker dlopens
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"imagededupx_native_{os.getuid()}"
    )
    so_path = os.path.join(cache_dir, f"sig_{src_hash}.so")
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    st = os.stat(cache_dir)
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        return None  # squatted or group/world-writable — refuse to load
    if not os.path.exists(so_path):
        c_path = os.path.join(cache_dir, f"sig_{src_hash}.c")
        with open(c_path, "w") as f:
            f.write(_SOURCE)
        fd, tmp_so = tempfile.mkstemp(suffix=".so", dir=cache_dir)
        os.close(fd)
        for flags in (["-O3", "-march=native"], ["-O2"]):
            try:
                subprocess.run(
                    ["cc", *flags, "-fPIC", "-shared", "-o", tmp_so, c_path],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.rename(tmp_so, so_path)
                break
            except (subprocess.SubprocessError, OSError):
                continue
        else:
            if os.path.exists(tmp_so):
                os.unlink(tmp_so)
            return None
    lib = ctypes.CDLL(so_path)
    lib.signature_kernel.restype = None
    lib.oph_kernel.restype = None
    lib.extract_kernel.restype = None
    return lib


def _get_lib():
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build_and_load()
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return _get_lib() is not None


def signature_kernel(
    shingles: np.ndarray,
    bounds: np.ndarray,
    doc_idx: np.ndarray,
    salts: np.ndarray,
    mh_out: np.ndarray,
    ones_out: np.ndarray,
) -> bool:
    """Run the fused kernel in place. Returns False (untouched outputs) when
    no native library is available — caller falls back to numpy."""
    lib = _get_lib()
    if lib is None:
        return False
    sh = np.ascontiguousarray(shingles, dtype=np.uint64)
    bo = np.ascontiguousarray(bounds, dtype=np.int64)
    di = np.ascontiguousarray(doc_idx, dtype=np.int64)
    sa = np.ascontiguousarray(salts, dtype=np.uint64)
    assert mh_out.flags.c_contiguous and ones_out.flags.c_contiguous
    lib.signature_kernel(
        sh.ctypes.data_as(ctypes.c_void_p),
        bo.ctypes.data_as(ctypes.c_void_p),
        di.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(di)),
        sa.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(sa)),
        mh_out.ctypes.data_as(ctypes.c_void_p),
        ones_out.ctypes.data_as(ctypes.c_void_p),
    )
    return True


def oph_kernel(
    shingles: np.ndarray,
    bounds: np.ndarray,
    doc_idx: np.ndarray,
    salt: int,
    logk: int,
    mh_out: np.ndarray,
    ones_out: np.ndarray,
) -> bool:
    """Run the fused OPH binned-min + simhash kernel in place. Returns False
    (untouched outputs) when no native library is available."""
    lib = _get_lib()
    if lib is None:
        return False
    sh = np.ascontiguousarray(shingles, dtype=np.uint64)
    bo = np.ascontiguousarray(bounds, dtype=np.int64)
    di = np.ascontiguousarray(doc_idx, dtype=np.int64)
    assert mh_out.flags.c_contiguous and ones_out.flags.c_contiguous
    lib.oph_kernel(
        sh.ctypes.data_as(ctypes.c_void_p),
        bo.ctypes.data_as(ctypes.c_void_p),
        di.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(di)),
        ctypes.c_uint64(salt),
        ctypes.c_int64(logk),
        mh_out.ctypes.data_as(ctypes.c_void_p),
        ones_out.ctypes.data_as(ctypes.c_void_p),
    )
    return True


def extract_kernel(
    data: np.ndarray, offsets: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Run the fused extract over a flat utf8 buffer + row offsets. Returns
    (out_bytes, out_offsets int64[n+1], slow_flags bool[n]) or None when no
    native library is available."""
    lib = _get_lib()
    if lib is None:
        return None
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    total = int(off[-1] - off[0]) if n_rows else 0
    out = np.empty(max(total, 1), dtype=np.uint8)
    out_off = np.empty(n_rows + 1, dtype=np.int64)
    out_off[0] = 0
    slow = np.zeros(max(n_rows, 1), dtype=np.uint8)
    if n_rows:
        lib.extract_kernel(
            data.ctypes.data_as(ctypes.c_void_p),
            off.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n_rows),
            out.ctypes.data_as(ctypes.c_void_p),
            out_off.ctypes.data_as(ctypes.c_void_p),
            slow.ctypes.data_as(ctypes.c_void_p),
        )
    return out[: int(out_off[-1])], out_off, slow[:n_rows].astype(bool)
