"""Perceptual image hashes as pure numpy kernels over decoded pixel arrays
(SURVEY.md §2.2 M5 — the reference's namesake capability,
/root/reference/similarities/similarities/utils/imagehash.py):

- ``average_hash`` (:159-181): resize to hash_size², threshold at mean.
- ``phash`` (:184-199): resize to (hash_size·4)², 2-D DCT-II, top-left
  hash_size² low-frequency block, threshold at median.
- ``dhash`` (:220-235): resize to (hash_size, hash_size+1), horizontal
  gradient sign bits.
- ``whash`` (:253-297): Haar LL coefficients at the hash_size level (with
  the deepest-level LL removed), threshold at median.
- ``colorhash`` (:300-347): black/gray/hue-bin pixel fractions discretized
  to binbits each.

The reference decodes via PIL and resizes with Lanczos; this container has
no image libraries, so the kernels take ALREADY-DECODED numpy arrays
(grayscale 2-D or RGB 3-D, uint8 or float) and resize by exact area
averaging (deterministic, dependency-free — hash VALUES therefore differ
from PIL-resized ones, but the algorithms and their hamming-space geometry
are identical). DCT-II matches ``scipy.fftpack.dct(..., type=2, norm=None)``
bit-for-bit (matmul against the explicit cosine basis). All kernels are
deterministic and verified against pure-python per-pixel oracles in
tests/test_imagehash.py.
"""

from __future__ import annotations

import numpy as np

# ITU-R 601-2 luma transform (PIL convert("L") coefficients)
_LUMA = np.array([299, 587, 114], dtype=np.float64) / 1000.0


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """RGB (h, w, 3) → grayscale (h, w) float64; 2-D input passes through."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.ndim == 3 and a.shape[2] == 3:
        return a @ _LUMA
    raise ValueError(f"expected (h, w) or (h, w, 3) array, got {a.shape}")


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-average resize: output pixel (i, j) is the mean of the
    input region [i·h/out_h, (i+1)·h/out_h) × [j·w/out_w, (j+1)·w/out_w)
    with fractional boundary pixels weighted by overlap. Deterministic,
    dependency-free stand-in for PIL's Lanczos resampling."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape
    if (h, w) == (out_h, out_w):
        return a.copy()

    def axis_weights(n_in: int, n_out: int) -> np.ndarray:
        """(n_out, n_in) row-stochastic overlap matrix."""
        scale = n_in / n_out
        W = np.zeros((n_out, n_in), dtype=np.float64)
        for o in range(n_out):
            lo, hi = o * scale, (o + 1) * scale
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, n_in)):
                W[o, i] = min(hi, i + 1) - max(lo, i)
        W /= W.sum(axis=1, keepdims=True)
        return W

    Wh = axis_weights(h, out_h)
    Ww = axis_weights(w, out_w)
    return Wh @ a @ Ww.T


def _dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II basis: y[k] = 2·Σ_j x[j]·cos(π k (2j+1) / 2n)
    (scipy.fftpack.dct type 2, norm=None)."""
    j = np.arange(n)
    k = np.arange(n)[:, None]
    return 2.0 * np.cos(np.pi * k * (2 * j + 1) / (2 * n))


_DCT_CACHE: dict[int, np.ndarray] = {}


def dct2(pixels: np.ndarray) -> np.ndarray:
    """2-D DCT-II, axis 0 then axis 1 (the reference's
    ``dct(dct(pixels, axis=0), axis=1)``)."""
    h, w = pixels.shape
    Ch = _DCT_CACHE.setdefault(h, _dct_matrix(h))
    Cw = _DCT_CACHE.setdefault(w, _dct_matrix(w))
    return Ch @ pixels @ Cw.T


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major bool array → python int (MSB = first bit), any length."""
    out = 0
    for b in bits.reshape(-1):
        out = (out << 1) | int(b)
    return out


def average_hash(img: np.ndarray, hash_size: int = 8) -> int:
    """aHash: mean-threshold bits of the hash_size² area-resized grayscale
    (imagehash.py:159-181)."""
    if hash_size < 2:
        raise ValueError("hash_size must be >= 2")
    p = resize_area(to_grayscale(img), hash_size, hash_size)
    return _pack_bits(p > p.mean())


def phash(img: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    """pHash: median-threshold bits of the top-left hash_size² block of the
    2-D DCT of the (hash_size·highfreq_factor)² resize (imagehash.py:184-199)."""
    if hash_size < 2:
        raise ValueError("hash_size must be >= 2")
    s = hash_size * highfreq_factor
    d = dct2(resize_area(to_grayscale(img), s, s))
    low = d[:hash_size, :hash_size]
    return _pack_bits(low > np.median(low))


def phash_simple(img: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    """pHash (simple variant): 1-D DCT along rows only, columns 1..hash_size
    of the first hash_size rows, MEAN threshold (imagehash.py:204-218)."""
    s = hash_size * highfreq_factor
    p = resize_area(to_grayscale(img), s, s)
    C = _DCT_CACHE.setdefault(s, _dct_matrix(s))
    d = p @ C.T  # dct along axis 1 (scipy dct default axis=-1)
    low = d[:hash_size, 1 : hash_size + 1]
    return _pack_bits(low > low.mean())


def dhash(img: np.ndarray, hash_size: int = 8) -> int:
    """dHash: horizontal-gradient sign bits of the (hash_size, hash_size+1)
    resize (imagehash.py:220-235)."""
    if hash_size < 2:
        raise ValueError("hash_size must be >= 2")
    p = resize_area(to_grayscale(img), hash_size, hash_size + 1)
    return _pack_bits(p[:, 1:] > p[:, :-1])


def dhash_vertical(img: np.ndarray, hash_size: int = 8) -> int:
    """dHash (vertical): row-gradient sign bits of the (hash_size+1,
    hash_size) resize (imagehash.py:238-249)."""
    p = resize_area(to_grayscale(img), hash_size + 1, hash_size)
    return _pack_bits(p[1:, :] > p[:-1, :])


def _haar_ll(pixels: np.ndarray, level: int) -> np.ndarray:
    """LL (approximation) coefficients after ``level`` orthonormal Haar
    decompositions: each level halves both axes; LL = 2^level × block mean."""
    a = pixels
    for _ in range(level):
        a = (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]) / 2.0
    return a


def whash(img: np.ndarray, hash_size: int = 8, image_scale: int = 64,
          remove_max_haar_ll: bool = True) -> int:
    """wHash: Haar-wavelet LL coefficients at the hash_size level, median
    threshold (imagehash.py:253-297). ``remove_max_haar_ll`` zeroes the
    deepest LL coefficient (the global DC term) before hashing, exactly like
    the reference's ``coeffs[0] *= 0`` — equivalent to subtracting the image
    mean from every LL coefficient at the target level."""
    if hash_size & (hash_size - 1):
        raise ValueError("hash_size must be a power of 2")
    if image_scale & (image_scale - 1):
        raise ValueError("image_scale must be a power of 2")
    ll_max_level = int(np.log2(image_scale))
    level = int(np.log2(hash_size))
    if level > ll_max_level:
        raise ValueError("hash_size in a wrong range")
    p = resize_area(to_grayscale(img), image_scale, image_scale) / 255.0
    if remove_max_haar_ll:
        # zeroing the single deepest LL coefficient removes the global mean
        # from the reconstruction: subtract it from the shallower LL directly
        p = p - p.mean()
    ll = _haar_ll(p, ll_max_level - level)
    return _pack_bits(ll > np.median(ll))


def rgb_to_hsv_bytes(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB → (H, S, V) flat uint8 arrays with PIL's
    convert("HSV") quantization (hue in 0..255)."""
    a = np.asarray(rgb, dtype=np.float64).reshape(-1, 3)
    r, g, b = a[:, 0], a[:, 1], a[:, 2]
    mx = a.max(axis=1)
    mn = a.min(axis=1)
    c = mx - mn
    hue = np.zeros(len(a))
    nz = c > 0
    rm, gm, bm = (mx == r) & nz, (mx == g) & nz & (mx != r), nz & (mx != r) & (mx != g)
    hue[rm] = ((g - b)[rm] / c[rm]) % 6
    hue[gm] = (b - r)[gm] / c[gm] + 2
    hue[bm] = (r - g)[bm] / c[bm] + 4
    H = np.floor(hue * 256.0 / 6.0).astype(np.int64) % 256
    S = np.zeros(len(a))
    pos = mx > 0
    S[pos] = c[pos] / mx[pos]
    return (
        H.astype(np.uint8),
        np.floor(S * 255.0 + 0.5).astype(np.uint8),
        mx.astype(np.uint8),
    )


def colorhash(rgb: np.ndarray, binbits: int = 3) -> int:
    """Color hash: discretized pixel fractions in black / gray / 6 faint-hue /
    6 bright-hue bins, binbits each → 14·binbits bits (imagehash.py:300-347)."""
    gray = to_grayscale(rgb).reshape(-1)
    H, S, _ = rgb_to_hsv_bytes(rgb)
    intensity = np.floor(gray + 0.5)
    mask_black = intensity < 256 // 8
    frac_black = mask_black.mean()
    mask_gray = S < 256 // 3
    frac_gray = np.logical_and(~mask_black, mask_gray).mean()
    mask_colors = np.logical_and(~mask_black, ~mask_gray)
    mask_faint = np.logical_and(mask_colors, S < 256 * 2 // 3)
    mask_bright = np.logical_and(mask_colors, S > 256 * 2 // 3)
    c = max(1, int(mask_colors.sum()))
    hue_bins = np.linspace(0, 255, 7)
    faint_counts = (
        np.histogram(H[mask_faint], bins=hue_bins)[0] if mask_faint.any() else np.zeros(6)
    )
    bright_counts = (
        np.histogram(H[mask_bright], bins=hue_bins)[0] if mask_bright.any() else np.zeros(6)
    )
    maxvalue = 2**binbits
    values = [
        min(maxvalue - 1, int(frac_black * maxvalue)),
        min(maxvalue - 1, int(frac_gray * maxvalue)),
    ] + [min(maxvalue - 1, int(n * maxvalue / c)) for n in list(faint_counts) + list(bright_counts)]
    out = 0
    for v in values:
        out = (out << binbits) | v
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ------------------------------------------------------ crop-resistant hash
# "Efficient Cropping-Resistant Robust Image Hashing" (Steinebach et al.,
# DOI 10.1109/ARES.2014.85; reference imagehash.py:350-595): segment the
# blurred image into bright/dark regions, hash each region's bounding-box
# crop — a crop of the original keeps most region hashes intact.


def gaussian_blur3(img: np.ndarray) -> np.ndarray:
    """3x3 binomial blur (the classic [1 2 1]/4 separable kernel — PIL's
    GaussianBlur analogue at radius ~1), edge-replicated."""
    p = np.pad(np.asarray(img, dtype=np.float64), 1, mode="edge")
    h = (p[:, :-2] + 2 * p[:, 1:-1] + p[:, 2:]) / 4.0
    return (h[:-2, :] + 2 * h[1:-1, :] + h[2:, :]) / 4.0


def median_filter3(img: np.ndarray) -> np.ndarray:
    """3x3 median filter, edge-replicated."""
    p = np.pad(np.asarray(img, dtype=np.float64), 1, mode="edge")
    stack = np.stack(
        [p[y : y + img.shape[0], x : x + img.shape[1]] for y in range(3) for x in range(3)]
    )
    return np.median(stack, axis=0)


def find_segments(
    pixels: np.ndarray, segment_threshold: float = 128, min_segment_size: int = 500
) -> list[np.ndarray]:
    """Connected 4-neighbour regions of the thresholded image — first the
    bright 'hills', then the dark 'valleys' (reference :483-528). Regions are
    grown by vectorized frontier dilation instead of per-pixel python sets.
    Returns one (n, 2) array of (row, col) coordinates per kept region."""
    mask_all = pixels > segment_threshold
    segments: list[np.ndarray] = []
    for mask in (mask_all, ~mask_all):
        unassigned = mask.copy()
        while unassigned.any():
            seed = np.unravel_index(np.argmax(unassigned), unassigned.shape)
            region = np.zeros_like(unassigned)
            frontier = np.zeros_like(unassigned)
            frontier[seed] = True
            region[seed] = True
            while frontier.any():
                grow = np.zeros_like(frontier)
                grow[1:, :] |= frontier[:-1, :]
                grow[:-1, :] |= frontier[1:, :]
                grow[:, 1:] |= frontier[:, :-1]
                grow[:, :-1] |= frontier[:, 1:]
                frontier = grow & unassigned & ~region
                region |= frontier
            unassigned &= ~region
            if int(region.sum()) > min_segment_size:
                segments.append(np.argwhere(region))
    return segments


def crop_resistant_hash(
    img: np.ndarray,
    hash_func=None,
    limit_segments: int | None = None,
    segment_threshold: float = 128,
    min_segment_size: int = 500,
    segmentation_image_size: int = 300,
) -> list[int]:
    """Multi-hash: one ``hash_func`` (default dhash) per segment bounding-box
    crop of the ORIGINAL image (reference :530-595). Returns the list of
    segment hashes (the reference's ImageMultiHash.segment_hashes)."""
    if hash_func is None:
        hash_func = dhash
    orig = to_grayscale(img)
    small = resize_area(orig, segmentation_image_size, segmentation_image_size)
    pixels = median_filter3(gaussian_blur3(small))
    segments = find_segments(pixels, segment_threshold, min_segment_size)
    if not segments:
        segments = [np.array([[0, 0], [segmentation_image_size - 1, segmentation_image_size - 1]])]
    if limit_segments:
        segments = sorted(segments, key=len, reverse=True)[:limit_segments]
    h, w = orig.shape
    sy = h / segmentation_image_size
    sx = w / segmentation_image_size
    hashes = []
    for seg in segments:
        y0 = int(seg[:, 0].min() * sy)
        x0 = int(seg[:, 1].min() * sx)
        y1 = max(int((seg[:, 0].max() + 1) * sy), y0 + 2)
        x1 = max(int((seg[:, 1].max() + 1) * sx), x0 + 2)
        hashes.append(hash_func(orig[y0 : min(y1, h), x0 : min(x1, w)]))
    return hashes


def multihash_diff(
    h1: list[int], h2: list[int], bit_error_rate: float = 0.25, bits: int = 64
) -> tuple[int, int]:
    """(matching segment count, summed hamming over matches) — the
    reference's ImageMultiHash.hash_diff (:386-411)."""
    cutoff = bits * bit_error_rate
    matches = 0
    total = 0
    for a in h1:
        best = min(hamming64(a, b) for b in h2) if h2 else bits
        if best <= cutoff:
            matches += 1
            total += best
    return matches, total


def multihash_matches(
    h1: list[int], h2: list[int], region_cutoff: int = 1, bit_error_rate: float = 0.25
) -> bool:
    """True when >= region_cutoff segments match (reference :413-423)."""
    return multihash_diff(h1, h2, bit_error_rate)[0] >= region_cutoff


def hash_batch(
    grays: list[np.ndarray], rgbs: list[np.ndarray] | None = None
) -> dict[str, np.ndarray]:
    """All hashes for a batch of decoded images → int64 columns (64-bit
    hashes stored bit-cast; colorhash is 42 bits at binbits=3)."""
    n = len(grays)
    out = {
        "ahash": np.empty(n, dtype=np.uint64),
        "phash": np.empty(n, dtype=np.uint64),
        "dhash": np.empty(n, dtype=np.uint64),
        "whash": np.empty(n, dtype=np.uint64),
    }
    for i, g in enumerate(grays):
        out["ahash"][i] = average_hash(g)
        out["phash"][i] = phash(g)
        out["dhash"][i] = dhash(g)
        out["whash"][i] = whash(g)
    if rgbs is not None:
        ch = np.empty(n, dtype=np.uint64)
        for i, im in enumerate(rgbs):
            ch[i] = colorhash(im)
        out["colorhash"] = ch
    return {k: v.view(np.int64) for k, v in out.items()}
