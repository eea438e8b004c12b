"""Property-based codec gates (hypothesis): the lossless codecs (PNG, GIF,
BMP, RAW1, WAV-PCM16) must roundtrip EXACTLY on arbitrary inputs; the lossy
one (baseline JPEG) must stay within its quantization-derived error bound.
These complement the hand-built vectors in test_{png,jpeg,gif}.py with
adversarial shapes (1-pixel edges, extreme values, odd strides)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _img(draw, max_side=40, channels=3):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@st.composite
def gray_images(draw):
    return _img(draw, channels=1)


@st.composite
def rgb_images(draw):
    return _img(draw, channels=3)


@st.composite
def palette_images(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    n_colors = draw(st.integers(1, 256))
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return palette[rng.integers(0, n_colors, (h, w))]


@settings(max_examples=25, deadline=None)
@given(img=rgb_images(), filter_type=st.integers(0, 4))
def test_png_roundtrip_property(img, filter_type):
    from imagededupx_ray.functions.png import decode_png, encode_png

    assert (decode_png(encode_png(img, filter_type=filter_type)) == img).all()


@settings(max_examples=25, deadline=None)
@given(img=palette_images(), interlace=st.booleans())
def test_gif_roundtrip_property(img, interlace):
    from imagededupx_ray.functions.gif import decode_gif, encode_gif

    assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()


@settings(max_examples=25, deadline=None)
@given(img=rgb_images())
def test_bmp_roundtrip_property(img):
    from imagededupx_ray.functions.gif import decode_bmp, encode_bmp

    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(img=gray_images())
def test_raw1_roundtrip_property(img):
    from imagededupx_ray.stages.multimodal import decode_raw_image, encode_raw_image

    assert (decode_raw_image(encode_raw_image(img)) == img).all()


@settings(max_examples=15, deadline=None)
@given(img=gray_images(), quality=st.sampled_from([75, 90, 95]))
def test_jpeg_error_bound_property(img, quality):
    """Even on pure noise (worst case for DCT quantization) the decode must
    stay within the coarse bound implied by the quality's quantization
    steps, preserve shape exactly, and never wrap around uint8."""
    from imagededupx_ray.functions.jpeg import decode_jpeg, encode_jpeg

    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() <= 40, err.mean()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4000),
    seed=st.integers(0, 2**31 - 1),
    rate=st.sampled_from([8000, 16000, 44100]),
    stereo=st.booleans(),
)
def test_wav_roundtrip_property(n, seed, rate, stereo):
    from imagededupx_ray.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    x = rng.uniform(-1, 1, shape)
    y, r = decode_wav(encode_wav(x, rate))
    assert r == rate and y.shape == x.shape
    # encode scales by 32767, decode divides by 32768 (the common PCM16
    # convention): worst case = rounding half-step + one scale-gap step
    assert np.abs(y - x).max() <= 0.5 / 32767 + 1.0 / 32768 + 1e-9
