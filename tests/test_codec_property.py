"""Property tests for the pure-numpy codecs (imagecodec.py, audiocodec.py):
random images/signals round-trip bit-exactly (PNG) or within quantization
(PCM16), and the PNG decoder inverts every filter type on random data via
the spec-reference forward filter from test_imagecodec."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdump_spark.operators.audiocodec import (
    decode_wav,
    encode_wav,
    resample_linear,
)
from xdump_spark.operators.imagecodec import decode_png, encode_png, resize_nearest

SETTINGS = dict(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@st.composite
def images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    c = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)


@given(images())
@settings(**SETTINGS)
def test_png_roundtrip_property(img):
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(images(), st.lists(st.integers(0, 4), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_png_unfilter_property_vs_spec(img, ftypes):
    from tests.test_imagecodec import _png_with_filters

    if img.shape[2] == 2:  # spec helper maps channels→color type directly
        img = img[:, :, :1]
    blob = _png_with_filters(np.ascontiguousarray(img), ftypes)
    assert np.array_equal(decode_png(blob), img)


@given(images(), st.integers(1, 16), st.integers(1, 16))
@settings(**SETTINGS)
def test_resize_shape_and_value_membership(img, w, h):
    out = resize_nearest(img, w, h)
    assert out.shape == (h, w, img.shape[2])
    # nearest-neighbor only ever copies source pixels
    src_vals = {tuple(px) for px in img.reshape(-1, img.shape[2])}
    assert all(tuple(px) in src_vals for px in out.reshape(-1, out.shape[2]))


@st.composite
def signals(draw):
    n = draw(st.integers(1, 400))
    ch = draw(st.sampled_from([1, 2]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.99, 0.99, size=(n, ch))


@given(signals(), st.sampled_from([8000, 16000, 44100]))
@settings(**SETTINGS)
def test_wav_roundtrip_property(sig, rate):
    got, r2 = decode_wav(encode_wav(sig, rate))
    assert r2 == rate and got.shape == sig.shape
    # decode(encode(x)) = round(32767x)/32768 → |err| ≤ (0.5 + |x|)/32768
    assert np.abs(got - sig).max() <= 1.5 / 32768 + 1e-12


@given(signals(), st.sampled_from([4000, 8000, 12000]), st.sampled_from([4000, 8000, 16000]))
@settings(**SETTINGS)
def test_resample_length_and_bounds(sig, src, dst):
    out = resample_linear(sig, src, dst)
    assert out.shape[0] == max(1, int(round(sig.shape[0] * dst / src)))
    # linear interpolation never exceeds the source range
    assert out.min() >= sig.min() - 1e-12 and out.max() <= sig.max() + 1e-12
