"""Property-based codec tests: encode→decode is the identity for every
representable image/signal, and the resize index map matches the spec for
arbitrary geometry.  Pure-Python (no Spark session), so hypothesis can
run hundreds of cases cheaply.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tidb2dw_spark.functions import codecs as C


def _img(w, h, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=60, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_property(w, h, seed):
    arr = _img(w, h, seed)
    assert (C.decode_pnm(C.encode_ppm(arr)) == arr).all()


@settings(max_examples=60, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(w, h, seed):
    """Every width exercises a different row-padding remainder (w*3 mod 4
    cycles through all four)."""
    arr = _img(w, h, seed)
    assert (C.decode_bmp(C.encode_bmp(arr)) == arr).all()


@settings(max_examples=60, deadline=None)
@given(w=dims, h=dims, tw=dims, th=dims, seed=st.integers(0, 2**32 - 1))
def test_resize_index_map_property(w, h, tw, th, seed):
    arr = _img(w, h, seed)
    out = C.resize_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    for y in (0, th // 2, th - 1):
        for x in (0, tw // 2, tw - 1):
            assert (out[y, x] == arr[(y * h) // th, (x * w) // tw]).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(0, 500),
    channels=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, channels, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, channels)).astype(np.int16)
    got_rate, got = C.decode_wav(C.encode_wav(samples, rate))
    assert got_rate == rate
    assert got.shape == (n, channels)
    assert (got == samples).all()


@settings(max_examples=60, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(w, h, seed):
    arr = _img(w, h, seed)
    assert (C.decode_png(C.encode_png(arr)) == arr).all()
