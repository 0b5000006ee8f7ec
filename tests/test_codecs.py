import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cer_for_mti_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.empty(0, dtype=np.int64)) == b""
    assert delta_decode(b"").size == 0


def test_boundaries():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**62], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=500))
def test_delta_roundtrip(xs):
    ids = np.array(sorted(xs), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_compression_ratio_dense():
    rng = np.random.default_rng(42)
    ids = np.cumsum(rng.integers(1, 30, size=100_000)).astype(np.int64)
    enc = delta_encode(ids)
    assert len(enc) < 0.2 * 8 * len(ids)  # >5x smaller than raw int64
