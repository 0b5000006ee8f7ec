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


@settings(max_examples=30, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2**30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=7),
)
def test_merge_encoded_runs_roundtrip(xs, n_buckets):
    """Splitting a posting into doc-id-range runs, encoding each, and
    byte-merging must reproduce the exact single-run encoding's decode."""
    from cer_for_mti_spark.operators.index_build import (
        _encode_arrays,
        merge_encoded_runs,
    )

    ids = np.array(sorted(xs), dtype=np.int64)
    tfs = (ids % 7 + 1).astype(np.uint64)
    dls = (ids % 50 + 10).astype(np.uint64)
    width = max(1, (int(ids.max()) + n_buckets) // n_buckets)
    runs = []
    for b in np.unique(ids // width):
        m = (ids // width) == b
        d, t, dl, bl, bm, mi = _encode_arrays(ids[m], tfs[m], dls[m], 25.0)
        runs.append({
            "first_id": int(ids[m][0]), "last_id": int(ids[m][-1]),
            "df": int(m.sum()), "doc_ids": d, "tfs": t, "doclens": dl,
            "block_last": bl, "block_max": bm, "max_impact": mi,
        })
    df, d, t, dl, bl, bm, mi = merge_encoded_runs(runs)
    assert df == len(ids)
    assert np.array_equal(delta_decode(d), ids)
    assert np.array_equal(varint_decode(t), tfs)
    assert np.array_equal(varint_decode(dl), dls)
    ed, et, edl, ebl, ebm, emi = _encode_arrays(ids, tfs, dls, 25.0)
    assert abs(mi - emi) < 1e-12
    assert bl[-1] == ids[-1]
    # block maxes remain valid upper bounds for their blocks
    assert max(bm) <= emi + 1e-12


def test_compression_ratio_dense():
    rng = np.random.default_rng(42)
    ids = np.cumsum(rng.integers(1, 30, size=100_000)).astype(np.int64)
    enc = delta_encode(ids)
    assert len(enc) < 0.2 * 8 * len(ids)  # >5x smaller than raw int64
