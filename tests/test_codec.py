"""Posting codec: varint/delta/positions round-trips incl. the segmented
batch-level encoders whose blobs must equal the per-term encoders' output."""

import numpy as np
import pytest

from bleve_ray.index import codec


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varint_roundtrip(seed):
    rng = np.random.default_rng(seed)
    for n in (0, 1, 7, 1000):
        v = rng.integers(0, 1 << 45, size=n).astype(np.uint64)
        assert (codec.varint_decode(codec.varint_encode(v)) == v).all()


def test_varint_boundaries():
    v = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**35, 2**63 - 1],
        dtype=np.uint64,
    )
    assert (codec.varint_decode(codec.varint_encode(v)) == v).all()


def test_delta_varint_roundtrip():
    rng = np.random.default_rng(3)
    d = np.sort(rng.integers(0, 1 << 40, size=500))
    assert (codec.delta_varint_decode(codec.delta_varint_encode(d)) == d).all()


def test_positions_roundtrip():
    rng = np.random.default_rng(4)
    tfs = rng.integers(1, 30, size=20)
    pos = np.concatenate(
        [np.sort(rng.choice(np.arange(1, 500), size=t, replace=False)) for t in tfs]
    )
    dec = codec.positions_decode(codec.positions_encode(pos, tfs), tfs)
    assert (dec == pos).all()


def test_segmented_encode_matches_per_term():
    """encode_with_restarts blob slices == per-term delta_varint_encode."""
    rng = np.random.default_rng(5)
    seg_lens = rng.integers(1, 20, size=50)
    offsets = np.concatenate(([0], np.cumsum(seg_lens)))
    values = np.concatenate(
        [np.sort(rng.integers(0, 1 << 38, size=n)) for n in seg_lens]
    )
    buf, boffs = codec.encode_with_restarts(values, offsets[:-1])
    for i in range(len(seg_lens)):
        lo, hi = offsets[i], offsets[i + 1]
        blob = buf[boffs[lo] : boffs[hi]]
        assert blob == codec.delta_varint_encode(values[lo:hi])
        assert (codec.delta_varint_decode(blob) == values[lo:hi]).all()


def test_plain_varint_with_offsets():
    rng = np.random.default_rng(6)
    v = rng.integers(0, 1 << 30, size=200).astype(np.uint64)
    buf, offs = codec.plain_varint_with_offsets(v)
    assert buf == codec.varint_encode(v)
    # any slice decodes independently
    assert (codec.varint_decode(buf[offs[10] : offs[50]]) == v[10:50]).all()


def test_blob_concat_safety():
    """tfs (plain varint) and positions (per-doc restart) blobs concat raw;
    docnum delta blobs do NOT (documented merge rule)."""
    a = np.array([3, 1, 7], dtype=np.uint64)
    b = np.array([2, 9], dtype=np.uint64)
    joined = codec.varint_encode(a) + codec.varint_encode(b)
    assert (codec.varint_decode(joined) == np.concatenate([a, b])).all()


# --- property-based hardening (hypothesis) ---------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 62) - 1),
        min_size=0,
        max_size=200,
    )
)
def test_varint_roundtrip_property(values):
    arr = np.asarray(values, dtype=np.int64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40)),
        min_size=1,
        max_size=100,
    )
)
def test_delta_varint_roundtrip_property(deltas):
    # delta codec operates on ASCENDING sequences
    arr = np.cumsum(np.asarray(deltas, dtype=np.int64))
    assert np.array_equal(
        codec.delta_varint_decode(codec.delta_varint_encode(arr)), arr
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=0.0,
            max_value=1.0,
            allow_nan=False,
            width=32,
        ),
        min_size=0,
        max_size=64,
    )
)
def test_norms_roundtrip_property(norms):
    arr = np.asarray(norms, dtype=np.float32)
    assert np.array_equal(codec.norms_decode(codec.norms_encode(arr)), arr)
