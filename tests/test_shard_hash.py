"""Term->shard router: vector/scalar parity, legacy sha1 dispatch, and
old-manifest (pre-poly64) read compatibility."""

import numpy as np
import pyarrow as pa
import pytest

from bleve_ray.index import shard_hash as sh
from bleve_ray.index.build import IndexOptions, shard_of_terms


TERMS = [
    "",
    "a",
    "hello",
    "ħęłľõ",
    "日本語テスト",
    "x" * 3000,
    "the",
    "\x1fweird",
    "term\x00nul",
    "zz",
]


@pytest.mark.parametrize("field", ["content", "_id", "_all", "tïtle"])
@pytest.mark.parametrize("num_shards", [1, 8, 13])
def test_vector_matches_scalar(field, num_shards):
    arr = pa.array(TERMS, type=pa.string())
    vec = sh.poly_shards(field, arr, num_shards)
    assert vec.dtype == np.int32
    assert vec.tolist() == [
        sh.poly_shard(field, t, num_shards) for t in TERMS
    ]


def test_vector_handles_large_chunked_sliced():
    want = [sh.poly_shard("f", t, 16) for t in TERMS]
    chunked = pa.chunked_array(
        [
            pa.array(TERMS[:4], type=pa.large_string()),
            pa.array(TERMS[4:], type=pa.large_string()),
        ]
    )
    assert sh.poly_shards("f", chunked, 16).tolist() == want
    sliced = pa.array(["pad1", "pad2"] + TERMS).slice(2)
    assert sh.poly_shards("f", sliced, 16).tolist() == want
    assert sh.poly_shards("f", pa.array([], type=pa.string()), 16).tolist() == []


def test_distribution_is_balanced():
    arr = pa.array(["t%06d" % i for i in range(100_000)])
    counts = np.bincount(sh.poly_shards("content", arr, 8), minlength=8)
    assert counts.min() > 0.9 * counts.max()


def test_field_changes_routing():
    arr = pa.array(["alpha", "beta", "gamma", "delta"] * 64)
    a = sh.poly_shards("f1", arr, 1 << 16)
    b = sh.poly_shards("f2", arr, 1 << 16)
    assert (a != b).any()


def test_sha1_method_matches_legacy_digest():
    import hashlib

    arr = pa.array(TERMS)
    got = shard_of_terms("content", arr, 8, method="sha1")
    want = [
        int.from_bytes(
            hashlib.sha1(f"content\x1f{t}".encode()).digest()[:4], "little"
        )
        % 8
        for t in TERMS
    ]
    assert got.tolist() == want
    assert [
        sh.shard_of_term("content", t, 8, "sha1") for t in TERMS
    ] == want


def test_build_default_routes_poly64():
    arr = pa.array(TERMS)
    got = shard_of_terms("content", arr, 8)
    assert got.tolist() == sh.poly_shards("content", arr, 8).tolist()


def test_options_roundtrip_and_legacy_default():
    # new builds record poly64; manifests that predate the key read as sha1
    d = IndexOptions().to_dict()
    assert d["shard_hash"] == "poly64"
    assert IndexOptions.from_dict(d).shard_hash == "poly64"
    d.pop("shard_hash")
    assert IndexOptions.from_dict(d).shard_hash == "sha1"
