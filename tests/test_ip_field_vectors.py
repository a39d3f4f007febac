"""IP-field CIDR query vectors (test/ip_field_test.go) and base64
vector decode round-trip (document/field_vector_base64_test.go
TestDecodeVector)."""

import base64
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.collector import _knn_vector


def _ip_index(tmp, ips):
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [f"id{i + 1}" for i in range(len(ips))],
            "ip": ips,
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={"ip": FieldConfig(field_type="ip", positions=False)},
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6,
        ),
    )
    return Index.open(out)


def _cidr(idx, req):
    r = idx.search({"query": {"cidr": req, "field": "ip"}, "size": 10})
    return sorted(h.id for h in r.hits)


def test_ipv4_cidr_query(ray_session, tmp_path_factory):
    idx = _ip_index(
        tmp_path_factory.mktemp("ip4"), ["192.168.1.21"]
    )
    assert _cidr(idx, "192.168.1.0/24") == ["id1"]


def test_ipv6_cidr_query(ray_session, tmp_path_factory):
    idx = _ip_index(
        tmp_path_factory.mktemp("ip6"),
        ["2a00:23c8:7283:ff00:1fa8:2af6:9dec:6b19"],
    )
    assert _cidr(idx, "2a00:23c8:7283:ff00:1fa8:0:0:0/80") == ["id1"]


def test_multi_ipv4_cidr_query(ray_session, tmp_path_factory):
    # network and broadcast addresses are both inside the /24
    idx = _ip_index(
        tmp_path_factory.mktemp("ipm"),
        ["192.168.1.0", "192.168.1.255", "192.168.2.22"],
    )
    assert _cidr(idx, "192.168.1.0/24") == ["id1", "id2"]


def test_cidr_query_non_divisible_by_8(ray_session, tmp_path_factory):
    # /30 covers 192.168.1.0-3 only
    idx = _ip_index(
        tmp_path_factory.mktemp("ip30"),
        ["192.168.1.1", "192.168.1.2", "192.168.2.5", "192.168.2.6"],
    )
    assert _cidr(idx, "192.168.1.0/30") == ["id1", "id2"]


def test_decode_base64_vector_roundtrip():
    rng = np.random.default_rng(42)
    vec = rng.random(2048, dtype=np.float32)
    raw = struct.pack(f"<{len(vec)}f", *vec)
    enc = base64.standard_b64encode(raw).decode("ascii")
    got = _knn_vector({"vector_base64": enc})
    got = np.asarray(got, dtype=np.float32)
    assert got.shape == (2048,)
    assert np.array_equal(got, vec)


def test_decode_base64_vector_invalid():
    with pytest.raises(ValueError):
        _knn_vector({})
