"""Search deadline semantics (index_alias_impl_test.go
TestMultiSearchTimeout / TestMultiSearchTimeoutPartial, search_test.go
TestSearchTimeout): an expired deadline errors up front on a single
index; at alias level, members past the deadline record
"context deadline exceeded" in the status and finished members still
contribute — partial results."""

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.distributed import IndexAlias


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("toidx")
    src = str(tmp / "d.parquet")
    pq.write_table(
        pa.table({"doc_id": ["a", "b"], "text": ["hello", "hello world"]}),
        src,
    )
    out = str(tmp / "idx")
    build_index([src], out, IndexOptions(
        fields={"text": FieldConfig(positions=False)},
        doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6))
    return Index.open(out)


class _SlowMember:
    """Duck-typed alias member that burns wall clock before answering."""

    name = "slow"

    def __init__(self, inner, delay_s):
        self.inner = inner
        self.delay_s = delay_s

    def search(self, request):
        time.sleep(self.delay_s)
        return self.inner.search(request)


def test_expired_deadline_errors_single_index(small_index):
    with pytest.raises(TimeoutError):
        small_index.search({"query": {"term": "hello", "field": "text"},
                            "size": 5, "timeout_ms": 0})


def test_generous_deadline_finishes(small_index):
    r = small_index.search({"query": {"term": "hello", "field": "text"},
                            "size": 5, "timeout_ms": 60_000})
    assert r.total_hits == 2


def test_alias_timeout_partial_results(small_index):
    alias = IndexAlias([_SlowMember(small_index, 0.15), small_index])
    r = alias.search({"query": {"term": "hello", "field": "text"},
                      "size": 5, "timeout_ms": 100})
    # the slow member consumed the whole budget (its in-flight search is
    # allowed to finish, like a scatter already dispatched); the SECOND
    # member is then skipped with a deadline error -- partial results,
    # not a failed search
    assert r.status["total"] == 2
    assert r.status["successful"] == 1
    assert r.status["failed"] == 1
    assert "context deadline exceeded" in str(r.status["errors"])
    assert r.total_hits == 2  # the completed member's hits survive


def test_alias_no_timeout_all_members(small_index):
    alias = IndexAlias([_SlowMember(small_index, 0.01), small_index])
    r = alias.search({"query": {"term": "hello", "field": "text"},
                      "size": 5})
    assert r.status["successful"] == 2
    assert r.status["failed"] == 0
