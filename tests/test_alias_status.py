"""Alias scatter status + partial-result semantics
(index_alias_impl_test.go: TestMultiSearchNoError, TestMultiSearchSomeError,
TestMultiSearchAllError, TestIndexAliasEmpty): an erroring member is
recorded in SearchStatus.Errors while the others still contribute;
all-failed still returns a (empty) result; searching an empty alias
errors."""

import pytest

from bleve_ray.search.collector import Hit, SearchResult
from bleve_ray.search.distributed import IndexAlias


class _StubIndex:
    def __init__(self, name, hits=None, err=None):
        self.name = name
        self._hits = hits or []
        self._err = err

    def search(self, request):
        if self._err is not None:
            raise RuntimeError(self._err)
        return SearchResult(
            total_hits=len(self._hits),
            max_score=max((h.score for h in self._hits), default=0.0),
            hits=list(self._hits),
            took_ms=1.0,
        )


def _req():
    return {"query": {"term": "test", "field": "content"}, "size": 10}


def test_multi_search_no_error():
    a = IndexAlias([
        _StubIndex("ei1", [Hit(id="a", score=1.0, docnum=0)]),
        _StubIndex("ei2", [Hit(id="b", score=2.0, docnum=1)]),
    ])
    res = a.search(_req())
    assert res.status == {
        "total": 2, "successful": 2, "failed": 0, "errors": {},
    }
    assert [h.id for h in res.hits] == ["b", "a"]
    assert res.total_hits == 2


def test_multi_search_some_error():
    a = IndexAlias([
        _StubIndex("ei1", [Hit(id="a", score=1.0, docnum=0)]),
        _StubIndex("ei2", err="deliberate error"),
    ])
    res = a.search(_req())
    assert res.status["total"] == 2
    assert res.status["failed"] == 1
    assert res.status["successful"] == 1
    assert res.status["errors"] == {"ei2": "deliberate error"}
    assert [h.id for h in res.hits] == ["a"]
    assert res.total_hits == 1


def test_multi_search_all_error():
    a = IndexAlias([
        _StubIndex("ei1", err="deliberate error"),
        _StubIndex("ei2", err="deliberate error"),
    ])
    res = a.search(_req())
    assert res.status["total"] == 2
    assert res.status["failed"] == 2
    assert res.status["successful"] == 0
    assert res.status["errors"] == {
        "ei1": "deliberate error", "ei2": "deliberate error",
    }
    assert res.hits == [] and res.total_hits == 0


def test_nested_alias_status_merges():
    inner = IndexAlias([
        _StubIndex("ei1", [Hit(id="a", score=1.0, docnum=0)]),
        _StubIndex("ei2", err="deliberate error"),
    ])
    outer = IndexAlias([
        inner,
        _StubIndex("ei3", [Hit(id="c", score=3.0, docnum=2)]),
    ])
    res = outer.search(_req())
    assert res.status["total"] == 3
    assert res.status["successful"] == 2
    assert res.status["failed"] == 1
    assert res.status["errors"] == {"ei2": "deliberate error"}
    assert [h.id for h in res.hits] == ["c", "a"]


def test_empty_alias_search_errors():
    a = IndexAlias()
    with pytest.raises(RuntimeError, match="empty alias"):
        a.search(_req())
    a.add(_StubIndex("ei1", [Hit(id="a", score=1.0, docnum=0)]))
    assert a.search(_req()).total_hits == 1


def test_remove_member():
    m1 = _StubIndex("ei1", [Hit(id="a", score=1.0, docnum=0)])
    m2 = _StubIndex("ei2", [Hit(id="b", score=2.0, docnum=1)])
    a = IndexAlias([m1, m2])
    a.remove(m1)
    res = a.search(_req())
    assert [h.id for h in res.hits] == ["b"]
    assert res.status["total"] == 1
