"""TestAnalyzerInheritance (search_test.go) static-tree cases: a leaf
field with no analyzer inherits the closest enclosing mapping's
default_analyzer, then the index default.  Proven e2e: "San Francisco"
only term-matches whole under the keyword analyzer."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import (
    DocumentMapping,
    FieldConfig,
    build_index,
    options_from_mapping,
)
from bleve_ray.search import Index


def _leaf():  # field with NO analyzer set -> inherits
    return FieldConfig(analyzer="", positions=False)


def _build(tmp, cols, root, **kw):
    src = str(tmp / "d.parquet")
    pq.write_table(pa.table(cols), src)
    d = str(tmp / "idx")
    opts = options_from_mapping(
        root, doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6, **kw
    )
    build_index([src], d, opts)
    return Index.open(d)


def _hits(idx, field, term):
    r = idx.search({"query": {"term": term, "field": field}, "size": 5})
    return [h.id for h in r.hits]


def test_inherit_index_default_analyzer(ray_session, tmp_path):
    """index default keyword, no mapping-level default -> leaf keyword."""
    root = DocumentMapping(fields={"city": _leaf()})
    idx = _build(tmp_path, {"doc_id": ["d"], "city": ["San Francisco"]},
                 root, default_analyzer="keyword")
    assert _hits(idx, "city", "San Francisco") == ["d"]


def test_mapping_default_overrides_index_default(ray_session, tmp_path):
    """index standard, default-mapping keyword -> leaf keyword."""
    root = DocumentMapping(default_analyzer="keyword",
                           fields={"city": _leaf()})
    idx = _build(tmp_path, {"doc_id": ["d"], "city": ["San Francisco"]},
                 root, default_analyzer="standard")
    assert _hits(idx, "city", "San Francisco") == ["d"]
    # standard would have split the term; whole-string term proves keyword
    assert _hits(idx, "city", "francisco") == []


def test_nested_child_inherits_mapping_default(ray_session, tmp_path):
    root = DocumentMapping(
        default_analyzer="keyword",
        properties={"address": DocumentMapping(fields={"city": _leaf()})},
    )
    idx = _build(
        tmp_path,
        {"doc_id": ["d"], "address": [{"city": "San Francisco"}]},
        root, default_analyzer="standard",
    )
    assert _hits(idx, "address.city", "San Francisco") == ["d"]


def test_deep_child_inherits_first_ancestor_default(ray_session, tmp_path):
    root = DocumentMapping(properties={
        "address": DocumentMapping(
            default_analyzer="keyword",
            properties={"state": DocumentMapping(fields={"city": _leaf()})},
        ),
    })
    idx = _build(
        tmp_path,
        {"doc_id": ["d"],
         "address": [{"state": {"city": "San Francisco"}}]},
        root, default_analyzer="standard",
    )
    assert _hits(idx, "address.state.city", "San Francisco") == ["d"]


def test_explicit_analyzer_wins_over_defaults(ray_session, tmp_path):
    root = DocumentMapping(
        default_analyzer="keyword",
        fields={"city": FieldConfig(analyzer="standard", positions=False)},
    )
    idx = _build(tmp_path, {"doc_id": ["d"], "city": ["San Francisco"]},
                 root)
    assert _hits(idx, "city", "francisco") == ["d"]
    assert _hits(idx, "city", "San Francisco") == []
