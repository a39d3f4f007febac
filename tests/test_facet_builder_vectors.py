"""Terms-facet builder filter vectors
(search/facet/facet_builder_terms_test.go):

- TestTermsFacetPrefix: prefix filter keeps matching terms; total counts
  EVERY visited value, other = total - kept.
- TestTermsFacetRegex: unanchored Go regexp.Match semantics.
- TestTermsFacetPrefixAndRegex: both filters compose; duplicate terms
  accumulate counts.
- TestTermsFacetNoFilter: top-N trim, other counts the trimmed tail.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


def _facet_index(tmp, values):
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [str(i) for i in range(len(values))],
            "tag": values,
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={
                "tag": FieldConfig(analyzer="keyword", positions=False),
            },
            docvalue_fields=["tag"],
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=6,
        ),
    )
    return Index.open(out)


def _facet(idx, request):
    r = idx.search({
        "query": {"match_all": {}},
        "size": 0,
        "facets": {"f": request},
    })
    return r.facets["f"]


def test_terms_facet_prefix(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("facet_prefix")
    idx = _facet_index(tmp, [
        "prod-server", "prod-database", "dev-server",
        "dev-database", "test-server", "prod-cache",
    ])
    f = _facet(idx, {"field": "tag", "size": 10, "term_prefix": "prod-"})
    got = {t["term"]: t["count"] for t in f["terms"]}
    assert got == {"prod-server": 1, "prod-database": 1, "prod-cache": 1}
    assert f["total"] == 6  # total counts every visited value
    assert f["other"] == 3  # the non-matching terms


def test_terms_facet_regex(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("facet_regex")
    idx = _facet_index(tmp, [
        "ABC-1234", "XYZ-5678", "ABC-999", "ABCD-1234",
        "ABC-ABCD", "DEF-0000",
    ])
    f = _facet(
        idx,
        {"field": "tag", "size": 10, "term_pattern": r"^[A-Z]{3}-\d{4}$"},
    )
    got = {t["term"]: t["count"] for t in f["terms"]}
    assert got == {"ABC-1234": 1, "XYZ-5678": 1, "DEF-0000": 1}
    assert f["total"] == 6
    assert f["other"] == 3


def test_terms_facet_prefix_and_regex(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("facet_both")
    idx = _facet_index(tmp, [
        "env:prod", "env:staging", "env:dev", "env:test",
        "type:server", "env:prod", "env:staging",
    ])
    f = _facet(
        idx,
        {
            "field": "tag", "size": 10,
            "term_prefix": "env:",
            "term_pattern": r"^env:(prod|staging)$",
        },
    )
    got = {t["term"]: t["count"] for t in f["terms"]}
    assert got == {"env:prod": 2, "env:staging": 2}
    assert f["total"] == 7
    assert f["other"] == 3  # env:dev, env:test, type:server


def test_terms_facet_no_filter_trim(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("facet_trim")
    idx = _facet_index(tmp, ["apple", "banana", "cherry", "apple"])
    f = _facet(idx, {"field": "tag", "size": 2})
    assert f["terms"][0] == {"term": "apple", "count": 2}
    assert len(f["terms"]) == 2
    assert f["total"] == 4
    assert f["other"] == 1  # the trimmed third term
