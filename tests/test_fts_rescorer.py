"""FTS-only RRF/RSF rescoring (rescorer.go + rescorer_test.go
TestFTSRRF*/TestFTSRSF*): a search request with score=rrf|rsf but NO
knn clauses rescores the FTS ranking by rank fusion -- directly on an
index, through aliases (fused once over the global ranking), and with
pagination stitching consistent with the unpaged ranking."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.distributed import IndexAlias

DOCS = [
    ("dark slate blue", "deep and rich color with dark undertones",
     "blue shades"),
    ("blue", "primary color that is bright and vibrant",
     "primary colors"),
    ("navy", "dark blue color often used in uniforms", "dark colors"),
    ("steel blue", "metallic blue with gray undertones",
     "metallic shades"),
    ("light blue", "pale and soft blue color with light appearance",
     "light colors"),
    ("deep sky blue", "bright blue reminiscent of clear skies",
     "sky colors"),
    ("royal blue", "rich and regal blue color fit for royalty",
     "rich colors"),
    ("powder blue", "very light blue with powder-like softness",
     "light colors"),
    ("corn flower blue", "medium blue color named after the flower",
     "floral colors"),
    ("alice blue", "very pale blue with light and airy quality",
     "light colors"),
    ("blue violet", "purple-blue color with violet undertones",
     "purple shades"),
    ("sky blue", "bright blue color of a clear day sky", "sky colors"),
    ("indigo", "deep purple-blue color with dark intensity",
     "dark colors"),
    ("midnight blue", "very dark blue like the night sky",
     "dark colors"),
    ("dark blue", "deep blue color with dark characteristics",
     "dark colors"),
    ("medium slate blue", "medium intensity blue with slate properties",
     "blue shades"),
    ("cadet blue", "grayish blue color often used in uniforms",
     "metallic shades"),
    ("light steel blue", "light metallic blue with steel-like appearance",
     "light colors"),
    ("dodger blue", "bright medium blue with vibrant intensity",
     "bright colors"),
    ("medium blue", "standard blue with medium intensity and saturation",
     "blue shades"),
    ("slate blue", "blue-gray color with slate-like properties",
     "blue shades"),
    ("light sky blue", "light version of sky blue with airy quality",
     "light colors"),
]


def _write(tmpdir, rows):
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "color": pa.array([r[0] for r in rows]),
            "description": pa.array([r[1] for r in rows]),
            "category": pa.array([r[2] for r in rows]),
        }),
        os.path.join(tmpdir, "docs.parquet"),
    )
    return [os.path.join(tmpdir, "docs.parquet")]


def _build(files, idxd):
    build_index(
        files,
        idxd,
        IndexOptions(
            fields={
                "color": FieldConfig(analyzer="en"),
                "description": FieldConfig(analyzer="en"),
                "category": FieldConfig(analyzer="en"),
            },
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=16,
        ),
    )
    return Index.open(idxd)


@pytest.fixture(scope="module")
def fts_indexes(ray_session, tmp_path_factory):
    single = _build(
        _write(str(tmp_path_factory.mktemp("ftssrc")), DOCS),
        str(tmp_path_factory.mktemp("ftsidx")),
    )
    half_a = _build(
        _write(str(tmp_path_factory.mktemp("ftsa")), DOCS[::2]),
        str(tmp_path_factory.mktemp("ftsidxa")),
    )
    half_b = _build(
        _write(str(tmp_path_factory.mktemp("ftsb")), DOCS[1::2]),
        str(tmp_path_factory.mktemp("ftsidxb")),
    )
    return single, half_a, half_b


def _req(score, from_=0, size=10):
    return {
        "query": {"disjuncts": [
            {"match_phrase": "dark", "field": "color"},
            {"match_phrase": "light", "field": "description"},
            {"match_phrase": "blue", "field": "category"},
        ]},
        "score": score,
        "params": {"score_rank_constant": 1, "score_window_size": 10},
        "from": from_,
        "size": size,
    }


EXPECTED_TOP = {
    "dark slate blue", "light blue", "dark blue", "light steel blue",
    "medium slate blue",
}


@pytest.mark.parametrize("score", ["rrf", "rsf"])
def test_fts_rescoring_direct(fts_indexes, score):
    single, _, _ = fts_indexes
    res = single.search(_req(score))
    assert res.hits, "expected rescored results"
    scores = [h.score for h in res.hits]
    assert scores == sorted(scores, reverse=True)
    found = {h.id for h in res.hits} & EXPECTED_TOP
    assert len(found) >= 3, found
    if score == "rrf":
        # top hit's fused score is bounded by sum of per-source maxima
        # 1/(1+1) per source = 1.5 with rank_constant 1, 3 sources
        assert res.hits[0].score <= 1.5 + 1e-9


@pytest.mark.parametrize("score", ["rrf", "rsf"])
def test_fts_rescoring_alias_single_matches_direct(fts_indexes, score):
    """Same MATCH SET and monotone fused ranking through the alias.
    Exact per-doc fused scores can differ from the direct path: rank
    fusion with a small rank constant ties many raw-FTS scores, and the
    pre-fusion tie order is docnum-based directly vs id-based through
    the alias -- the reference's alias tests verify loosely for the
    same reason (rescorer_test.go verifyFTSRRFResults)."""
    single, _, _ = fts_indexes
    alias = IndexAlias([single])
    direct = single.search(_req(score))
    via_alias = alias.search(_req(score))
    assert {h.id for h in via_alias.hits} == {h.id for h in direct.hits}
    scores = [h.score for h in via_alias.hits]
    assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("score", ["rrf", "rsf"])
def test_fts_rescoring_alias_two_and_nested(fts_indexes, score):
    _, half_a, half_b = fts_indexes
    two = IndexAlias([half_a, half_b])
    res = two.search(_req(score))
    scores = [h.score for h in res.hits]
    assert scores == sorted(scores, reverse=True)
    assert len({h.id for h in res.hits} & EXPECTED_TOP) >= 3
    nested = IndexAlias([IndexAlias([half_a]), IndexAlias([half_b])])
    res_n = nested.search(_req(score))
    assert [h.id for h in res_n.hits] == [h.id for h in res.hits]


@pytest.mark.parametrize("score", ["rrf", "rsf"])
def test_fts_rescoring_pagination_stitches(fts_indexes, score):
    single, half_a, half_b = fts_indexes
    for idx in (single, IndexAlias([half_a, half_b])):
        full = idx.search(_req(score, 0, 10))
        p1 = idx.search(_req(score, 0, 5))
        p2 = idx.search(_req(score, 5, 5))
        stitched = [h.id for h in p1.hits] + [h.id for h in p2.hits]
        assert stitched == [h.id for h in full.hits][: len(stitched)]


def test_fusion_request_keeps_facets(fts_indexes):
    """rescorer.go wraps the COMPLETE search: a {"score":"rrf",
    "facets":{...}} request must still return facets (computed over
    every FTS match, unchanged by the fusion reordering)."""
    single, _, _ = fts_indexes
    req = _req("rrf")
    req["facets"] = {"cats": {"field": "category", "size": 5}}
    res = single.search(req)
    assert res.hits
    assert res.facets and "cats" in res.facets
    plain = dict(req)
    del plain["score"]
    res_plain = single.search(plain)
    assert res.facets["cats"]["total"] == res_plain.facets["cats"]["total"]
    assert res.facets["cats"]["terms"] == res_plain.facets["cats"]["terms"]


def test_fusion_request_highlights(ray_session, tmp_path):
    # highlight needs the field stored as a docvalue; build a small
    # index with description retrievable
    files = _write(str(tmp_path), DOCS)
    idxd = str(tmp_path / "hlidx")
    build_index(
        files,
        idxd,
        IndexOptions(
            fields={
                "color": FieldConfig(analyzer="en"),
                "description": FieldConfig(analyzer="en"),
                "category": FieldConfig(analyzer="en"),
            },
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=8,
            docvalue_fields=["description"],
        ),
    )
    single = Index.open(idxd)
    req = {
        "query": {"match": "light", "field": "description"},
        "score": "rsf",
        "params": {"score_window_size": 10},
        "size": 10,
        "highlight": {"fields": ["description"], "style": "html"},
    }
    res = single.search(req)
    assert res.hits
    assert any(
        getattr(h, "fragments", None) and h.fragments.get("description")
        for h in res.hits
    )
    # parity with the unfused request's fragments for the same docs
    plain = dict(req)
    del plain["score"]
    by_id = {h.id: getattr(h, "fragments", {}) for h in single.search(plain).hits}
    for h in res.hits:
        if h.id in by_id:
            assert h.fragments == by_id[h.id]


def test_fusion_rejects_sort_and_cursor(fts_indexes):
    single, _, _ = fts_indexes
    req = _req("rrf")
    req["sort"] = ["category"]
    with pytest.raises(ValueError, match="sort"):
        single.search(req)
    req2 = _req("rrf")
    req2["search_after"] = ["0.5", "blue"]
    with pytest.raises(ValueError, match="search after"):
        single.search(req2)
