"""Hybrid rescorer end-to-end vectors ported from the reference's
rescorer_knn_test.go (build-tag `vectors` suite): 22 blue-family color
docs with an l2 vector field, match_phrase "dark" + two KNN clauses,
RRF/RSF fusion with rank_constant=1 and window=10 across four index
topologies (single index, alias-of-one, alias-of-two with the corpus
split, nested aliases over thirds), plus pagination slicing of the
fused ranking and facet parity between default and fused scoring
(rescorer_knn_test.go:493-1120)."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index
from bleve_ray.search.distributed import IndexAlias

# getHybridSearchDocuments (rescorer_knn_test.go:67-160): doc id = color
DOCS = [
    ("dark slate blue", [72, 61, 139]),
    ("blue", [0, 0, 255]),
    ("navy", [0, 0, 128]),
    ("steel blue", [70, 130, 180]),
    ("light blue", [173, 216, 230]),
    ("deep sky blue", [0, 191, 255]),
    ("royal blue", [65, 105, 225]),
    ("powder blue", [176, 224, 230]),
    ("corn flower blue", [100, 149, 237]),
    ("alice blue", [240, 248, 255]),
    ("blue violet", [138, 43, 226]),
    ("sky blue", [135, 206, 235]),
    ("indigo", [75, 0, 130]),
    ("midnight blue", [25, 25, 112]),
    ("dark blue", [0, 0, 139]),
    ("medium slate blue", [123, 104, 238]),
    ("cadet blue", [95, 158, 160]),
    ("light steel blue", [176, 196, 222]),
    ("dodger blue", [30, 144, 255]),
    ("medium blue", [0, 0, 205]),
    ("slate blue", [106, 90, 205]),
    ("light sky blue", [135, 206, 250]),
]


def _build(tmpdir, docs, tag):
    src = str(tmpdir / f"docs_{tag}.parquet")
    pq.write_table(
        pa.table(
            {
                "color": pa.array([c for c, _ in docs]),
                "colorvect_l2": pa.array(
                    [[float(x) for x in v] for _, v in docs],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        src,
    )
    idx_dir = str(tmpdir / f"idx_{tag}")
    build_index(
        [src],
        idx_dir,
        IndexOptions(
            fields={"color": FieldConfig(analyzer="en", positions=True)},
            doc_id_fields=["color"],
            docvalue_fields=["color", "colorvect_l2"],
            store_fields=["color"],
            scoring_model="tfidf",
            num_shards=1,
            bucket_bits=36,
        ),
    )
    return Index.open(idx_dir)


@pytest.fixture(scope="module")
def topo(ray_session, tmp_path_factory):
    """The four setups of rescorer_knn_test.go:236-492, built once."""
    d = tmp_path_factory.mktemp("rescorer_vec")
    full = _build(d, DOCS, "full")
    mid = len(DOCS) // 2
    half1 = _build(d, DOCS[:mid], "h1")
    half2 = _build(d, DOCS[mid:], "h2")
    t1, t2 = len(DOCS) // 3, 2 * len(DOCS) // 3
    third1 = _build(d, DOCS[:t1], "t1")
    third2 = _build(d, DOCS[t1:t2], "t2")
    third3 = _build(d, DOCS[t2:], "t3")

    def nested():
        sub1 = IndexAlias([third1], name="subAlias1")
        sub2 = IndexAlias([third2, third3], name="subAlias2")
        return IndexAlias([sub1, sub2], name="masterAlias")

    return {
        "single": lambda: full,
        "alias1": lambda: IndexAlias([full]),
        "alias2": lambda: IndexAlias([half1, half2]),
        "nested": nested,
    }


SCENARIOS = ["single", "alias1", "alias2", "nested"]


def fusion_request(score, knn=True, from_=0, size=10):
    """createScoreFusionRequest (rescorer_knn_test.go:162-182):
    match_phrase "dark", two l2 KNN clauses k=5 boost=1,
    RequestParams{rank_constant:1, window:10}."""
    req = {
        "query": {"match_phrase": "dark", "field": "color"},
        "size": size,
        "from": from_,
        "params": {"score_rank_constant": 1, "score_window_size": 10},
    }
    if score:
        req["score"] = score
    if knn:
        req["knn"] = [
            {
                "field": "colorvect_l2",
                "vector": [0.0, 0.0, 129.0],
                "k": 5,
                "boost": 1.0,
                "similarity": "l2_norm",
            },
            {
                "field": "colorvect_l2",
                "vector": [0.0, 0.0, 250.0],
                "k": 5,
                "boost": 1.0,
                "similarity": "l2_norm",
            },
        ]
    return req


# verifyRRFResults (rescorer_knn_test.go:185-235): k=1 -> 1/(1+rank).
# FTS "dark": 1. dark blue, 2. dark slate blue
# kNN1 [0,0,129]: navy, dark blue, midnight blue, indigo, medium blue
# kNN2 [0,0,250]: blue, medium blue, dark blue, navy, royal blue
EXPECTED_RRF = {
    "dark blue": 1.083333,  # 1/2 + 1/3 + 1/4
    "navy": 0.7,  # 1/2 + 1/5
    "blue": 0.5,  # 1/2
    "medium blue": 0.5,  # 1/6 + 1/3
    "dark slate blue": 0.333333,  # 1/3
    "midnight blue": 0.25,  # 1/4
    "indigo": 0.2,  # 1/5
    "royal blue": 0.166667,  # 1/6
}
EXPECTED_ORDER = [
    "dark blue",
    "navy",
    "blue",
    "medium blue",
    "dark slate blue",
    "midnight blue",
    "indigo",
    "royal blue",
]


def verify_rrf(hits):
    assert len(hits) >= len(EXPECTED_ORDER)
    for i, want_id in enumerate(EXPECTED_ORDER):
        got = hits[i].id
        if got != want_id:
            # the reference tolerates the blue/medium-blue tie swap
            assert got in ("blue", "medium blue"), (
                f"position {i + 1}: expected {want_id}, got {got}"
            )
        assert math.isclose(
            hits[i].score, EXPECTED_RRF[want_id], abs_tol=0.001
        ), (want_id, hits[i].score)


def verify_rsf(hits):
    """verifyRSFResults (rescorer_knn_test.go:766-840): loose structural
    checks -- top docs present, scores in [0, 3], sorted, differentiated."""
    assert len(hits) >= 8
    pos = {h.id: i for i, h in enumerate(hits)}
    assert "dark blue" in pos and pos["dark blue"] < 5
    top_found = sum(
        1
        for d in ("dark blue", "navy", "blue", "medium blue")
        if pos.get(d, 99) < 5
    )
    assert top_found >= 3
    for i, h in enumerate(hits):
        assert 0.0 <= h.score <= 3.0, (h.id, h.score)
        if i:
            assert hits[i - 1].score >= h.score
    assert hits[0].score >= 0.1
    assert hits[0].score - hits[4].score >= 0.001


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_rrf_end_to_end(topo, scenario):
    idx = topo[scenario]()
    r = idx.search(fusion_request("rrf"))
    verify_rrf(r.hits)


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_rrf_pagination(topo, scenario):
    """TestRRFPagination: page 1 (0..5) + page 2 (5..10) concatenate to
    the full fused ranking; 8 fused hits -> 5 + 3."""
    idx = topo[scenario]()
    p1 = idx.search(fusion_request("rrf", from_=0, size=5))
    p2 = idx.search(fusion_request("rrf", from_=5, size=5))
    assert len(p1.hits) == 5
    assert len(p2.hits) == 3
    verify_rrf(p1.hits + p2.hits)


@pytest.mark.parametrize("scenario", SCENARIOS)
@pytest.mark.parametrize("mode", ["rrf", "rsf"])
def test_fusion_faceting_parity(topo, scenario, mode):
    """TestRRFFaceting / TestRSFFaceting: the color terms facet is
    identical between default scoring (no knn) and fused scoring --
    facets come from the FTS matches, untouched by fusion."""
    idx = topo[scenario]()
    fac = {"color": {"field": "color", "size": 10}}
    default_req = fusion_request("", knn=False)
    default_req["facets"] = fac
    fused_req = fusion_request(mode)
    fused_req["facets"] = fac
    r_def = idx.search(default_req)
    r_fus = idx.search(fused_req)
    assert r_def.hits and r_fus.hits
    assert r_def.facets and r_fus.facets
    f_def, f_fus = r_def.facets["color"], r_fus.facets["color"]
    assert f_def["total"] == f_fus["total"]
    assert f_def["missing"] == f_fus["missing"]
    assert f_def["other"] == f_fus["other"]
    assert f_def["terms"] == f_fus["terms"]


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_rsf_end_to_end(topo, scenario):
    idx = topo[scenario]()
    req = fusion_request("rsf")
    if scenario != "single":
        # the reference RSF tests run under SearchTypeKey=GlobalScoring
        req["search_type"] = "global_scoring"
    r = idx.search(req)
    verify_rsf(r.hits)


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_default_hybrid_pagination(topo, scenario):
    """TestRSFPagination actually paginates the DEFAULT additive merge
    with knn enabled (rescorer_knn_test.go:929-999) and applies the
    loose RSF checks to the concatenation."""
    idx = topo[scenario]()
    p1 = idx.search(fusion_request("", from_=0, size=5))
    p2 = idx.search(fusion_request("", from_=5, size=5))
    assert p1.hits
    combined = p1.hits + p2.hits
    assert combined
    verify_rsf(combined)
