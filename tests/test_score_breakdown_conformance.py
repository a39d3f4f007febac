"""Port of the reference's TestScoreBreakdown (search_test.go:3474-3623):
disjunction queries with RetrieveScoreBreakdown return, per hit, a map of
clause index -> that clause's (pre-coord) tf-idf score; non-matching and
zero-df ("blank") clauses are absent.  Values locked to the reference's
vectors at 3 decimal places; final scores include the coord factor."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

DOCS = {
    "doc1": "lorem ipsum dolor sit amet consectetur adipiscing elit do eiusmod tempor",
    "doc2": "lorem dolor amet adipiscing sed eiusmod",
    "doc3": "ipsum sit consectetur elit do tempor",
    "doc4": "lorem ipsum sit amet adipiscing elit do eiusmod",
}


def _terms_query(terms):
    return {
        "disjuncts": [{"term": t, "field": "text"} for t in terms],
        "retrieve_score_breakdown": True,
    }


# clause term lists + expected per-doc (score, {clause: value}) —
# search_test.go:3530-3585
Q1_TERMS = ["lorem", "blank", "ipsum", "blank", "blank", "dolor", "sit",
            "amet", "consectetur", "blank", "adipiscing", "blank", "elit",
            "sed", "do", "eiusmod", "tempor", "blank", "blank"]
Q1_EXPECT = {
    "doc1": (0.3034548543819603,
             {0: 0.040398807605268316, 2: 0.040398807605268316,
              5: 0.0669862776967768, 6: 0.040398807605268316,
              7: 0.040398807605268316, 8: 0.0669862776967768,
              10: 0.040398807605268316, 12: 0.040398807605268316,
              14: 0.040398807605268316, 15: 0.040398807605268316,
              16: 0.0669862776967768}),
    "doc2": (0.14725661652397853,
             {0: 0.05470024557900147, 5: 0.09069985124905133,
              7: 0.05470024557900147, 10: 0.05470024557900147,
              13: 0.15681178542754148, 15: 0.05470024557900147}),
    "doc3": (0.12637916362550797,
             {2: 0.05470024557900147, 6: 0.05470024557900147,
              8: 0.09069985124905133, 12: 0.05470024557900147,
              14: 0.05470024557900147, 16: 0.09069985124905133}),
    "doc4": (0.15956816751152955,
             {0: 0.04737179972998534, 2: 0.04737179972998534,
              6: 0.04737179972998534, 7: 0.04737179972998534,
              10: 0.04737179972998534, 12: 0.04737179972998534,
              14: 0.04737179972998534, 15: 0.04737179972998534}),
}

Q2_TERMS = ["blank", "lorem", "ipsum", "blank", "blank", "dolor", "sit",
            "blank"]
Q2_EXPECT = {
    "doc1": (0.1340684440934241,
             {1: 0.05756326446708409, 2: 0.05756326446708409,
              5: 0.09544709478559595, 6: 0.05756326446708409}),
    "doc2": (0.05179425287147191,
             {1: 0.0779410306721006, 5: 0.129235980813787}),
    "doc3": (0.0389705153360503,
             {2: 0.0779410306721006, 6: 0.0779410306721006}),
    "doc4": (0.07593627256602972,
             {1: 0.06749890894758198, 2: 0.06749890894758198,
              6: 0.06749890894758198}),
}


@pytest.fixture(scope="module")
def sb_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("scorebd")
    ids = sorted(DOCS)
    src = str(root / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "text": pa.array([DOCS[i] for i in ids]),
            }
        ),
        src,
    )
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="simple", positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
            scoring_model="tfidf",
        ),
    )
    return Index.open(d)


@pytest.mark.parametrize(
    "terms,expect",
    [(Q1_TERMS, Q1_EXPECT), (Q2_TERMS, Q2_EXPECT)],
    ids=["heap19", "slice8"],
)
def test_score_breakdown(sb_index, terms, expect):
    res = sb_index.search(
        {"query": _terms_query(terms), "size": 10, "sort": ["_id"]}
    )
    assert [h.id for h in res.hits] == sorted(expect)
    for h in res.hits:
        want_score, want_bd = expect[h.id]
        assert round(h.score, 3) == round(want_score, 3), h.id
        assert h.score_breakdown is not None
        assert set(h.score_breakdown) == set(want_bd), h.id
        for ci, v in want_bd.items():
            assert round(h.score_breakdown[ci], 3) == round(v, 3), (
                h.id, ci, h.score_breakdown[ci], v,
            )
