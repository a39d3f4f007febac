"""Port of the reference's TestAutoFuzzy golden vectors
(search_test.go:3626-3806): 15 phone-model docs under a custom
whitespace+lowercase analyzer; match and match_phrase queries with
fuzziness 2 and "auto", or/and operators, hits asserted IN SCORE ORDER
(sort -_score,_id) -- locks the fuzzy candidate expansion (transposition
automata), the per-candidate 1/(editDistance+1) boost, and auto
fuzziness thresholds (0/1/2 at lengths <=2/<=5/>5)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.analysis.analyzers import make_custom_analyzer
from bleve_ray.analysis.token_filters import lowercase_filter
from bleve_ray.analysis.tokenizers import WhitespaceTokenizer
from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index

DOCS = {
    "product1": "apple iphone 12",
    "product2": "apple iphone 13",
    "product3": "samsung galaxy s22",
    "product4": "samsung galaxy note",
    "product5": "google pixel 5",
    "product6": "oneplus 9 pro",
    "product7": "xiaomi mi 11",
    "product8": "oppo find x3",
    "product9": "vivo x60 pro",
    "product10": "oneplus 8t pro",
    "product11": "nokia xr20",
    "product12": "poco f1",
    "product13": "asus rog 5",
    "product14": "samsung galaxy a15 5g",
    "product15": "tecno camon 17",
}

# (query, expected hit ids IN SCORE ORDER) — search_test.go:3724-3776
TEST_QUERIES = [
    (
        {"match": "applle iphone 12", "fuzziness": 2, "field": "model"},
        ["product1", "product2", "product7", "product14", "product15",
         "product12", "product10", "product3", "product6", "product8"],
    ),
    (
        {"match": "applle iphone 12", "fuzziness": "auto", "field": "model"},
        ["product1", "product2"],
    ),
    (
        {"match": "applle iphone 12", "fuzziness": 2, "field": "model",
         "operator": "and"},
        ["product1", "product2"],
    ),
    (
        {"match": "applle iphone 12", "fuzziness": "auto", "field": "model",
         "operator": "and"},
        ["product1"],
    ),
    (
        {"match_phrase": "onplus 9 pro", "fuzziness": 2, "field": "model"},
        ["product6", "product10"],
    ),
    (
        {"match_phrase": "onplus 9 pro", "fuzziness": "auto",
         "field": "model"},
        ["product6"],
    ),
]


@pytest.fixture(scope="module")
def fuzzy_index(ray_session, tmp_path_factory):
    make_custom_analyzer(
        "splitter", WhitespaceTokenizer(), [lowercase_filter]
    )
    root = tmp_path_factory.mktemp("autofuzzy")
    ids = sorted(DOCS, key=lambda k: int(k[7:]))
    src = str(root / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "model": pa.array([DOCS[i] for i in ids]),
            }
        ),
        src,
    )
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"model": FieldConfig(analyzer="splitter",
                                         positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
        ),
    )
    return Index.open(d)


@pytest.mark.parametrize(
    "query,expect", TEST_QUERIES,
    ids=[f"q{i}" for i in range(len(TEST_QUERIES))],
)
def test_auto_fuzzy_conformance(fuzzy_index, query, expect):
    # the reference runs NewSearchRequest's default size=10 window
    res = fuzzy_index.search(
        {"query": query, "size": 10, "sort": ["-_score", "_id"]}
    )
    got = [h.id for h in res.hits]
    assert got == expect, f"{query} -> {got}"


def test_match_query_partial_match_flag(ray_session, tmp_path_factory):
    """Port of TestMatchQueryPartialMatch (search_test.go:1263-1420):
    the root explanation carries partial_match = matched fewer than all
    disjunct clauses; full matches carry False."""
    root = tmp_path_factory.mktemp("partial")
    src = str(root / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["doc1", "doc2"]),
                "description": pa.array(
                    [
                        "Patrick is first name Stewart is last name",
                        "Manager given name is Patrick",
                    ]
                ),
            }
        ),
        src,
    )
    d = str(root / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"description": FieldConfig(analyzer="standard",
                                               positions=True)},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=6,
        ),
    )
    idx = Index.open(d)

    def partials(query):
        res = idx.search({"query": query, "size": 10, "explain": True})
        return {h.id: h.expl.get("partial_match") for h in res.hits}

    # 1: doc1 full (both terms), doc2 partial (only 'patrick')
    p = partials({"match": "patrick stewart", "field": "description"})
    assert p == {"doc1": False, "doc2": True}
    # 2: fuzzy 2 -- doc1 partial, doc2 full
    p = partials({"match": "paltric manner", "field": "description",
                  "fuzziness": 2})
    assert p == {"doc1": True, "doc2": False}
    # 3: single term -- both full
    p = partials({"match": "patrick", "field": "description"})
    assert p == {"doc1": False, "doc2": False}


def test_fuzzy_scoring_ratio(ray_session, tmp_path_factory):
    """index_test.go TestFuzzyScoring: docs ab/abc/abcd, fuzzy("ab")
    fuzziness 2 -> scores in exact ratio 1 : 1/2 : 1/3 (the
    per-candidate 1/(editDistance+1) boost with otherwise identical
    per-doc statistics)."""
    import os

    d = str(tmp_path_factory.mktemp("fuzsrc"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array(["ab", "abc", "abcd"]),
            "textField": pa.array(["ab", "abc", "abcd"]),
        }),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("fuzidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(
            fields={"textField": FieldConfig(analyzer="simple")},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=16,
        ),
    )
    idx = Index.open(idxd)
    res = idx.search({
        "query": {"term": "ab", "fuzziness": 2, "field": "textField"},
        "size": 10,
    })
    assert [h.id for h in res.hits] == ["ab", "abc", "abcd"]
    max_score = res.hits[0].score
    for i, h in enumerate(res.hits):
        assert abs(h.score - max_score / (i + 1)) < 1e-12, (i, h.score)


def test_fuzzy_limit_errors(ray_session, tmp_path_factory):
    """search_fuzzy_test.go TestFuzzySearchLimitErrors: fuzziness > 2
    and negative fuzziness error at searcher construction."""
    import os

    d = str(tmp_path_factory.mktemp("fzlsrc"))
    pq.write_table(
        pa.table({"doc_id": pa.array(["a"]),
                  "content": pa.array(["water"])}),
        os.path.join(d, "docs.parquet"),
    )
    idxd = str(tmp_path_factory.mktemp("fzlidx"))
    build_index(
        [os.path.join(d, "docs.parquet")],
        idxd,
        IndexOptions(fields={"content": FieldConfig()},
                     doc_id_fields=["doc_id"], num_shards=1,
                     bucket_bits=16),
    )
    idx = Index.open(idxd)
    with pytest.raises(ValueError, match="exceeds max"):
        idx.search({"query": {"term": "water", "field": "content",
                              "fuzziness": 3}, "size": 5})
    with pytest.raises(ValueError, match="negative"):
        idx.search({"query": {"term": "water", "field": "content",
                              "fuzziness": -1}, "size": 5})
    # fuzziness 2 still searches
    r = idx.search({"query": {"term": "watr", "field": "content",
                              "fuzziness": 2}, "size": 5})
    assert r.total_hits == 1
