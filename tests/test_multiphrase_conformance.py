"""Multi-phrase searcher conformance over the reference's twoDocIndex
fixture (search/searcher/base_test.go:86-113):
- TestMultiPhraseSearch (search_phrase_test.go:113-163)
- TestFuzzyMultiPhraseSearch (search_phrase_test.go:165-239)

Fuzzy slots expand against the field dictionary within the given edit
distance before positional verification (NewMultiPhraseSearcher with
fuzziness), matching the reference's candidate expansion."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import FieldConfig, IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def two_doc_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("twodoc")
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": ["1", "2", "3", "4", "5"],
            "name": ["marty", "steve", "dustin", "ravi", "bobert"],
            "desc": [
                "beer beer beer beer",
                "angst beer couch database",
                "apple beer column dank",
                " ".join(["beer"] * 65),
                "water",
            ],
            "title": [None, "mister", "mister", None, "mister"],
        }),
        src,
    )
    out = str(tmp / "idx")
    build_index(
        [src], out,
        IndexOptions(
            fields={
                "name": FieldConfig(analyzer="ascii_alnum_lower"),
                "desc": FieldConfig(analyzer="ascii_alnum_lower",
                                    positions=True),
                "title": FieldConfig(analyzer="ascii_alnum_lower"),
            },
            doc_id_fields=["doc_id"], num_shards=1, bucket_bits=8,
        ),
    )
    return Index.open(out)


def _ids(idx, terms, fuzziness=0):
    res = idx.search({"query": {
        "terms": terms, "field": "desc", "fuzziness": fuzziness,
    }, "size": 10})
    return sorted(h.id for h in res.hits)


def test_multi_phrase_search(two_doc_index):
    assert _ids(two_doc_index, [["angst", "what"], ["beer"]]) == ["2"]


FUZZY_CASES = [
    ([["pale", "anger"], ["best"], ["colon", "porch"]], 2, ["2", "3"]),
    ([["pale", "anger"], [], ["colon", "porch", "could"]], 1, []),
    ([["app"], ["best"], ["volume"]], 2, ["3"]),
    ([["anger", "pale", "bar"], ["beard"], [], []], 2,
     ["1", "2", "3", "4"]),
    ([["anger", "pale", "bar"], [], ["beard"], []], 2, ["1", "4"]),
]


@pytest.mark.parametrize("phrase,fuzz,want", FUZZY_CASES)
def test_fuzzy_multi_phrase_search(two_doc_index, phrase, fuzz, want):
    assert _ids(two_doc_index, phrase, fuzz) == want
