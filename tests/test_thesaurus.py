"""Index-time synonym thesaurus segments (reference index_impl.go:336
IndexSynonym, document/field_synonym.go Analyze/processSynonymData,
index/scorch/snapshot_index_thes.go thesaurus readers, query.go:539
ExtractSynonyms): segment build, per-doc shadow/delete, compaction,
query-time parity with the legacy manifest-KV path, and prefix/fuzzy/
regexp thesaurus-key expansion."""

import os

import pytest

from bleve_ray.analysis import analyzer_named
from bleve_ray.index import IndexOptions, build_index
from bleve_ray.index.thesaurus import (
    ThesaurusReader,
    add_synonym_documents,
    analyze_synonym_term,
    compact_thesaurus,
    definition_pairs,
    delete_synonym_document,
)
from bleve_ray.index import manifest as manifest_mod
from bleve_ray.search import Index


def test_analyze_synonym_term_one_token_rule():
    # field_synonym.go:143-149: valid only when analysis yields EXACTLY
    # one token
    an = analyzer_named("standard")
    assert analyze_synonym_term("Lambda", an) == "lambda"
    assert analyze_synonym_term("first class func", an) is None
    assert analyze_synonym_term("", an) is None
    assert analyze_synonym_term("the", an) is None  # stopword -> 0 tokens


def test_definition_pairs_semantics():
    # unidirectional keeps the verbatim synonym list (no self-filter);
    # bidirectional maps each synonym to all OTHERS
    uni = definition_pairs({"input": ["a"], "synonyms": ["a", "b"]})
    assert ("a", "a") in uni and ("a", "b") in uni
    bi = definition_pairs({"synonyms": ["x", "y", "z"]})
    assert set(bi) == {
        ("x", "y"), ("x", "z"),
        ("y", "x"), ("y", "z"),
        ("z", "x"), ("z", "y"),
    }


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("thes_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return d


def test_segment_shadow_delete_compact(built, tmp_path):
    src = "en-thes"
    add_synonym_documents(
        built, src, [("d1", {"synonyms": ["func", "lambda"]})], "standard"
    )
    man = manifest_mod.load(built)
    r = ThesaurusReader(built, man, src)
    assert r.synonyms_of("func") == ["lambda"]
    assert r.synonyms_of("lambda") == ["func"]

    # re-indexing d1 SHADOWS the old definition entirely
    add_synonym_documents(
        built, src, [("d1", {"input": ["closure"], "synonyms": ["lambda"]})]
    )
    man = manifest_mod.load(built)
    r = ThesaurusReader(built, man, src)
    assert r.synonyms_of("func") == []
    assert r.synonyms_of("closure") == ["lambda"]

    # a second doc coexists; deleting it tombstones only its rows
    add_synonym_documents(
        built, src, [("d2", {"synonyms": ["goto", "jump"]})]
    )
    man = manifest_mod.load(built)
    r = ThesaurusReader(built, man, src)
    assert r.synonyms_of("goto") == ["jump"]
    delete_synonym_document(built, src, "d2")
    man = manifest_mod.load(built)
    r = ThesaurusReader(built, man, src)
    assert r.synonyms_of("goto") == []
    assert r.synonyms_of("closure") == ["lambda"]

    # compaction keeps the effective view, single segment
    compact_thesaurus(built, src)
    man = manifest_mod.load(built)
    assert len(man.thesaurus[src]) == 1
    r = ThesaurusReader(built, man, src)
    assert r.synonyms_of("closure") == ["lambda"]
    assert r.synonyms_of("goto") == []
    assert r.synonyms_of("func") == []


def test_query_parity_with_legacy_kv(built):
    """Same query, same scores whether the thesaurus came from the legacy
    manifest-KV definitions or from index-time segments (the df-sensitive
    scoring parity check: both route through NewSynonymSearcher
    semantics, term at boost + synonyms at boost/2)."""
    req = {"query": {"term": "func", "field": "content"}, "size": 50}

    legacy = Index.open(built)
    legacy.mapping.thesauri.clear()  # force the legacy path
    legacy.mapping.set_synonyms([{"synonyms": ["func", "lambda"]}])
    res_legacy = legacy.search(req)

    seg = Index.open(built)
    seg.mapping.synonyms = None
    seg.index_synonym(
        "p1", "parity-src", {"synonyms": ["func", "lambda"]}, "standard"
    )
    # several sources exist on this shared index: pick one, the
    # DefaultSynonymSource role (mapping/index.go:54)
    seg.mapping.default_synonym_source = "parity-src"
    res_seg = seg.search(req)

    assert res_seg.total_hits == res_legacy.total_hits
    assert [(h.id, round(h.score, 9)) for h in res_seg.hits] == [
        (h.id, round(h.score, 9)) for h in res_legacy.hits
    ]


def test_thesaurus_key_prefix_fuzzy_regexp(built):
    """ExtractSynonyms match types (query.go:700-775): prefix/fuzzy/
    regexp queries expand synonyms of MATCHING THESAURUS KEYS too."""
    idx = Index.open(built)
    idx.mapping.synonyms = None
    idx.index_synonym(
        "k1",
        "keys-src",
        {"input": ["zqxjable"], "synonyms": ["func"]},
        "standard",
    )
    # per-FIELD source association (mapping/field.go:85 SynonymSource)
    idx.mapping.synonym_sources["content"] = "keys-src"
    # the key "zqxjable" exists in NO document, only in the thesaurus
    direct = idx.search(
        {"query": {"term": "zqxjable", "field": "content"}, "size": 10}
    )
    # term query: expansion via ThesaurusTermReader
    assert direct.total_hits > 0  # synonym "func" matches docs

    # prefix query matches the key by prefix -> synonyms contribute
    pre = idx.search(
        {"query": {"prefix": "zqxj", "field": "content"}, "size": 10}
    )
    assert pre.total_hits == direct.total_hits

    # fuzzy: one edit away from the key
    fz = idx.search(
        {
            "query": {
                "term": "zqxjably",
                "field": "content",
                "fuzziness": 1,
            },
            "size": 10,
        }
    )
    assert fz.total_hits >= direct.total_hits

    # regexp: anchored match on the key
    rx = idx.search(
        {"query": {"regexp": "zqxj.*", "field": "content"}, "size": 10}
    )
    assert rx.total_hits == direct.total_hits


def test_thesaurus_term_reader_vectors(built):
    """Port of TestThesaurusTermReader (search_test.go:3809-3996):
    exact synonyms-per-term expectations over four definitions with the
    simple analyzer."""
    src = "ttr-english"
    defs = [
        ("synDoc1", {"synonyms": ["quick", "fast", "speedy"]}),
        ("synDoc2", {"input": ["color", "colour"],
                     "synonyms": ["red", "green", "blue", "yellow", "brown"]}),
        ("synDoc3", {"input": ["animal", "creature"],
                     "synonyms": ["fox", "wolf", "cat", "dog", "rabbit"]}),
        ("synDoc4", {"synonyms": ["eats", "jumps", "runs", "barks", "hops"]}),
    ]
    add_synonym_documents(built, src, defs, "simple")
    r = ThesaurusReader(built, manifest_mod.load(built), src)
    vectors = [
        ("quick", ["fast", "speedy"]),
        ("red", []),
        ("color", ["red", "green", "blue", "yellow", "brown"]),
        ("colour", ["red", "green", "blue", "yellow", "brown"]),
        ("animal", ["fox", "wolf", "cat", "dog", "rabbit"]),
        ("creature", ["fox", "wolf", "cat", "dog", "rabbit"]),
        ("fox", []),
        ("eats", ["jumps", "runs", "barks", "hops"]),
        ("jumps", ["eats", "runs", "barks", "hops"]),
    ]
    for term, want in vectors:
        assert r.synonyms_of(term) == sorted(want), term


def test_copy_to_carries_thesaurus(built, tmp_path):
    from bleve_ray.index.manifest import copy_to

    dest = str(tmp_path / "copy")
    copy_to(built, dest)
    man = manifest_mod.load(dest)
    assert man.thesaurus
    for entries in man.thesaurus.values():
        for e in entries:
            assert os.path.exists(os.path.join(dest, e["path"]))
    idx = Index.open(dest)
    r = idx.mapping.thesauri.get("en-thes")
    assert r is not None and r.synonyms_of("closure") == ["lambda"]


def test_synonym_score_decomposition_parity(ray_session, tmp_path):
    """The reference's synonym-expanded term searcher (search_term.go:
    54-61,154-220 NewSynonymSearcher) IS a disjunction of the term at
    its boost plus each synonym at boost/2, every variant scored with
    its OWN df.  Lock that: a synonym term query over a thesaurus index
    must score hash-identically to the EXPLICIT disjunction query over
    the same corpus without any thesaurus -- with deliberately skewed
    per-variant dfs so a wrong-df implementation cannot pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # df(car)=2, df(auto)=4, df(vehicle)=1; tfs vary per doc
    texts = [
        "car auto",            # both, tf 1/1
        "car car auto filler", # car tf2
        "auto auto",           # auto only
        "vehicle auto",        # rare synonym + common one
        "auto filler filler",
        "filler words only",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "t": pa.array(texts),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)

    from bleve_ray.index import FieldConfig

    def build(d):
        build_index(
            [src],
            d,
            IndexOptions(
                fields={
                    "t": FieldConfig(analyzer="standard", positions=True)
                },
                doc_id_fields=["doc_id"],
                num_shards=1,
                bucket_bits=4,
            ),
        )
        return d

    thes_dir = build(str(tmp_path / "idx_thes"))
    plain_dir = build(str(tmp_path / "idx_plain"))

    thes = Index.open(thes_dir)
    thes.index_synonym(
        "s1",
        "score-src",
        {"input": ["car"], "synonyms": ["auto", "vehicle"]},
        "standard",
    )
    thes.mapping.default_synonym_source = "score-src"
    res_syn = thes.search(
        {"query": {"term": "car", "field": "t"}, "size": 10}
    )

    plain = Index.open(plain_dir)
    res_dis = plain.search(
        {
            "query": {
                "disjuncts": [
                    {"term": "car", "field": "t"},
                    {"term": "auto", "field": "t", "boost": 0.5},
                    {"term": "vehicle", "field": "t", "boost": 0.5},
                ]
            },
            "size": 10,
        }
    )
    assert res_syn.total_hits == res_dis.total_hits == 5
    assert [(h.id, round(h.score, 12)) for h in res_syn.hits] == [
        (h.id, round(h.score, 12)) for h in res_dis.hits
    ]
    # doc 3 (rare 'vehicle') must outscore doc 4 (one common 'auto'):
    # per-variant df is what separates them
    by_id = {h.id: h.score for h in res_syn.hits}
    assert by_id["3"] > by_id["4"]
