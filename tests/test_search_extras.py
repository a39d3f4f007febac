"""score:none unadorned path + search_after pagination."""

import os

import pytest

from bleve_ray.index import IndexOptions, build_index
from bleve_ray.search import Index


@pytest.fixture(scope="module")
def idx(ray_session, tiny_corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("extra_idx"))
    files = sorted(
        os.path.join(tiny_corpus_dir, f) for f in os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    return Index.open(d)


def test_score_none_counts_match(idx):
    scored = idx.search(
        {"query": {"match": "func return", "field": "content",
                   "operator": "and"}, "size": 5}
    )
    unscored = idx.search(
        {"query": {"match": "func return", "field": "content",
                   "operator": "and"}, "size": 5, "score": "none"}
    )
    assert unscored.total_hits == scored.total_hits
    assert all(h.score == 0.0 for h in unscored.hits)


def test_search_after_walks_full_ranking(idx):
    req = {"query": {"term": "lambda", "field": "content"}, "size": 3}
    full = idx.search({**req, "size": 100}).hits
    walked = []
    after = None
    while True:
        r = dict(req)
        if after:
            r["search_after"] = after
        page = idx.search(r).hits
        if not page:
            break
        walked.extend(page)
        after = [page[-1].score, page[-1].id]
    assert [(h.id, h.score) for h in walked] == [
        (h.id, h.score) for h in full
    ]


def test_dictionary_pruning_reads_fewer_row_groups(ray_session, tmp_path):
    """A selective prefix reads strictly fewer row groups than the
    segment holds (parquet (field,term) stats as the binary-searchable
    dictionary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.index import segment as segment_mod
    from bleve_ray.search import Index

    # enough distinct terms to span several 2048-term row groups in one
    # shard: synthetic terms 'tXXXXX'
    n = 20000
    texts = [f"t{i:05d} common" for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="ascii_alnum_lower",
                                        positions=False)},
            doc_id_fields=["doc_id"],
            num_shards=1,
            bucket_bits=36,
        ),
    )
    idx = Index.open(d)
    terms = idx.reader.terms_with_prefix("text", "t0000")
    assert terms == [f"t{i:05d}" for i in range(10)]
    readers = list(idx.reader._seg_readers.values())
    total_rgs = sum(r._pf.metadata.num_row_groups for r in readers)
    read_rgs = sum(r.rg_read_count for r in readers)
    assert total_rgs >= 4
    assert read_rgs < total_rgs, (read_rgs, total_rgs)


def test_term_range_pruned_matches_full_scan(ray_session, tiny_corpus_dir,
                                             tmp_path):
    import os as _os

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    d = str(tmp_path / "rangeidx")
    files = sorted(
        _os.path.join(tiny_corpus_dir, f)
        for f in _os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    # reference: full dictionary filtered in python
    full = [t for t, _ in idx.reader.dictionary("content")]
    lo, hi = "f", "m"
    want = [t for t in full if lo <= t < hi]
    got = idx.reader.terms_in_range("content", lo, hi, inclusive_hi=False)
    assert got == want
    want_p = [t for t in full if t.startswith("re")]
    assert idx.reader.terms_with_prefix("content", "re") == want_p


def test_synonym_expansion(ray_session, tiny_corpus_dir, tmp_path):
    """SynonymDefinition semantics (index.go:358-390): bidirectional and
    unidirectional mappings; query-time disjunction with synonyms at
    boost/2 (search_term.go:154-196)."""
    import os as _os

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index
    from bleve_ray.search.synonyms import Thesaurus

    th = Thesaurus.from_definitions(
        [
            {"synonyms": ["func", "lambda"]},  # bidirectional
            {"input": ["closure"], "synonyms": ["lambda"]},  # one-way
        ]
    )
    assert th.synonyms_of("func") == ["lambda"]
    assert th.synonyms_of("lambda") == ["func"]
    assert th.synonyms_of("closure") == ["lambda"]
    assert th.synonyms_of("lambda") == ["func"]  # no back-mapping

    d = str(tmp_path / "synidx")
    files = sorted(
        _os.path.join(tiny_corpus_dir, f)
        for f in _os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    plain = idx.search(
        {"query": {"term": "func", "field": "content"}, "size": 200}
    )
    lam = idx.search(
        {"query": {"term": "lambda", "field": "content"}, "size": 200}
    )
    idx.mapping.set_synonyms(
        [{"synonyms": ["func", "lambda"]}]
    )
    syn = idx.search(
        {"query": {"term": "func", "field": "content"}, "size": 500}
    )
    ids = {h.id for h in syn.hits}
    assert {h.id for h in plain.hits} <= ids
    assert {h.id for h in lam.hits} <= ids
    assert syn.total_hits >= max(plain.total_hits, lam.total_hits)
    # docs that ONLY contain the synonym score at half weight relative to
    # an equally-ranked direct match; just assert both term sets present
    assert syn.total_hits <= plain.total_hits + lam.total_hits


def test_bool_field_and_ip_queries(ray_session, tmp_path):
    """bool_field.go ('T'/'F' terms) and ip_range.go (16-byte terms;
    CIDR = dictionary range [network, broadcast])."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "active": pa.array([True, False, True, None, False, True]),
            "addr": pa.array(
                [
                    "10.0.0.1",
                    "10.0.1.200",
                    "192.168.1.5",
                    "10.44.0.9",
                    "2001:db8::1",
                    "192.168.1.6",
                ]
            ),
        }
    )
    src = str(tmp_path / "b.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "bidx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={
                "active": FieldConfig(field_type="boolean", positions=False),
                "addr": FieldConfig(field_type="ip", positions=False),
            },
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    idx = Index.open(d)
    r = idx.search({"query": {"bool": True, "field": "active"}, "size": 10})
    assert sorted(h.id for h in r.hits) == ["0", "2", "5"]
    r = idx.search({"query": {"bool": False, "field": "active"}, "size": 10})
    assert sorted(h.id for h in r.hits) == ["1", "4"]
    # exact IP
    r = idx.search({"query": {"cidr": "10.0.0.1", "field": "addr"}, "size": 10})
    assert [h.id for h in r.hits] == ["0"]
    # CIDR ranges
    r = idx.search({"query": {"cidr": "10.0.0.0/16", "field": "addr"},
                    "size": 10})
    assert sorted(h.id for h in r.hits) == ["0", "1"]
    r = idx.search({"query": {"cidr": "10.0.0.0/8", "field": "addr"},
                    "size": 10})
    assert sorted(h.id for h in r.hits) == ["0", "1", "3"]
    r = idx.search({"query": {"cidr": "192.168.1.0/24", "field": "addr"},
                    "size": 10})
    assert sorted(h.id for h in r.hits) == ["2", "5"]
    r = idx.search({"query": {"cidr": "2001:db8::/32", "field": "addr"},
                    "size": 10})
    assert [h.id for h in r.hits] == ["4"]


def test_custom_score_and_filter_queries(ray_session, tiny_corpus_dir,
                                         tmp_path):
    import os as _os

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index
    from bleve_ray.search.query import (
        CustomFilterQuery,
        CustomScoreQuery,
        TermQuery,
    )

    d = str(tmp_path / "csidx")
    files = sorted(
        _os.path.join(tiny_corpus_dir, f)
        for f in _os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    base = idx.search({"query": {"term": "func", "field": "content"},
                       "size": 500})
    # rescore: id-parity bonus
    q = CustomScoreQuery(
        TermQuery("func", field="content"),
        score_func=lambda did, score, fields: score + (
            10.0 if did.endswith("2") else 0.0
        ),
    )
    r = idx.search({"query": q, "size": 500})
    assert r.total_hits == base.total_hits
    boosted = [h for h in r.hits if h.id.endswith("2")]
    if boosted:
        assert r.hits[0].id.endswith("2")
    # filter: keep only ids ending in a digit > 5
    q2 = CustomFilterQuery(
        TermQuery("func", field="content"),
        filter_func=lambda did, score, fields: did[-1] in "6789",
    )
    r2 = idx.search({"query": q2, "size": 500})
    assert all(h.id[-1] in "6789" for h in r2.hits)
    assert r2.total_hits == sum(1 for h in base.hits if h.id[-1] in "6789")


def test_explain_trees(idx):
    """"explain": true attaches reference-shaped explanation trees whose
    root value equals the hit score (scorer_term.go:159-245 messages)."""
    for q in [
        {"term": "func", "field": "content"},
        {"match": "func return", "field": "content"},
        {"match": "func return", "field": "content", "operator": "and"},
        {"match_phrase": "return nil", "field": "content"},
        {
            "must": [{"term": "func", "field": "content"}],
            "must_not": [{"term": "zzz_absent", "field": "content"}],
        },
    ]:
        r = idx.search({"query": q, "size": 3, "explain": True})
        assert r.hits, q
        for h in r.hits:
            assert h.expl is not None
            assert abs(h.expl["value"] - h.score) < 1e-9
    # message fidelity for a bare term (no queryWeight wrapper)
    r = idx.search(
        {"query": {"term": "func", "field": "content"}, "size": 1,
         "explain": True}
    )
    e = r.hits[0].expl
    assert e["message"].startswith("fieldWeight(content:func in ")
    assert ", as per bm25 model, product of:" in e["message"]
    msgs = [c["message"] for c in e["children"]]
    assert any(m.startswith("tf(termFreq(content:func)=") for m in msgs)
    assert any(m.startswith("saturation(term:func)") for m in msgs)
    assert any(m.startswith("idf(docFreq=") for m in msgs)
    # disjunction: product of [sum of:, coord(m/n)]
    r = idx.search(
        {"query": {"match": "func return", "field": "content"}, "size": 1,
         "explain": True}
    )
    e = r.hits[0].expl
    assert e["message"] == "product of:"
    assert e["children"][0]["message"] == "sum of:"
    assert e["children"][1]["message"].startswith("coord(")
    # serialized form carries the tree
    d = r.to_dict()
    assert "explanation" in d["hits"][0]


def test_index_interface_parity(ray_session, tiny_corpus_dir, tmp_path_factory):
    """index.go Index interface: DocCount/Fields/Document/Get-SetInternal."""
    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.index.manifest import load as load_manifest

    d = str(tmp_path_factory.mktemp("ifaceidx"))
    import glob as _glob

    files = sorted(_glob.glob(f"{tiny_corpus_dir}/*.parquet"))
    build_index(
        files,
        d,
        IndexOptions(
            num_shards=2,
            bucket_bits=6,
            docvalue_fields=["lang"],
            store_fields=["content"],
        ),
    )
    idx = Index.open(d)
    assert idx.doc_count() > 0
    assert "content" in idx.fields()
    some_id = idx.search(
        {"query": {"term": "func", "field": "content"}, "size": 1}
    ).hits[0].id
    doc = idx.document(some_id)
    assert doc["id"] == some_id
    assert "content" in doc["fields"] and doc["fields"]["content"]
    assert idx.document("no_such_id_xyz") is None
    # internal KV is epoch-committed and survives reopen
    epoch0 = load_manifest(d).epoch
    idx.set_internal("mapping_checksum", "abc123")
    assert Index.open(d).get_internal("mapping_checksum") == "abc123"
    assert load_manifest(d).epoch == epoch0 + 1
    idx.delete_internal("mapping_checksum")
    assert Index.open(d).get_internal("mapping_checksum") is None


def test_request_validation_rejections(idx):
    """SearchRequest.Validate equivalent (search.go:324-355)."""
    with pytest.raises(ValueError, match="together"):
        idx.search(
            {
                "query": {"match_all": {}},
                "search_after": [1.0, "a"],
                "search_before": [2.0, "b"],
            }
        )
    with pytest.raises(ValueError, match="from !=0"):
        idx.search(
            {
                "query": {"match_all": {}},
                "search_after": [1.0, "a"],
                "from": 5,
            }
        )
    with pytest.raises(ValueError, match="non-negative"):
        idx.search({"query": {"match_all": {}}, "size": -1})
    with pytest.raises(ValueError, match="score fusion"):
        idx.search(
            {
                "query": {"match_all": {}},
                "score": "rrf",
                "search_after": [1.0, "a"],
            }
        )


def test_star_returns_all_retrievable_fields(doc_index_for_star):
    r = doc_index_for_star.search(
        {
            "query": {"term": "vector", "field": "text"},
            "size": 1,
            "fields": ["*"],
        }
    )
    assert r.hits
    got = set(r.hits[0].fields)
    assert {"text", "lang", "source", "n_chars"} <= got


@pytest.fixture(scope="module")
def doc_index_for_star(ray_session, tmp_path_factory):
    from bleve_ray.index import FieldConfig, IndexOptions, build_index
    from bleve_ray.search import Index

    d = str(tmp_path_factory.mktemp("staridx"))
    build_index(
        ["/root/testdata/sf0.001/documents.parquet"],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="ascii_alnum_lower")},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=16,
            docvalue_fields=["lang", "source", "n_chars"],
            store_fields=["text"],
        ),
    )
    return Index.open(d)


def test_custom_query_parser_registration(idx):
    """JSON dispatch for custom_score/custom_filter goes through the
    registered parser hooks (query.go:311-324); unregistered -> error."""
    import bleve_ray.search.query as q

    old_s, old_f = q.CUSTOM_SCORE_QUERY_PARSER, q.CUSTOM_FILTER_QUERY_PARSER
    q.CUSTOM_SCORE_QUERY_PARSER = None
    q.CUSTOM_FILTER_QUERY_PARSER = None
    try:
        # unregistered: the reference's default UnmarshalJSON applies
        # (custom_query_test.go) — an OBJECT payload parses into the
        # default wrapper (no callback yet), a non-object errors
        assert isinstance(
            q.parse_query({"custom_score": {"base": 2.0}}),
            q.CustomScoreQuery,
        )
        assert isinstance(
            q.parse_query({"custom_filter": {}}), q.CustomFilterQuery
        )
        with pytest.raises(ValueError, match="must be a JSON object"):
            q.parse_query({"custom_score": "beer"})

        def parse_score(d):
            spec = d["custom_score"]
            return q.CustomScoreQuery(
                q.parse_query(spec["query"]),
                lambda doc_id, score, fields: score * spec["mult"],
            )

        q.register_custom_query_parsers(score=parse_score)
        r = idx.search(
            {
                "query": {
                    "custom_score": {
                        "query": {"term": "func", "field": "content"},
                        "mult": 3.0,
                    }
                },
                "size": 3,
            }
        )
        base = idx.search(
            {"query": {"term": "func", "field": "content"}, "size": 3}
        )
        assert r.hits and all(
            abs(a.score - 3.0 * b.score) < 1e-9
            for a, b in zip(r.hits, base.hits)
        )
    finally:
        q.CUSTOM_SCORE_QUERY_PARSER = old_s
        q.CUSTOM_FILTER_QUERY_PARSER = old_f


def test_synonyms_persist_with_index(ray_session, tiny_corpus_dir, tmp_path):
    """define_synonyms stores the definitions in the index (internal KV,
    reference indexes SynonymDefinitions so they persist, index.go:358-390)
    and a FRESH open re-applies them automatically."""
    import os as _os

    from bleve_ray.index import IndexOptions, build_index
    from bleve_ray.search import Index

    d = str(tmp_path / "synpersist")
    files = sorted(
        _os.path.join(tiny_corpus_dir, f)
        for f in _os.listdir(tiny_corpus_dir)
    )
    build_index(files, d, IndexOptions(num_shards=2, bucket_bits=6))
    idx = Index.open(d)
    plain_total = idx.search(
        {"query": {"term": "func", "field": "content"}, "size": 0}
    ).total_hits
    idx.define_synonyms([{"synonyms": ["func", "lambda"]}])
    with_syn = idx.search(
        {"query": {"term": "func", "field": "content"}, "size": 0}
    ).total_hits
    assert with_syn >= plain_total

    # fresh open: thesaurus restored from the index itself
    idx2 = Index.open(d)
    assert idx2.mapping.synonyms is not None
    assert idx2.mapping.synonyms.synonyms_of("func") == ["lambda"]
    assert (
        idx2.search(
            {"query": {"term": "func", "field": "content"}, "size": 0}
        ).total_hits
        == with_syn
    )


def test_index_facade_single_doc_ops(ray_session, tmp_path):
    """index.go Index/Delete/Batch/FieldDict/StatsMap/Close parity on the
    Index facade: single-doc upsert is visible to search immediately,
    delete tombstones it, field dicts and stats serve."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bleve_ray.index import FieldConfig, IndexOptions, build_index

    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(20)]),
            "text": pa.array([f"hello world number{i}" for i in range(20)]),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    d = str(tmp_path / "idx")
    build_index(
        [src],
        d,
        IndexOptions(
            fields={"text": FieldConfig(analyzer="ascii_alnum_lower")},
            doc_id_fields=["doc_id"],
            num_shards=2,
            bucket_bits=6,
        ),
    )
    idx = Index.open(d)
    assert idx.doc_count() == 20
    idx.index("zzz", {"text": "freshly upserted xylophone"})
    r = idx.search({"query": {"term": "xylophone", "field": "text"}})
    assert [h.id for h in r.hits] == ["zzz"]
    assert idx.doc_count() == 21
    idx.delete("zzz")
    assert (
        idx.search({"query": {"term": "xylophone", "field": "text"}}).total_hits
        == 0
    )
    # field dict surfaces
    terms = dict(idx.field_dict("text"))
    assert terms.get("hello") == 20
    assert idx.field_dict_prefix("text", "numb") == sorted(
        f"number{i}" for i in range(20)
    )
    sm = idx.stats_map()
    assert sm["epoch"] >= 1 and "doc_count" in sm
    tf = idx.term_frequencies("text", limit=2)
    assert tf[0][0] in ("hello", "world") and tf[0][1] == 20
    assert idx.term_frequencies("text", limit=1, descending=False)[0][1] == 1
    idx.set_name("myindex")
    assert idx.name == "myindex"
    assert idx.advanced() is idx.reader
    assert idx.get_mapping() is idx.mapping
    idx.close()
    # closed index rejects operations (index.go ErrorIndexClosed,
    # TestClosedIndex); reopening works
    with pytest.raises(RuntimeError):
        idx.search({"query": {"term": "hello", "field": "text"}})
    reopened = Index.open(idx.reader.index_dir)
    assert reopened.search(
        {"query": {"term": "hello", "field": "text"}}
    ).total_hits == 20


def test_regexp_alternation_prefix_pruning(idx):
    """Alternation regexes prune per branch; results identical to the
    unpruned full-dictionary filter (including the quantified-group case
    that must NOT prune)."""
    import re

    from bleve_ray.search.query import _regex_literal_prefixes

    full = [t for t, _ in idx.reader.dictionary("content")]
    for pattern in (
        "func.*|return.*",
        "(func|lambda)[a-z]*",
        "(?:err|ok)[a-z]*",
        "(func|x)*",
    ):
        r = idx.search(
            {"query": {"regexp": pattern, "field": "content"}, "size": 0}
        )
        pat = re.compile(pattern)
        want_terms = [t for t in full if pat.fullmatch(t)]
        want = idx.search(
            {
                "query": {
                    "disjuncts": [
                        {"term": t, "field": "content"} for t in want_terms
                    ]
                }
                if want_terms
                else {"match_none": {}},
                "size": 0,
            }
        )
        assert r.total_hits == want.total_hits, pattern
    # quantified group pattern must not have been pruned away
    assert _regex_literal_prefixes("(func|x)*") == []


def test_ip_term_order_property():
    """Property: ip_term's latin-1 byte carrier preserves numeric IP
    ordering (the invariant CIDR dictionary-range scans rely on)."""
    import ipaddress

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bleve_ray.index.build import ip_term

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=0, max_value=(1 << 32) - 1),
        st.integers(min_value=0, max_value=(1 << 32) - 1),
    )
    def check(a, b):
        ta = ip_term(str(ipaddress.ip_address(a)))
        tb = ip_term(str(ipaddress.ip_address(b)))
        assert (ta < tb) == (a < b)
        assert (ta == tb) == (a == b)

    check()


def test_net_limits_vectors():
    """search_ip_range_test.go Test_netLimits: CIDR -> [network,
    broadcast] term-range endpoints (query.py IpCidrQuery uses
    ipaddress.ip_network's network/broadcast addresses)."""
    import ipaddress

    vectors = [
        ("128.0.0.0/1", "128.0.0.0", "255.255.255.255"),
        ("128.0.0.0/7", "128.0.0.0", "129.255.255.255"),
        ("1.1.1.1/8", "1.0.0.0", "1.255.255.255"),
        ("1.2.3.0/24", "1.2.3.0", "1.2.3.255"),
        ("1.2.2.0/23", "1.2.2.0", "1.2.3.255"),
        ("1.2.3.128/25", "1.2.3.128", "1.2.3.255"),
        ("1.2.3.0/25", "1.2.3.0", "1.2.3.127"),
        ("1.2.3.4/31", "1.2.3.4", "1.2.3.5"),
        ("1.2.3.4/32", "1.2.3.4", "1.2.3.4"),
        ("2a00:23c8:7283:ff00:1fa8:0:0:0/80",
         "2a00:23c8:7283:ff00:1fa8::",
         "2a00:23c8:7283:ff00:1fa8:ffff:ffff:ffff"),
    ]
    from bleve_ray.index.build import ip_term

    for cidr, lo, hi in vectors:
        net = ipaddress.ip_network(cidr, strict=False)
        assert str(net.network_address) == lo, cidr
        assert str(net.broadcast_address) == hi, cidr
        # the derived 16-byte terms bound the dictionary range correctly
        assert ip_term(lo) <= ip_term(hi)
