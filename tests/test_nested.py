"""Nested document mappings + same-element scoped search, conformance
with the reference's search_nested_test.go (TestNestedPrefixes,
TestValidNestedMapping, TestNestedConjunctionQuery 1-13,
TestNestedArrayConjunctionQuery) and mapping/document.go:48,235-258."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bleve_ray.index import (
    FieldConfig,
    IndexOptions,
    build_index,
    collect_nested_paths,
    nested_depth,
    new_document_mapping,
    new_nested_document_mapping,
    options_from_mapping,
    validate_root_mapping,
)
from bleve_ray.search import Index


def _company_mapping():
    """createNestedIndexMapping (search_nested_test.go:28-117):
    company{id,name, departments[]{name,budget, employees[]{name,role},
    projects[]{title,status}}, locations[]{city,country}}."""
    company = new_document_mapping()
    txt = lambda: FieldConfig(analyzer="standard")  # noqa: E731
    company.add_field_mapping_at("id", txt())
    company.add_field_mapping_at("name", txt())
    departments = new_nested_document_mapping()
    departments.add_field_mapping_at("name", txt())
    departments.add_field_mapping_at(
        "budget", FieldConfig(field_type="numeric")
    )
    employees = new_nested_document_mapping()
    employees.add_field_mapping_at("name", txt())
    employees.add_field_mapping_at("role", txt())
    departments.add_sub_document_mapping("employees", employees)
    projects = new_nested_document_mapping()
    projects.add_field_mapping_at("title", txt())
    projects.add_field_mapping_at("status", txt())
    departments.add_sub_document_mapping("projects", projects)
    company.add_sub_document_mapping("departments", departments)
    locations = new_nested_document_mapping()
    locations.add_field_mapping_at("city", txt())
    locations.add_field_mapping_at("country", txt())
    company.add_sub_document_mapping("locations", locations)
    root = new_document_mapping()
    root.add_sub_document_mapping("company", company)
    return root


NESTED_PATHS = collect_nested_paths(_company_mapping())


# --------------------------------------------------------------------------
# TestNestedPrefixes vectors (search_nested_test.go:119-306)
# --------------------------------------------------------------------------

F = "company"
DEPTH_VECTORS = [
    ([f"{F}.departments.employees.role",
      f"{F}.departments.employees.name"], (2, 2)),
    ([f"{F}.departments.employees.role",
      f"{F}.departments.employees.name", f"{F}.departments.name"], (1, 2)),
    ([f"{F}.departments.employees.role", f"{F}.locations.city"], (0, 2)),
    ([f"{F}.name", f"{F}.locations.country", f"{F}.locations.city"],
     (0, 1)),
    ([f"{F}.departments.budget", f"{F}.departments.projects.status",
      f"{F}.departments.employees.name"], (1, 2)),
    ([f"{F}.id"], (0, 0)),
    ([], (0, 0)),
    ([f"{F}.id", f"{F}.name", f"{F}.departments.name",
      f"{F}.departments.budget", f"{F}.departments.employees.name",
      f"{F}.departments.employees.role",
      f"{F}.departments.projects.title",
      f"{F}.departments.projects.status", f"{F}.locations.city",
      f"{F}.locations.country"], (0, 2)),
    ([f"{F}.departments.projects.title",
      f"{F}.departments.projects.status"], (2, 2)),
    ([f"{F}.departments.name", f"{F}.locations.country",
      f"{F}.locations.city"], (0, 1)),
]


@pytest.mark.parametrize("fields,want", DEPTH_VECTORS)
def test_nested_depth_vectors(fields, want):
    assert nested_depth(fields, NESTED_PATHS) == want


def test_collect_nested_paths():
    assert sorted(NESTED_PATHS) == [
        "company.departments",
        "company.departments.employees",
        "company.departments.projects",
        "company.locations",
    ]


# --------------------------------------------------------------------------
# TestValidNestedMapping (search_nested_test.go:1164-1216)
# --------------------------------------------------------------------------


def test_valid_nested_mapping():
    nested = new_nested_document_mapping()
    with pytest.raises(ValueError):
        validate_root_mapping(nested)
    with pytest.raises(ValueError):
        validate_root_mapping(new_document_mapping(), {"type1": nested})
    ok = new_document_mapping()
    sub = new_nested_document_mapping()
    sub.add_field_mapping_at("field1", FieldConfig())
    ok.add_sub_document_mapping("nestedField", sub)
    validate_root_mapping(ok)
    validate_root_mapping(new_document_mapping(), {"type1": ok})


# --------------------------------------------------------------------------
# TestNestedConjunctionQuery corpus (search_nested_test.go:330-450)
# --------------------------------------------------------------------------

COMPANY_DOCS = [
    {
        "doc_id": "doc1",
        "company": {
            "id": "c1", "name": "TechCorp",
            "departments": [
                {"name": "Engineering", "budget": 2000000.0,
                 "employees": [{"name": "Alice", "role": "Engineer"},
                               {"name": "Bob", "role": "Manager"}],
                 "projects": [{"title": "Project X", "status": "ongoing"},
                              {"title": "Project Y",
                               "status": "completed"}]},
                {"name": "Sales", "budget": 300000.0,
                 "employees": [{"name": "Eve", "role": "Salesperson"},
                               {"name": "Mallory", "role": "Manager"}],
                 "projects": [{"title": "Project A",
                               "status": "completed"},
                              {"title": "Project B",
                               "status": "ongoing"}]},
            ],
            "locations": [{"city": "Athens", "country": "Greece"},
                          {"city": "Berlin", "country": "USA"}],
        },
    },
    {
        "doc_id": "doc2",
        "company": {
            "id": "c2", "name": "BizInc",
            "departments": [
                {"name": "Marketing", "budget": 800000.0,
                 "employees": [{"name": "Eve", "role": "Marketer"},
                               {"name": "David", "role": "Manager"}],
                 "projects": [{"title": "Project Z", "status": "ongoing"},
                              {"title": "Project W",
                               "status": "planned"}]},
                {"name": "Engineering", "budget": 800000.0,
                 "employees": [{"name": "Frank", "role": "Manager"},
                               {"name": "Grace", "role": "Engineer"}],
                 "projects": [{"title": "Project Alpha",
                               "status": "completed"},
                              {"title": "Project Beta",
                               "status": "ongoing"}]},
            ],
            "locations": [{"city": "Athens", "country": "USA"},
                          {"city": "London", "country": "UK"}],
        },
    },
    {
        "doc_id": "doc3",
        "company": {
            "id": "c3", "name": "WebSolutions",
            "departments": [
                {"name": "HR", "budget": 800000.0,
                 "employees": [{"name": "Eve", "role": "Manager"},
                               {"name": "Frank", "role": "HR"}],
                 "projects": [{"title": "Project Beta",
                               "status": "completed"},
                              {"title": "Project B",
                               "status": "ongoing"}]},
                {"name": "Engineering", "budget": 200000.0,
                 "employees": [{"name": "Heidi",
                                "role": "Support Engineer"},
                               {"name": "Ivan", "role": "Manager"}],
                 "projects": [{"title": "Project Helpdesk",
                               "status": "ongoing"},
                              {"title": "Project FAQ",
                               "status": "completed"}]},
            ],
            "locations": [{"city": "Edinburgh", "country": "UK"},
                          {"city": "London", "country": "Canada"}],
        },
    },
]


@pytest.fixture(scope="module")
def company_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nested")
    src = str(tmp / "companies.parquet")
    pq.write_table(pa.Table.from_pylist(COMPANY_DOCS), src)
    idx_dir = str(tmp / "idx")
    opts = options_from_mapping(
        _company_mapping(),
        doc_id_fields=["doc_id"],
        num_shards=2,
        bucket_bits=8,
        enable_all_field=True,
        index_id_field=True,
    )
    build_index([src], idx_dir, opts)
    return Index.open(idx_dir)


def _ids(res):
    return sorted(h.id for h in res.hits)


def _conj(*clauses):
    return {"query": {"conjuncts": list(clauses)}, "size": 10,
            "sort": ["_id"]}


DEPT = "company.departments"
EMP = f"{DEPT}.employees"
PROJ = f"{DEPT}.projects"
LOC = "company.locations"


def test_nested_conj_dept_name_and_budget(company_index):
    # Test 1: dept "Engineering" AND budget >= 800000 in the SAME dept
    res = company_index.search(_conj(
        {"match": "Engineering", "field": f"{DEPT}.name"},
        {"min": 800000.0, "field": f"{DEPT}.budget"},
    ))
    assert _ids(res) == ["doc1", "doc2"]


def test_nested_conj_employee_and_project(company_index):
    # Test 2: employee "Eve" AND completed project in the SAME dept
    res = company_index.search(_conj(
        {"match": "Eve", "field": f"{EMP}.name"},
        {"match": "completed", "field": f"{PROJ}.status"},
    ))
    assert _ids(res) == ["doc1", "doc3"]


def test_nested_conj_location_pair_and_dept(company_index):
    # Test 3: same-location (Athens AND USA) + an Engineering dept
    res = company_index.search(_conj(
        {"conjuncts": [
            {"match": "USA", "field": f"{LOC}.country"},
            {"match": "Athens", "field": f"{LOC}.city"},
        ]},
        {"match": "Engineering", "field": f"{DEPT}.name"},
    ))
    assert _ids(res) == ["doc2"]


def test_nested_conj_location_and_dept_budget(company_index):
    # Test 4a: Athens+USA AND (Engineering dept with budget > 1M) -> none
    req = _conj(
        {"conjuncts": [
            {"match": "USA", "field": f"{LOC}.country"},
            {"match": "Athens", "field": f"{LOC}.city"},
        ]},
        {"conjuncts": [
            {"match": "Engineering", "field": f"{DEPT}.name"},
            {"min": 1000000.0, "field": f"{DEPT}.budget"},
        ]},
    )
    assert _ids(company_index.search(req)) == []
    # Test 4b: Athens+Greece -> doc1
    req = _conj(
        {"conjuncts": [
            {"match": "Greece", "field": f"{LOC}.country"},
            {"match": "Athens", "field": f"{LOC}.city"},
        ]},
        {"conjuncts": [
            {"match": "Engineering", "field": f"{DEPT}.name"},
            {"min": 1000000.0, "field": f"{DEPT}.budget"},
        ]},
    )
    assert _ids(company_index.search(req)) == ["doc1"]


def test_nested_conj_same_dept_emp_and_project_phrase(company_index):
    # Test 5a: (Frank+Manager same employee) AND ("Project Beta"
    # completed, same project) joined at the SAME department -> none
    req = _conj(
        {"conjuncts": [
            {"match": "Frank", "field": f"{EMP}.name"},
            {"match": "Manager", "field": f"{EMP}.role"},
        ]},
        {"conjuncts": [
            {"match_phrase": "Project Beta", "field": f"{PROJ}.title"},
            {"match": "completed", "field": f"{PROJ}.status"},
        ]},
    )
    assert _ids(company_index.search(req)) == []
    # Test 5b: ... "ongoing" -> doc2
    req = _conj(
        {"conjuncts": [
            {"match": "Frank", "field": f"{EMP}.name"},
            {"match": "Manager", "field": f"{EMP}.role"},
        ]},
        {"conjuncts": [
            {"match_phrase": "Project Beta", "field": f"{PROJ}.title"},
            {"match": "ongoing", "field": f"{PROJ}.status"},
        ]},
    )
    assert _ids(company_index.search(req)) == ["doc2"]


def test_nested_conj_emp_and_location(company_index):
    # Test 6a: (Eve+Manager same employee) AND (London+UK same location)
    req = _conj(
        {"conjuncts": [
            {"match": "Eve", "field": f"{EMP}.name"},
            {"match": "Manager", "field": f"{EMP}.role"},
        ]},
        {"conjuncts": [
            {"match": "UK", "field": f"{LOC}.country"},
            {"match": "London", "field": f"{LOC}.city"},
        ]},
    )
    assert _ids(company_index.search(req)) == []
    # Test 6b: London+Canada -> doc3
    req = _conj(
        {"conjuncts": [
            {"match": "Eve", "field": f"{EMP}.name"},
            {"match": "Manager", "field": f"{EMP}.role"},
        ]},
        {"conjuncts": [
            {"match": "Canada", "field": f"{LOC}.country"},
            {"match": "London", "field": f"{LOC}.city"},
        ]},
    )
    assert _ids(company_index.search(req)) == ["doc3"]


def test_nested_conj_ivan_manager_location(company_index):
    # Test 7a/7b
    def req(country):
        return _conj(
            {"conjuncts": [
                {"match": "Ivan", "field": f"{EMP}.name"},
                {"match": "Manager", "field": f"{EMP}.role"},
            ]},
            {"conjuncts": [
                {"match": country, "field": f"{LOC}.country"},
                {"match": "London", "field": f"{LOC}.city"},
            ]},
        )
    assert _ids(company_index.search(req("UK"))) == []
    assert _ids(company_index.search(req("Canada"))) == ["doc3"]


def test_nested_conj_three_levels(company_index):
    # Test 8: ((Frank+Manager same employee) AND Engineering same dept)
    # AND (London+UK same location) -> doc2
    req = _conj(
        {"conjuncts": [
            {"conjuncts": [
                {"match": "Frank", "field": f"{EMP}.name"},
                {"match": "Manager", "field": f"{EMP}.role"},
            ]},
            {"match": "Engineering", "field": f"{DEPT}.name"},
        ]},
        {"conjuncts": [
            {"match": "UK", "field": f"{LOC}.country"},
            {"match": "London", "field": f"{LOC}.city"},
        ]},
    )
    assert _ids(company_index.search(req)) == ["doc2"]


def test_nested_match_all_and_docid_top_level(company_index):
    # Tests 9-10: match_all / docid return only top-level documents
    res = company_index.search({"query": {"match_all": {}}, "size": 10})
    assert _ids(res) == ["doc1", "doc2", "doc3"]
    res = company_index.search({"query": {"ids": [
        "doc1", "doc2", "doc3",
        "doc2_$company.locations_$0",
        "doc3_$company.departments_$0_$company.departments.employees_$0",
    ]}, "size": 10})
    assert _ids(res) == ["doc1", "doc2", "doc3"]


def test_nested_boolean_filter_and_must(company_index):
    # Test 11: boolean filter-only
    res = company_index.search({"query": {
        "filter": {"match": "Frank", "field": f"{EMP}.name"},
    }, "size": 10})
    assert _ids(res) == ["doc2", "doc3"]
    # Test 12: boolean must with nested scoping
    res = company_index.search({"query": {"must": [
        {"conjuncts": [
            {"match": "Ivan", "field": f"{EMP}.name"},
            {"match": "Manager", "field": f"{EMP}.role"},
        ]},
        {"conjuncts": [
            {"match": "Canada", "field": f"{LOC}.country"},
            {"match": "London", "field": f"{LOC}.city"},
        ]},
    ]}, "size": 10})
    assert _ids(res) == ["doc3"]


def test_nested_all_field_excludes_nested(company_index):
    # Test 13: unfielded (_all) queries match only top-level fields
    res = company_index.search(
        {"query": {"match": "TechCorp", "field": "_all"}, "size": 10}
    )
    assert _ids(res) == ["doc1"]
    res = company_index.search(
        {"query": {"match": "Alice", "field": "_all"}, "size": 10}
    )
    assert _ids(res) == []
    # _all + nested-field conjunction
    res = company_index.search(_conj(
        {"match": "TechCorp", "field": "_all"},
        {"match": "Alice", "field": f"{EMP}.name"},
    ))
    assert _ids(res) == ["doc1"]
    # mixed with deeply nested conjunction (search_nested_test.go:955+)
    res = company_index.search(_conj(
        {"conjuncts": [
            {"conjuncts": [
                {"match": "Frank", "field": f"{EMP}.name"},
                {"match": "Manager", "field": f"{EMP}.role"},
            ]},
            {"match": "Engineering", "field": f"{DEPT}.name"},
        ]},
        {"conjuncts": [
            {"match": "UK", "field": f"{LOC}.country"},
            {"match": "London", "field": f"{LOC}.city"},
        ]},
        {"match": "BizInc", "field": "_all"},
        {"match_all": {}},
    ))
    assert _ids(res) == ["doc2"]
    res = company_index.search(_conj(
        {"conjuncts": [
            {"conjuncts": [
                {"match": "Frank", "field": f"{EMP}.name"},
                {"match": "Manager", "field": f"{EMP}.role"},
            ]},
            {"match": "Engineering", "field": f"{DEPT}.name"},
        ]},
        {"conjuncts": [
            {"match": "UK", "field": f"{LOC}.country"},
            {"match": "London", "field": f"{LOC}.city"},
        ]},
        {"match": "WebSolutions", "field": "_all"},
    ))
    assert _ids(res) == []


# --------------------------------------------------------------------------
# TestNestedArrayConjunctionQuery (search_nested_test.go:981-1162):
# nested list-of-list elements scope like a flat element array
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def groups_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nested_groups")
    people = [
        {"first_name": "Alice", "last_name": "Smith"},
        {"first_name": "Bob", "last_name": "Johnson"},
        {"first_name": "Charlie", "last_name": "Williams"},
        {"first_name": "Diana", "last_name": "Brown"},
    ]
    # doc 1: groups = [[p0,p1],[p2,p3]]; doc 2: groups = [p0..p3]
    # (different Arrow schemas -> two files, like two indexed docs)
    f1 = str(tmp / "doc1.parquet")
    f2 = str(tmp / "doc2.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": "1", "groups": [people[:2], people[2:]]}]), f1)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": "2", "groups": people}]), f2)
    root = new_document_mapping()
    groups = new_nested_document_mapping()
    groups.add_field_mapping_at("first_name", FieldConfig())
    groups.add_field_mapping_at("last_name", FieldConfig())
    root.add_sub_document_mapping("groups", groups)
    idx_dir = str(tmp / "idx")
    opts = options_from_mapping(
        root, doc_id_fields=["doc_id"], num_shards=1, bucket_bits=8
    )
    build_index([f1, f2], idx_dir, opts)
    return Index.open(idx_dir)


@pytest.mark.parametrize("first,last,want", [
    ("Alice", "Johnson", []),
    ("Bob", "Johnson", ["1", "2"]),
    ("Alice", "Williams", []),
    ("Diana", "Brown", ["1", "2"]),
])
def test_nested_array_conjunction(groups_index, first, last, want):
    res = groups_index.search(_conj(
        {"match": first, "field": "groups.first_name"},
        {"match": last, "field": "groups.last_name"},
    ))
    assert _ids(res) == want


def test_nested_leaf_match_and_scopes_one_element(groups_index):
    # match operator=and on ONE nested field: all tokens must sit in the
    # SAME element ("Alice Johnson" spans two people -> no hit)
    res = groups_index.search({"query": {
        "match": "Alice Johnson", "field": "groups.first_name",
        "operator": "and",
    }, "size": 10})
    assert _ids(res) == []
    res = groups_index.search({"query": {
        "match": "Alice Bob", "field": "groups.first_name",
        "operator": "or",
    }, "size": 10})
    assert _ids(res) == ["1", "2"]


def test_nested_scoping_strictly_narrows(company_index):
    """The same-element verifier must REMOVE docs whose clauses match in
    different elements: doc3 has an Engineering dept (200k) and an 800k
    dept (HR) — doc-level AND matches it, nested scoping must not."""
    from bleve_ray.search.nested import NestedVerifier
    from bleve_ray.search.query import parse_query

    req = {"conjuncts": [
        {"match": "Engineering", "field": f"{DEPT}.name"},
        {"min": 800000.0, "field": f"{DEPT}.budget"},
    ]}
    node = parse_query(req)
    v = NestedVerifier(
        company_index.reader, company_index.mapping,
        company_index.reader.options["nested_paths"],
    )
    assert v.needs_filter(node)
    # doc-level search (verifier bypassed): all 3 docs match flattened
    searcher = node.searcher(
        company_index.reader, company_index.mapping,
        __import__("bleve_ray.search.reader", fromlist=["SearchOptions"])
        .SearchOptions(),
    )
    doc_level = searcher.search()
    assert len(doc_level.docnums) == 3
    keep = v.filter(node, doc_level.docnums)
    assert keep.sum() == 2  # doc3 dropped


def test_nested_verifier_depth_matches_mapping(company_index):
    assert sorted(
        company_index.reader.options["nested_paths"]
    ) == sorted(NESTED_PATHS)


def test_nested_highlight_fields_and_facets(company_index):
    """Stretch interaction audit (search_nested_test.go buildReq sets
    Fields ["*"] + Highlight on every request): a scoped nested search
    returns stored fields, fragments over the matched nested element
    field (dotted-path docvalue extraction), and terms facets over
    nested element values."""
    req = _conj(
        {"match": "Engineering", "field": f"{DEPT}.name"},
        {"min": 800000.0, "field": f"{DEPT}.budget"},
    )
    req["fields"] = ["*"]
    req["highlight"] = {"fields": [f"{DEPT}.name"], "style": "html"}
    req["facets"] = {
        "dept_names": {"field": f"{DEPT}.name", "size": 10}
    }
    res = company_index.search(req)
    assert _ids(res) == ["doc1", "doc2"]
    for h in res.hits:
        assert h.fields and "company" in h.fields
        frags = h.fragments.get(f"{DEPT}.name")
        assert frags and any("<mark>" in f and "Engineering" in f
                             for f in frags)
    terms = {
        t["term"]: t["count"]
        for t in res.facets["dept_names"]["terms"]
    }
    # facets count raw docvalues (engine-wide semantics):
    # doc1 contributes Engineering+Sales, doc2 Marketing+Engineering
    assert terms["Engineering"] == 2
    assert terms["Sales"] == 1 and terms["Marketing"] == 1


def test_nested_sort_by_dotted_field(company_index):
    """Sort by a nested numeric field: multi-valued docvalue lists sort
    by their comparable representation without crashing and every doc
    is returned."""
    res = company_index.search({
        "query": {"match_all": {}},
        "size": 10,
        "sort": [f"{DEPT}.budget"],
    })
    assert len(res.hits) == 3


@pytest.fixture(scope="module")
def lineitems_index(ray_session, tmp_path_factory):
    """Single-level nested layout (the fast-path shape): orders with a
    top-level `lineitems` list<struct> column."""
    tmp = tmp_path_factory.mktemp("nested_li")
    rows = []
    rng_flags = ["R", "A", "N"]
    for ok in range(40):
        items = [
            {"l_linenumber": i,
             "l_returnflag": rng_flags[(ok + i) % 3],
             "l_quantity": float((ok * 7 + i * 13) % 50 + 1),
             "l_comment": f"item {i} of order {ok}"}
            for i in range((ok % 5) + 1)
        ]
        rows.append({"o_orderkey": ok, "lineitems": items})
    src = str(tmp / "orders.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    root = new_document_mapping()
    li = new_nested_document_mapping()
    li.add_field_mapping_at("l_returnflag", FieldConfig(analyzer="keyword"))
    li.add_field_mapping_at("l_quantity", FieldConfig(field_type="numeric"))
    li.add_field_mapping_at("l_comment", FieldConfig(analyzer="standard"))
    root.add_sub_document_mapping("lineitems", li)
    idx_dir = str(tmp / "idx")
    build_index([src], idx_dir, options_from_mapping(
        root, doc_id_fields=["o_orderkey"], num_shards=1, bucket_bits=8))
    return Index.open(idx_dir), rows


@pytest.mark.parametrize("clauses", [
    [{"term": "R", "field": "lineitems.l_returnflag"},
     {"min": 40.0, "field": "lineitems.l_quantity"}],
    [{"term": "A", "field": "lineitems.l_returnflag"},
     {"min": 10.0, "max": 30.0, "inclusive_max": True,
      "field": "lineitems.l_quantity"}],
    [{"match": "item order", "field": "lineitems.l_comment",
      "operator": "and"},
     {"min": 45.0, "field": "lineitems.l_quantity"}],
    [{"prefix": "ite", "field": "lineitems.l_comment"},
     {"term": "N", "field": "lineitems.l_returnflag"}],
])
def test_nested_fast_path_matches_general_verifier(lineitems_index,
                                                   clauses):
    """The vectorized single-level fast path (nested_fast.py) must be
    result-identical to the general per-doc verifier AND to a brute
    Python reimplementation over the raw rows."""
    import numpy as np

    from bleve_ray.search.nested import NestedVerifier
    from bleve_ray.search.nested_fast import fast_filter, fast_plan
    from bleve_ray.search.query import parse_query

    idx, rows = lineitems_index
    node = parse_query({"conjuncts": clauses})
    v = NestedVerifier(idx.reader, idx.mapping,
                       idx.reader.options["nested_paths"])
    plan = fast_plan(v, node)
    assert plan is not None, "query should be fast-path eligible"
    all_docs = idx.reader.all_docnums()
    keep_fast = fast_filter(v, plan[0], plan[1], all_docs)
    keep_gen = v.filter(node, all_docs)
    assert keep_fast is not None
    assert np.array_equal(keep_fast, keep_gen)
    # end-to-end search agrees (the hook prefers the fast path)
    res = idx.search({"query": {"conjuncts": clauses}, "size": 100})
    got = sorted(int(h.id) for h in res.hits)
    doc_ids = idx.reader.doc_ids_for(all_docs)
    want = sorted(
        int(doc_ids[i]) for i in np.flatnonzero(keep_gen)
        if _doc_level_match(rows[int(doc_ids[i])], clauses)
    )
    assert got == want


def _doc_level_match(row, clauses):
    """Brute doc-level AND (the pre-verifier superset) — every clause
    satisfied by SOME element; used to mirror what the doc-level search
    feeds the verifier."""
    for c in clauses:
        ok = False
        for it in row["lineitems"]:
            if "term" in c:
                ok |= it["l_returnflag"] == c["term"]
            elif "prefix" in c:
                ok |= any(t.startswith(c["prefix"])
                          for t in it["l_comment"].split())
            elif "match" in c:
                toks = set(it["l_comment"].split())
                qt = c["match"].split()
                ok |= all(t in toks for t in qt) if c.get(
                    "operator") == "and" else any(t in toks for t in qt)
            elif "min" in c or "max" in c:
                v = it["l_quantity"]
                lo_ok = "min" not in c or v >= c["min"]
                hi_ok = "max" not in c or (
                    v <= c["max"] if c.get("inclusive_max") else v < c["max"])
                ok |= lo_ok and hi_ok
        if not ok:
            return False
    return True


def test_nested_fast_path_boolean_must_and_inner_conjunction(
    lineitems_index,
):
    """{"must":[...]} and inner same-path conjunctions flatten into the
    fast plan; results equal the general verifier."""
    import numpy as np

    from bleve_ray.search.nested import NestedVerifier
    from bleve_ray.search.nested_fast import fast_filter, fast_plan
    from bleve_ray.search.query import parse_query

    idx, _rows = lineitems_index
    node = parse_query({"must": [
        {"term": "R", "field": "lineitems.l_returnflag"},
        {"conjuncts": [
            {"min": 20.0, "field": "lineitems.l_quantity"},
            {"max": 45.0, "inclusive_max": True,
             "field": "lineitems.l_quantity"},
        ]},
    ]})
    v = NestedVerifier(idx.reader, idx.mapping,
                       idx.reader.options["nested_paths"])
    plan = fast_plan(v, node)
    assert plan is not None and len(plan[1]) == 3
    all_docs = idx.reader.all_docnums()
    keep_fast = fast_filter(v, plan[0], plan[1], all_docs)
    assert np.array_equal(keep_fast, v.filter(node, all_docs))
