"""Mapping-update validation vectors ported from the reference's
index_update_test.go: TestCompareFieldMapping (:40-293),
TestCompareMappings (:294-400), TestCompareAnalysers (:400-552),
TestCompareDatetimeParsers (:553-719), TestCompareSynonymSources
(:720-818) and the TestDeletedFields end-to-end table (:819-2350).

Pure validation logic -- no Ray session needed."""

import pytest

from bleve_ray.index.mapping_update import (
    FieldMapInfo,
    PathInfo,
    compare_analyzers,
    compare_datetime_parsers,
    compare_field_mapping,
    compare_mappings,
    compare_synonym_sources,
    deleted_fields_mapping,
)
from bleve_ray.index.update import MappingUpdateError, UpdateFieldInfo

# ---------------------------------------------------------------------------
# TestCompareFieldMapping (index_update_test.go:40-293)
# ---------------------------------------------------------------------------

FIELD_VECTORS = [
    # (original, updated, expected UpdateFieldInfo kwargs | None, err)
    (None, None, None, True),
    ({}, None, {"deleted": True}, False),
    ({"type": "text"}, {"type": "datetime"}, None, True),
    (  # synonym source change on text is a no-op
        {"type": "text", "synonym_source": "a"},
        {"type": "text", "synonym_source": "b"},
        {},
        False,
    ),
    (
        {"type": "text", "analyzer": "a"},
        {"type": "text", "analyzer": "b"},
        None,
        True,
    ),
    (
        {"type": "vector", "dims": 128, "similarity": "l2_norm",
         "vector_index_optimized_for": "memory-efficient"},
        {"type": "vector", "dims": 1024, "similarity": "l2_norm",
         "vector_index_optimized_for": "memory-efficient"},
        None,
        True,
    ),
    (
        {"type": "vector_base64", "similarity": "l2_norm", "dims": 128,
         "vector_index_optimized_for": "memory-efficient"},
        {"type": "vector_base64", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "memory-efficient"},
        None,
        True,
    ),
    (
        {"type": "vector", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "memory-efficient"},
        {"type": "vector", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "latency"},
        None,
        True,
    ),
    (
        {"type": "vector", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "memory-efficient", "gpu": False},
        {"type": "vector", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "memory-efficient", "gpu": True},
        None,
        True,
    ),
    (
        {"type": "vector_base64", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "memory-efficient", "gpu": False},
        {"type": "vector_base64", "similarity": "dot_product", "dims": 128,
         "vector_index_optimized_for": "memory-efficient", "gpu": True},
        None,
        True,
    ),
    (
        {"type": "numeric", "include_in_all": True},
        {"type": "numeric", "include_in_all": False},
        None,
        True,
    ),
    (
        {"type": "numeric", "include_term_vectors": False},
        {"type": "numeric", "include_term_vectors": True},
        None,
        True,
    ),
    (
        {"type": "numeric", "skip_freq_norm": True},
        {"type": "numeric", "skip_freq_norm": False},
        None,
        True,
    ),
    (
        {"type": "geopoint", "index": True},
        {"type": "geopoint", "index": False},
        {"index": True, "docvalues": True},
        False,
    ),
    (
        {"type": "numeric", "docvalues": True},
        {"type": "numeric", "docvalues": False},
        {"docvalues": True},
        False,
    ),
    (  # non-text/vector attribute changes on a datetime field: no-op
        {"name": "", "type": "datetime", "analyzer": "a", "store": True,
         "index": False, "include_term_vectors": True,
         "include_in_all": False, "date_format": "a", "docvalues": False,
         "skip_freq_norm": True, "dims": 128,
         "similarity": "dot_product",
         "vector_index_optimized_for": "memory-efficient",
         "synonym_source": "a"},
        {"name": "", "type": "datetime", "analyzer": "b", "store": True,
         "index": False, "include_term_vectors": True,
         "include_in_all": False, "date_format": "a", "docvalues": False,
         "skip_freq_norm": True, "dims": 256, "similarity": "l2_norm",
         "vector_index_optimized_for": "latency",
         "synonym_source": "b"},
        {},
        False,
    ),
]


@pytest.mark.parametrize("ori,upd,want,err", FIELD_VECTORS)
def test_compare_field_mapping(ori, upd, want, err):
    if err:
        with pytest.raises(MappingUpdateError):
            compare_field_mapping(ori, upd)
    else:
        got = compare_field_mapping(ori, upd)
        assert got == UpdateFieldInfo(**want)


# ---------------------------------------------------------------------------
# TestCompareMappings (index_update_test.go:294-400)
# ---------------------------------------------------------------------------

MAPPING_VECTORS = [
    (  # type field change with type mappings present
        {"type_field": "a", "types": {"a": {}, "b": {}}},
        {"type_field": "b", "types": {"a": {}, "b": {}}},
        True,
    ),
    ({"default_type": "a"}, {"default_type": "b"}, True),
    ({"default_analyzer": "a"}, {"default_analyzer": "b"}, False),
    (
        {"default_datetime_parser": "a"},
        {"default_datetime_parser": "b"},
        False,
    ),
    (
        {"default_synonym_source": "a"},
        {"default_synonym_source": "b"},
        False,
    ),
    ({"default_field": "a"}, {"default_field": "b"}, False),
    ({"index_dynamic": True}, {"index_dynamic": False}, True),
    ({"store_dynamic": False}, {"store_dynamic": True}, True),
    ({"docvalues_dynamic": True}, {"docvalues_dynamic": False}, True),
]


@pytest.mark.parametrize("ori,upd,err", MAPPING_VECTORS)
def test_compare_mappings(ori, upd, err):
    if err:
        with pytest.raises(MappingUpdateError):
            compare_mappings(ori, upd)
    else:
        compare_mappings(ori, upd)


# ---------------------------------------------------------------------------
# TestCompareAnalysers (index_update_test.go:400-552)
# ---------------------------------------------------------------------------

def _text_paths():
    paths = {}
    for p in ("a", "b", "c"):
        pi = PathInfo(path=p, parent_path="")
        pi.field_map_info = [FieldMapInfo(field_mapping={"type": "text"})]
        paths[p] = pi
    return paths


def _im_with_field_analyzers(custom_3xbla):
    """NewIndexMapping with text fields a/b/c where b's doc mapping uses
    the custom analyzer 3xbla and c uses the built-in simple."""
    return {
        "default_analyzer": "standard",
        "default_mapping": {
            "enabled": True,
            "dynamic": True,
            "properties": {
                "a": {"enabled": True, "fields": [{"type": "text"}]},
                "b": {
                    "enabled": True,
                    "default_analyzer": "3xbla",
                    "fields": [{"type": "text"}],
                },
                "c": {
                    "enabled": True,
                    "default_analyzer": "simple",
                    "fields": [{"type": "text"}],
                },
            },
        },
        "analysis": {"analyzers": {"3xbla": custom_3xbla}},
    }


def test_compare_analyzers_identical():
    spec = {
        "type": "custom",
        "tokenizer": "whitespace",
        "token_filters": ["to_lower", "stop_en"],
    }
    ori = _im_with_field_analyzers(dict(spec))
    upd = _im_with_field_analyzers(dict(spec))
    compare_analyzers(_text_paths(), _text_paths(), ori, upd)


def test_compare_analyzers_changed_definition():
    ori = _im_with_field_analyzers(
        {
            "type": "custom",
            "tokenizer": "whitespace",
            "token_filters": ["to_lower", "stop_en"],
        }
    )
    upd = _im_with_field_analyzers(
        {
            "type": "custom",
            "tokenizer": "letter",
            "token_filters": ["to_lower", "stop_en"],
        }
    )
    with pytest.raises(MappingUpdateError, match="changed while being used"):
        compare_analyzers(_text_paths(), _text_paths(), ori, upd)


# ---------------------------------------------------------------------------
# TestCompareDatetimeParsers (index_update_test.go:553-719)
# ---------------------------------------------------------------------------

def _dt_paths():
    paths = {}
    for p, fmt in (("a", ""), ("b", "customDT"), ("c", "")):
        fm = {"type": "datetime"}
        if fmt:
            fm["date_format"] = fmt
        pi = PathInfo(path=p, parent_path="")
        pi.field_map_info = [FieldMapInfo(field_mapping=fm)]
        paths[p] = pi
    return paths


def _im_with_dt_parser(layouts):
    return {
        "default_datetime_parser": "dateTimeOptional",
        "analysis": {
            "date_time_parsers": {
                "customDT": {"type": "sanitizedgo", "layouts": layouts}
            }
        },
    }


def test_compare_datetime_parsers_identical():
    layouts = ["02/01/2006 15:04:05", "2006/01/02 3:04PM"]
    compare_datetime_parsers(
        _dt_paths(),
        _dt_paths(),
        _im_with_dt_parser(list(layouts)),
        _im_with_dt_parser(list(layouts)),
    )


def test_compare_datetime_parsers_changed():
    with pytest.raises(MappingUpdateError, match="changed while being used"):
        compare_datetime_parsers(
            _dt_paths(),
            _dt_paths(),
            _im_with_dt_parser(["02/01/2006 15:04:05", "2006/01/02 3:04PM"]),
            _im_with_dt_parser(["02/01/2006 15:04:05", "2006/01/02"]),
        )


# ---------------------------------------------------------------------------
# TestCompareSynonymSources (index_update_test.go:720-818)
# ---------------------------------------------------------------------------

def _im_with_synonym_sources(col2):
    return {
        "analysis": {
            "synonym_sources": {
                "syn1": {"collection": "col1", "analyzer": "simple"},
                "syn2": {"collection": col2, "analyzer": "standard"},
            }
        }
    }


def test_compare_synonym_sources_identical():
    compare_synonym_sources(
        _im_with_synonym_sources("col2"), _im_with_synonym_sources("col2")
    )


def test_compare_synonym_sources_changed():
    with pytest.raises(MappingUpdateError, match="synonym sources"):
        compare_synonym_sources(
            _im_with_synonym_sources("col2"),
            _im_with_synonym_sources("col3"),
        )


# ---------------------------------------------------------------------------
# TestDeletedFields (index_update_test.go:819-2350)
# ---------------------------------------------------------------------------

def _prop(ftype="numeric", **field_kwargs):
    """A property holding one anonymous field mapping."""
    return {
        "enabled": True,
        "dynamic": False,
        "fields": [{"type": ftype, **field_kwargs}],
    }


def _doc(properties=None, enabled=True, dynamic=False, **kwargs):
    dm = {"enabled": enabled, "dynamic": dynamic, **kwargs}
    if properties is not None:
        dm["properties"] = properties
    return dm


def _im(types=None, default_mapping=None, **kwargs):
    im = {
        "types": types or {},
        "default_mapping": default_mapping
        if default_mapping is not None
        else _doc(),
        "index_dynamic": False,
        "store_dynamic": False,
        "docvalues_dynamic": False,
    }
    im.update(kwargs)
    return im


def test_deleted_fields_default_analyzer_index_dynamic():
    """Changed default analyzer with index dynamic => error."""
    ori = _im(
        default_mapping=_doc(enabled=False),
        default_analyzer="standard",
        index_dynamic=True,
    )
    upd = _im(
        default_mapping=_doc(enabled=False),
        default_analyzer="simple",
        index_dynamic=True,
    )
    with pytest.raises(MappingUpdateError, match="default analyser"):
        deleted_fields_mapping(ori, upd)


def test_deleted_fields_mapping_analyzer_index_dynamic():
    """Changed DEFAULT MAPPING analyzer under a dynamic mapping."""
    ori = _im(
        default_mapping=_doc(dynamic=True, default_analyzer="standard"),
        index_dynamic=True,
    )
    upd = _im(
        default_mapping=_doc(dynamic=True, default_analyzer="simple"),
        index_dynamic=True,
    )
    with pytest.raises(
        MappingUpdateError, match="analyser has been changed for a dynamic"
    ):
        deleted_fields_mapping(ori, upd)


def test_deleted_fields_default_dt_parser_index_dynamic():
    ori = _im(
        default_mapping=_doc(enabled=False),
        default_datetime_parser="percentstyle",
        index_dynamic=True,
    )
    upd = _im(
        default_mapping=_doc(enabled=False),
        default_datetime_parser="sanitizedgo",
        index_dynamic=True,
    )
    with pytest.raises(MappingUpdateError, match="default datetime parser"):
        deleted_fields_mapping(ori, upd)


def _three_mapping_im(a_kwargs, b_kwargs, c_kwargs):
    """map1.a + map2.b in types, c in the default mapping."""
    return _im(
        types={
            "map1": _doc({"a": _prop(**a_kwargs)}),
            "map2": _doc({"b": _prop(**b_kwargs)}),
        },
        default_mapping=_doc({"c": _prop(**c_kwargs)}),
    )


def test_deleted_fields_no_changes():
    ori = _three_mapping_im(
        {"index": True}, {"index": True}, {"index": True}
    )
    upd = _three_mapping_im(
        {"index": True}, {"index": True}, {"index": True}
    )
    assert deleted_fields_mapping(ori, upd) == {}


def test_deleted_fields_disabled_default_mapping_changes_ignored():
    """Disabled default mapping may change freely (its paths are not
    walked)."""
    ori = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"b": _prop(index=True)}),
        },
        default_mapping=_doc({"c": _prop(index=True)}, enabled=False),
    )
    upd = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"b": _prop(index=True)}),
        },
        default_mapping=_doc({"d": _prop(index=True)}, enabled=False),
    )
    assert deleted_fields_mapping(ori, upd) == {}


def test_deleted_fields_new_type_mapping_property():
    """map2's property renamed b->c => new property => error."""
    ori = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"b": _prop(index=True)}),
        }
    )
    upd = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"c": _prop(index=True)}),
        }
    )
    with pytest.raises(MappingUpdateError, match="new properties"):
        deleted_fields_mapping(ori, upd)


def test_deleted_fields_new_default_mapping_property():
    ori = _im(default_mapping=_doc({"a": _prop(index=True)}))
    upd = _im(default_mapping=_doc({"b": _prop(index=True)}))
    with pytest.raises(MappingUpdateError, match="new properties"):
        deleted_fields_mapping(ori, upd)


def test_deleted_fields_removed_type_mapping_with_dynamic():
    """Fully removed type mapping while turning index_dynamic on."""
    ori = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"b": _prop(index=True)}),
        },
        default_mapping=_doc({"c": _prop(index=True)}),
    )
    upd = _im(
        types={"map1": _doc({"a": _prop(index=True)})},
        default_mapping=_doc({"c": _prop(index=True)}),
        index_dynamic=True,
    )
    with pytest.raises(MappingUpdateError):
        deleted_fields_mapping(ori, upd)


def test_deleted_fields_index_drop_in_type_mapping():
    """map2.b index true->false => {'b': index+docvalues}."""
    ori = _three_mapping_im(
        {"index": True}, {"index": True}, {"index": True}
    )
    upd = _three_mapping_im(
        {"index": True}, {"index": False}, {"index": True}
    )
    assert deleted_fields_mapping(ori, upd) == {
        "b": UpdateFieldInfo(index=True, docvalues=True)
    }


def test_deleted_fields_two_paths_same_field_matching():
    """map1.a and map2.a both drop index => one consolidated entry."""
    def build(index_flag):
        return _im(
            types={
                "map1": _doc({"a": _prop(index=index_flag)}),
                "map2": _doc({"a": _prop(index=index_flag)}),
            },
            default_mapping=_doc({"b": _prop(index=True)}),
        )

    assert deleted_fields_mapping(build(True), build(False)) == {
        "a": UpdateFieldInfo(index=True, docvalues=True)
    }


def test_deleted_fields_two_paths_same_field_conflicting():
    """Only map1.a drops index while map2.a keeps it => conflict."""
    ori = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"a": _prop(index=True)}),
        },
        default_mapping=_doc({"b": _prop(index=True)}),
    )
    upd = _im(
        types={
            "map1": _doc({"a": _prop(index=False)}),
            "map2": _doc({"a": _prop(index=True)}),
        },
        default_mapping=_doc({"b": _prop(index=True)}),
    )
    with pytest.raises(
        MappingUpdateError, match="multiple mappings point to the same"
    ):
        deleted_fields_mapping(ori, upd)


def test_deleted_fields_composite_drops():
    """One index drop, one store drop, one docvalues drop and one full
    property delete across type + default mappings."""
    ori = _im(
        types={
            "map1": _doc({"a": _prop(index=True)}),
            "map2": _doc({"b": _prop(store=True)}),
            "map3": _doc({"c": _prop(docvalues=True)}),
        },
        default_mapping=_doc(
            {"d": _prop(index=True, store=True, docvalues=True)}
        ),
    )
    upd = _im(
        types={
            "map1": _doc({"a": _prop(index=False)}),
            "map2": _doc({"b": _prop(store=False)}),
            "map3": _doc({"c": _prop(docvalues=False)}),
        },
        default_mapping=_doc({}),
    )
    assert deleted_fields_mapping(ori, upd) == {
        "a": UpdateFieldInfo(index=True, docvalues=True),
        "b": UpdateFieldInfo(store=True),
        "c": UpdateFieldInfo(docvalues=True),
        "d": UpdateFieldInfo(deleted=True),
    }


# ---------------------------------------------------------------------------
# TestIndexUpdateNestedMapping (index_update_test.go:3122-3250): the
# nested flag is frozen across updates, at every depth of the tree.
# ---------------------------------------------------------------------------

def _text_field():
    return {
        "type": "text",
        "store": True,
        "index": True,
        "include_term_vectors": True,
        "include_in_all": True,
        "docvalues": True,
    }


def _numeric_field():
    return {
        "type": "number",
        "store": True,
        "index": True,
        "include_in_all": True,
        "docvalues": True,
    }


def _company_mapping(
    nested_employees, nested_departments, nested_projects, nested_locations
):
    """createCompanyMapping: note the reference's inverted flags for
    employees/projects (nested when the flag is FALSE)."""

    def dm(nested=False, **kw):
        d = {"enabled": True, "dynamic": True, **kw}
        if nested:
            d["nested"] = True
        return d

    dept = dm(
        nested=nested_departments,
        properties={
            "name": dm(fields=[_text_field()]),
            "budget": dm(fields=[_numeric_field()]),
            "employees": dm(
                nested=not nested_employees,
                properties={
                    "name": dm(fields=[_text_field()]),
                    "role": dm(fields=[_text_field()]),
                },
            ),
            "projects": dm(
                nested=not nested_projects,
                properties={
                    "title": dm(fields=[_text_field()]),
                    "status": dm(fields=[_text_field()]),
                },
            ),
        },
    )
    company = dm(
        properties={
            "id": dm(fields=[_text_field()]),
            "name": dm(fields=[_text_field()]),
            "departments": dept,
            "locations": dm(
                nested=nested_locations,
                properties={
                    "address": dm(fields=[_text_field()]),
                    "city": dm(fields=[_text_field()]),
                },
            ),
        }
    )
    return {
        "type_field": "_type",
        "default_type": "_default",
        "default_analyzer": "standard",
        "index_dynamic": True,
        "store_dynamic": True,
        "docvalues_dynamic": True,
        "default_mapping": dm(properties={"company": company}),
    }


NESTED_UPDATE_VECTORS = [
    # (ori flags, upd flags, err)
    ((False, False, False, False), (True, True, True, True), True),
    ((False, False, False, False), (True, False, True, False), True),
    ((False, False, False, False), (True, True, True, False), True),
    ((False, True, False, True), (False, False, True, True), True),
    ((True, True, True, True), (False, False, False, False), True),
    ((True, False, True, False), (True, True, True, True), True),
    ((True, True, True, True), (True, False, True, False), True),
    ((False, False, False, False), (False, False, False, False), False),
    ((True, True, True, True), (True, True, True, True), False),
]


@pytest.mark.parametrize("ori_flags,upd_flags,err", NESTED_UPDATE_VECTORS)
def test_nested_mapping_update(ori_flags, upd_flags, err):
    ori = _company_mapping(*ori_flags)
    upd = _company_mapping(*upd_flags)
    if err:
        with pytest.raises(MappingUpdateError, match="nested property"):
            deleted_fields_mapping(ori, upd)
    else:
        assert deleted_fields_mapping(ori, upd) == {}


# ---------------------------------------------------------------------------
# Analyzer-for-path resolution vectors (mapping/mapping_test.go:
# TestMappingForPath:314, TestDefaultAnalyzerInheritance:1145,
# TestWrongAnalyzerSearchableAs:1156)
# ---------------------------------------------------------------------------

from bleve_ray.index.mapping_update import (  # noqa: E402
    _default_analyzer_name,
    analyzer_name_for_path,
)


def test_mapping_for_path():
    en_field = {"type": "text", "analyzer": "en"}
    custom = {"type": "text", "analyzer": "xyz", "name": "nameCustom"}
    custom_x = {"type": "text", "analyzer": "analyzerx"}
    doc_a = {
        "enabled": True,
        "dynamic": True,
        "properties": {
            "name": {"enabled": True, "fields": [en_field]},
            "author": {"enabled": True, "fields": [en_field, custom]},
            "child": {
                "enabled": True,
                "properties": {
                    "desc": {"enabled": True, "fields": [custom_x]}
                },
            },
        },
    }
    im = {
        "types": {"a": doc_a},
        "default_mapping": {"enabled": True, "dynamic": True},
        "default_analyzer": "standard",
    }
    assert analyzer_name_for_path(im, "name") == "en"
    assert analyzer_name_for_path(im, "nameCustom") == "xyz"
    assert analyzer_name_for_path(im, "child.desc") == "analyzerx"


def test_default_analyzer_inheritance():
    doc = {
        "enabled": True,
        "default_analyzer": "xyz",
        "properties": {
            "field": {"enabled": True, "fields": [{"type": "text"}]}
        },
    }
    assert _default_analyzer_name(doc, ["field"]) == "xyz"


def test_wrong_analyzer_searchable_as():
    """A field whose name overrides its property path ('geo.accuracy'
    under property 'geo') resolves at the overridden full path."""
    field = {"type": "text", "analyzer": "xyz", "name": "geo.accuracy"}
    nested = {
        "enabled": True,
        "properties": {"accuracy": {"enabled": True, "fields": [field]}},
    }
    doc = {"enabled": True, "properties": {"geo": nested}}
    im = {
        "types": {"brewery": doc},
        "default_mapping": {"enabled": True, "dynamic": True},
        "default_analyzer": "standard",
    }
    assert analyzer_name_for_path(im, "geo.geo.accuracy") == "xyz"
