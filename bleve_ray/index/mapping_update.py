"""Mapping-granularity live-update validation (reference index_update.go).

The coarse per-index validator in :mod:`bleve_ray.index.update` guards the
engine's own ``IndexOptions``.  This module implements the reference's
FULL mapping-tree comparison over the bleve JSON mapping shape
(``mapping.IndexMappingImpl`` / ``DocumentMapping`` / ``FieldMapping``
dicts, Go zero values for missing keys):

- ``compare_field_mapping``  — index_update.go:476-566
- ``compare_mappings``       — index_update.go:126-165
- ``check_updated_mapping``  — index_update.go:169-211
- ``add_path_info``          — index_update.go:213-258
- ``compare_analyzers`` / ``compare_datetime_parsers`` /
  ``compare_synonym_sources`` / ``compare_analyzer_subcomponents``
  — index_update.go:297-400
- ``deleted_fields_mapping`` — index_update.go:46-124 DeletedFields

Mappings are plain dicts in bleve's JSON form::

    {"types": {...}, "default_mapping": {...}, "type_field": "_type",
     "default_type": "_default", "default_analyzer": "...",
     "default_datetime_parser": "...", "index_dynamic": bool,
     "store_dynamic": bool, "docvalues_dynamic": bool,
     "scoring_model": "", "analysis": {"analyzers": {...}, ...}}

Every rule, error condition and message mirrors the reference so the
index_update_test.go vectors lock behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from .update import MappingUpdateError, UpdateFieldInfo

__all__ = [
    "compare_field_mapping",
    "compare_mappings",
    "check_updated_mapping",
    "add_path_info",
    "compare_analyzers",
    "compare_datetime_parsers",
    "compare_synonym_sources",
    "compare_analyzer_subcomponents",
    "deleted_fields_mapping",
    "PathInfo",
    "FieldMapInfo",
]


# ---------------------------------------------------------------------------
# field-level compare (index_update.go:476-566 compareFieldMapping)
# ---------------------------------------------------------------------------

def compare_field_mapping(
    original: Optional[dict], updated: Optional[dict]
) -> Optional[UpdateFieldInfo]:
    """Compare two FieldMapping dicts; return the implied data drops or
    raise :class:`MappingUpdateError` when the change cannot be honoured
    by persisted segments."""
    rv = UpdateFieldInfo()

    if updated is None:
        if original is not None and not original.get("include_in_all", False):
            rv.deleted = True
            return rv
        elif original is None:
            raise MappingUpdateError("both field mappings cannot be nil")
        raise MappingUpdateError("deleted field present in '_all' field")
    elif original is None:
        raise MappingUpdateError(
            "matching field not found in original index mapping"
        )

    o = lambda k, d=None: original.get(k, d)  # noqa: E731
    u = lambda k, d=None: updated.get(k, d)  # noqa: E731

    if o("type", "") != u("type", ""):
        raise MappingUpdateError("field type cannot be updated")
    ftype = o("type", "")
    if ftype == "text":
        if o("analyzer", "") != u("analyzer", ""):
            raise MappingUpdateError(
                "analyzer cannot be updated for text fields"
            )
    if ftype == "datetime":
        if o("date_format", "") != u("date_format", ""):
            raise MappingUpdateError(
                "dateFormat cannot be updated for datetime fields"
            )
    if ftype in ("vector", "vector_base64"):
        if o("dims", 0) != u("dims", 0):
            raise MappingUpdateError(
                "dimensions cannot be updated for vector and "
                "vector_base64 fields"
            )
        if o("similarity", "") != u("similarity", ""):
            raise MappingUpdateError(
                "similarity cannot be updated for vector and "
                "vector_base64 fields"
            )
        if o("vector_index_optimized_for", "") != u(
            "vector_index_optimized_for", ""
        ):
            raise MappingUpdateError(
                "vectorIndexOptimizedFor cannot be updated for vector "
                "and vector_base64 fields"
            )
        if o("gpu", False) != u("gpu", False):
            raise MappingUpdateError(
                "gpu cannot be updated for vector and vector_base64 fields"
            )
    if o("include_in_all", False) != u("include_in_all", False):
        raise MappingUpdateError("includeInAll cannot be changed")
    if o("include_term_vectors", False) != u("include_term_vectors", False):
        raise MappingUpdateError("includeTermVectors cannot be changed")
    if o("skip_freq_norm", False) != u("skip_freq_norm", False):
        raise MappingUpdateError("skipFreqNorm cannot be changed")

    # store may only narrow, and not while the field feeds '_all'
    if o("store", False) != u("store", False):
        if u("store", False):
            raise MappingUpdateError(
                "store cannot be changed from false to true"
            )
        elif u("include_in_all", False):
            raise MappingUpdateError(
                "store cannot be changed if field present in `_all' field"
            )
        rv.store = True

    if o("index", False) != u("index", False):
        if u("index", False):
            raise MappingUpdateError(
                "index cannot be changed from false to true"
            )
        elif u("include_in_all", False):
            raise MappingUpdateError(
                "index cannot be changed if field present in `_all' field"
            )
        rv.index = True
        rv.docvalues = True

    if o("docvalues", False) != u("docvalues", False):
        if u("docvalues", False):
            raise MappingUpdateError(
                "docvalues cannot be changed from false to true"
            )
        elif u("include_in_all", False):
            raise MappingUpdateError(
                "docvalues cannot be changed if field present in "
                "`_all' field"
            )
        rv.docvalues = True

    return rv


# ---------------------------------------------------------------------------
# top-level mapping compare (index_update.go:126-165 compareMappings)
# ---------------------------------------------------------------------------

def compare_mappings(ori: dict, upd: dict) -> None:
    if ori.get("type_field", "") != upd.get("type_field", "") and (
        ori.get("types") or upd.get("types")
    ):
        raise MappingUpdateError(
            "type field cannot be changed when type mappings are present"
        )
    if ori.get("default_type", "") != upd.get("default_type", ""):
        raise MappingUpdateError("default type cannot be changed")
    if ori.get("index_dynamic", False) != upd.get("index_dynamic", False):
        raise MappingUpdateError("index dynamic cannot be changed")
    if ori.get("store_dynamic", False) != upd.get("store_dynamic", False):
        raise MappingUpdateError("store dynamic cannot be changed")
    if ori.get("docvalues_dynamic", False) != upd.get(
        "docvalues_dynamic", False
    ):
        raise MappingUpdateError("docvalues dynamic cannot be changed")
    if ori.get("default_analyzer", "") != upd.get(
        "default_analyzer", ""
    ) and upd.get("index_dynamic", False):
        raise MappingUpdateError(
            "default analyser cannot be changed if index dynamic is true"
        )
    if ori.get("default_datetime_parser", "") != upd.get(
        "default_datetime_parser", ""
    ) and upd.get("index_dynamic", False):
        raise MappingUpdateError(
            "default datetime parser cannot be changed if index dynamic "
            "is true"
        )
    # scoring model may move between "", tf-idf and bm25 only
    o_sm, u_sm = ori.get("scoring_model", ""), upd.get("scoring_model", "")
    if o_sm != u_sm:
        legal = ("", "tf-idf", "bm25")
        if o_sm not in legal or u_sm not in legal:
            raise MappingUpdateError(
                'scoring model can only be changed between "", '
                '"tf-idf" and "bm25"'
            )


# ---------------------------------------------------------------------------
# no-new-mappings check (index_update.go:169-211 checkUpdatedMapping)
# ---------------------------------------------------------------------------

def check_updated_mapping(
    ori: Optional[dict], upd: Optional[dict]
) -> None:
    if ori is None:
        if upd is None or not upd.get("enabled", False):
            return
        raise MappingUpdateError(
            "updated index mapping contains new properties"
        )
    if upd is None or not upd.get("enabled", False):
        return
    if ori.get("nested", False) != upd.get("nested", False):
        raise MappingUpdateError("nested property cannot be changed")
    for name, upd_dm in (upd.get("properties") or {}).items():
        check_updated_mapping(
            (ori.get("properties") or {}).get(name), upd_dm
        )
    ori_names = {
        fm.get("name", "") for fm in (ori.get("fields") or [])
    }
    for upd_fm in upd.get("fields") or []:
        if upd_fm.get("name", "") not in ori_names:
            raise MappingUpdateError(
                "updated index mapping contains new fields"
            )


# ---------------------------------------------------------------------------
# path consolidation (index_update.go:213-258 addPathInfo)
# ---------------------------------------------------------------------------

@dataclass
class FieldMapInfo:
    field_mapping: dict
    root_name: str = ""
    parent: Optional["PathInfo"] = None
    analyzer: str = ""
    datetime_parser: str = ""


@dataclass
class PathInfo:
    field_map_info: List[FieldMapInfo] = dc_field(default_factory=list)
    dynamic: bool = False
    analyser: str = ""
    path: str = ""
    parent_path: str = ""


def _decode_path(path: str) -> List[str]:
    # Go strings.Split semantics: "" -> [""]
    return path.split(".")


def _default_analyzer_name(dm: dict, path_elems: List[str]) -> str:
    current = dm
    rv = current.get("default_analyzer", "")
    for elem in path_elems:
        current = (current.get("properties") or {}).get(elem)
        if current is None:
            break
        if current.get("default_analyzer", ""):
            rv = current["default_analyzer"]
    return rv


def _field_described_by_path(dm: dict, path: str) -> Optional[dict]:
    elems = _decode_path(path)
    props = dm.get("properties") or {}
    if len(elems) > 1:
        sub = props.get(elems[0])
        if sub is not None:
            return _field_described_by_path(sub, ".".join(elems[1:]))
    for prop_name, sub in props.items():
        if prop_name == path:
            for f in sub.get("fields") or []:
                if f.get("name", "") in ("", path):
                    return f
    for prop_name, sub in props.items():
        if prop_name != path:
            for f in sub.get("fields") or []:
                if f.get("name", "") == path:
                    return f
    return None


def _document_mapping_for_path(dm: dict, path: str) -> Optional[dict]:
    current = dm
    for elem in _decode_path(path):
        sub = (current.get("properties") or {}).get(elem)
        if sub is None:
            return None
        current = sub
    return current


def analyzer_name_for_path(im: dict, path: str) -> str:
    """mapping/index.go:426-465 AnalyzerNameForPath resolution order."""
    for dm in (im.get("types") or {}).values():
        f = _field_described_by_path(dm, path)
        if f is not None and f.get("analyzer", ""):
            return f["analyzer"]
    default_mapping = im.get("default_mapping") or {}
    pm = _document_mapping_for_path(default_mapping, path)
    if pm is not None:
        fields = pm.get("fields") or []
        if fields and fields[0].get("analyzer", ""):
            return fields[0]["analyzer"]
    elems = _decode_path(path)
    for dm in (im.get("types") or {}).values():
        if dm.get("enabled", False):
            rv = _default_analyzer_name(dm, elems)
            if rv:
                return rv
    if default_mapping.get("enabled", False):
        rv = _default_analyzer_name(default_mapping, elems)
        if rv:
            return rv
    return im.get("default_analyzer", "")


def add_path_info(
    paths: Dict[str, PathInfo],
    name: str,
    dm: dict,
    im: dict,
    parent: Optional[PathInfo],
    root_name: str,
) -> None:
    if not dm.get("enabled", False):
        return
    if name in paths:
        p_info = paths[name]
    else:
        p_info = PathInfo()
        p_info.dynamic = dm.get("dynamic", False) and im.get(
            "index_dynamic", False
        )
        p_info.analyser = analyzer_name_for_path(im, name)
    p_info.dynamic = (
        p_info.dynamic or dm.get("dynamic", False)
    ) and im.get("index_dynamic", False)
    p_info.path = name
    if parent is not None:
        p_info.parent_path = parent.path
    for c_name, c_mapping in (dm.get("properties") or {}).items():
        path_name = c_name if not name else f"{name}.{c_name}"
        add_path_info(paths, path_name, c_mapping, im, p_info, root_name)
    for f_map in dm.get("fields") or []:
        p_info.field_map_info.append(
            FieldMapInfo(
                field_mapping=f_map, root_name=root_name, parent=p_info
            )
        )
    paths[name] = p_info


# ---------------------------------------------------------------------------
# custom-component compares (index_update.go:297-400)
# ---------------------------------------------------------------------------

def _custom(im: dict, kind: str) -> dict:
    return (im.get("analysis") or {}).get(kind) or {}


def compare_analyzers(
    ori_paths: Dict[str, PathInfo],
    upd_paths: Dict[str, PathInfo],
    ori: dict,
    upd: dict,
) -> None:
    """Analyzers IN USE by text fields whose custom definitions differ
    (or appear anew) reject the update; built-ins are not compared."""

    def extract(paths, custom_analyzers, analyzers, im):
        for path, info in paths.items():
            for f_info in info.field_map_info:
                if f_info.field_mapping.get("type", "") == "text":
                    name = analyzer_name_for_path(im, path)
                    f_info.analyzer = name
                    if name in custom_analyzers:
                        analyzers[name] = custom_analyzers[name]

    ori_analyzers: dict = {}
    upd_analyzers: dict = {}
    extract(ori_paths, _custom(ori, "analyzers"), ori_analyzers, ori)
    extract(upd_paths, _custom(upd, "analyzers"), upd_analyzers, upd)
    for name, an_upd in upd_analyzers.items():
        if name in ori_analyzers:
            if an_upd != ori_analyzers[name]:
                raise MappingUpdateError(
                    f"analyser {name} changed while being used by fields"
                )
        else:
            raise MappingUpdateError(
                f"analyser {name} newly added to an existing field"
            )


def compare_datetime_parsers(
    ori_paths: Dict[str, PathInfo],
    upd_paths: Dict[str, PathInfo],
    ori: dict,
    upd: dict,
) -> None:
    def extract(paths, custom_parsers, parsers, im):
        for _, info in paths.items():
            for f_info in info.field_map_info:
                if f_info.field_mapping.get("type", "") == "datetime":
                    name = f_info.field_mapping.get("date_format", "")
                    if not name:
                        name = im.get("default_datetime_parser", "")
                    f_info.datetime_parser = name
                    if name in custom_parsers:
                        parsers[name] = custom_parsers[name]

    ori_parsers: dict = {}
    upd_parsers: dict = {}
    extract(
        ori_paths, _custom(ori, "date_time_parsers"), ori_parsers, ori
    )
    extract(
        upd_paths, _custom(upd, "date_time_parsers"), upd_parsers, upd
    )
    for name, dt_upd in upd_parsers.items():
        if name in ori_parsers:
            if dt_upd != ori_parsers[name]:
                raise MappingUpdateError(
                    f"datetime parser {name} changed while being used "
                    "by fields"
                )
        else:
            raise MappingUpdateError(
                f"datetime parser {name} added to an existing field"
            )


def compare_synonym_sources(ori: dict, upd: dict) -> None:
    if _custom(ori, "synonym_sources") != _custom(upd, "synonym_sources"):
        raise MappingUpdateError("synonym sources cannot be changed")


def compare_analyzer_subcomponents(ori: dict, upd: dict) -> None:
    for kind, label in (
        ("char_filters", "char filters"),
        ("token_filters", "token filters"),
        ("token_maps", "token maps"),
        ("tokenizers", "tokenizers"),
    ):
        if _custom(ori, kind) != _custom(upd, kind):
            raise MappingUpdateError(f"{label} cannot be changed")


# ---------------------------------------------------------------------------
# per-path field reconciliation (index_update.go:402-474)
# ---------------------------------------------------------------------------

def _validate_field_info(
    new_info: UpdateFieldInfo,
    f_info: Dict[str, UpdateFieldInfo],
    ori: PathInfo,
    ori_fmap_info: FieldMapInfo,
) -> None:
    field_name = ori_fmap_info.field_mapping.get("name", "")
    if not field_name:
        field_name = ori_fmap_info.parent.path
    if not ori_fmap_info.parent.parent_path:
        name = field_name
    else:
        name = f"{ori_fmap_info.parent.parent_path}.{field_name}"
    if new_info.any() and ori.dynamic:
        raise MappingUpdateError(
            "updated field is under a dynamic property"
        )
    if name in f_info:
        if f_info[name] != new_info:
            raise MappingUpdateError(
                "updated field impossible to verify because multiple "
                "mappings point to the same field name"
            )
    else:
        f_info[name] = new_info


def _add_field_info(
    f_info: Dict[str, UpdateFieldInfo],
    ori: PathInfo,
    upd: Optional[PathInfo],
) -> None:
    if upd is None:
        for ori_fmap in ori.field_map_info:
            info = compare_field_mapping(ori_fmap.field_mapping, None)
            _validate_field_info(info, f_info, ori, ori_fmap)
        return
    if upd.dynamic and ori.analyser != upd.analyser:
        raise MappingUpdateError(
            "analyser has been changed for a dynamic mapping"
        )
    for ori_fmap in ori.field_map_info:
        upd_fmap: Optional[dict] = None
        upd_analyser = ""
        upd_datetime_parser = ""
        for upd_fmap_info in upd.field_map_info:
            if (
                ori_fmap.root_name == upd_fmap_info.root_name
                and ori_fmap.field_mapping.get("name", "")
                == upd_fmap_info.field_mapping.get("name", "")
            ):
                upd_fmap = upd_fmap_info.field_mapping
                if upd_fmap.get("type", "") == "text":
                    upd_analyser = upd_fmap_info.analyzer
                elif upd_fmap.get("type", "") == "datetime":
                    upd_datetime_parser = upd_fmap_info.datetime_parser
        if upd_analyser and ori_fmap.analyzer != upd_analyser:
            raise MappingUpdateError(
                "analyser has been changed for a text field"
            )
        if (
            upd_datetime_parser
            and ori_fmap.datetime_parser != upd_datetime_parser
        ):
            raise MappingUpdateError(
                "datetime parser has been changed for a date time field"
            )
        info = compare_field_mapping(ori_fmap.field_mapping, upd_fmap)
        _validate_field_info(info, f_info, ori, ori_fmap)


# ---------------------------------------------------------------------------
# orchestrator (index_update.go:46-124 DeletedFields)
# ---------------------------------------------------------------------------

def deleted_fields_mapping(
    ori: dict, upd: dict
) -> Dict[str, UpdateFieldInfo]:
    """Full mapping-tree diff: validate ``upd`` against ``ori`` and
    return {full field name: UpdateFieldInfo} for every legal drop."""
    compare_mappings(ori, upd)
    for name, upd_dm in (upd.get("types") or {}).items():
        check_updated_mapping((ori.get("types") or {}).get(name), upd_dm)
    check_updated_mapping(
        ori.get("default_mapping"), upd.get("default_mapping")
    )

    ori_paths: Dict[str, PathInfo] = {}
    upd_paths: Dict[str, PathInfo] = {}
    for name, dm in (ori.get("types") or {}).items():
        add_path_info(ori_paths, "", dm, ori, None, name)
    if ori.get("default_mapping") is not None:
        add_path_info(
            ori_paths, "", ori["default_mapping"], ori, None, ""
        )
    for name, dm in (upd.get("types") or {}).items():
        add_path_info(upd_paths, "", dm, upd, None, name)
    if upd.get("default_mapping") is not None:
        add_path_info(
            upd_paths, "", upd["default_mapping"], upd, None, ""
        )

    compare_analyzers(ori_paths, upd_paths, ori, upd)
    compare_datetime_parsers(ori_paths, upd_paths, ori, upd)
    compare_synonym_sources(ori, upd)
    compare_analyzer_subcomponents(ori, upd)

    field_info: Dict[str, UpdateFieldInfo] = {}
    for path, info in ori_paths.items():
        _add_field_info(field_info, info, upd_paths.get(path))

    for name in list(field_info):
        info = field_info[name]
        if not info.any():
            del field_info[name]
            continue
        if info.deleted:
            if upd.get("index_dynamic", False):
                raise MappingUpdateError(
                    "mapping cannot be removed when index dynamic is true"
                )
            if upd.get("store_dynamic", False):
                raise MappingUpdateError(
                    "mapping cannot be removed when store dynamic is true"
                )
            if upd.get("docvalues_dynamic", False):
                raise MappingUpdateError(
                    "mapping cannot be removed when docvalues dynamic "
                    "is true"
                )
    return field_info
