"""Bleve JSON index-mapping ingestion.

Converts the reference's serialized IndexMapping (mapping/index.go
UnmarshalJSON shape: types / default_type / default_mapping /
default_analyzer / properties trees with per-property ``fields`` lists)
plus a set of JSON documents into this engine's build inputs: an Arrow
table, IndexOptions field configs, and the query-time analyzer map.

This is the migration surface a bleve user hits first: point
``options_from_bleve_mapping`` at the mapping.json + docs they already
have.  Dynamic mappings resolve unmapped document attributes by value
type (string -> text with the inherited default analyzer, number ->
numeric, bool -> boolean, dict -> dotted sub-paths, list -> element
type), mirroring mapping/document.go processProperty.

The reference's own black-box suites (test/tests/* : mapping.json +
data/*.json + searches.json) run through this loader in
tests/test_reference_suites.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from .build import FieldConfig, IndexOptions

_ANALYZER_ALIASES = {"en": "en", "keyword": "keyword", "standard": "standard"}


def _field_config_from_spec(spec: dict, default_analyzer: str) -> Optional[FieldConfig]:
    """One entry of a property's ``fields`` list -> FieldConfig.
    index:false -> None (not indexed)."""
    if spec.get("index") is False:
        return None
    ftype = spec.get("type", "text")
    if ftype == "text":
        return FieldConfig(
            analyzer=spec.get("analyzer") or default_analyzer or "standard",
            positions=spec.get("include_term_vectors", True),
        )
    if ftype == "number":
        return FieldConfig(field_type="numeric", positions=False)
    if ftype == "datetime":
        return FieldConfig(
            field_type="datetime", positions=False,
            datetime_parser=spec.get("date_format") or None,
        )
    if ftype == "geopoint":
        return FieldConfig(field_type="geo", positions=False)
    if ftype == "geoshape":
        return FieldConfig(field_type="geoshape", positions=False)
    if ftype == "boolean":
        return FieldConfig(field_type="boolean", positions=False)
    if ftype == "IP":
        return FieldConfig(field_type="ip", positions=False)
    # vector et al: indexed via docvalues / knn path, not postings
    return None


def _walk_json_mapping(
    dm: dict, prefix: str, default_analyzer: str,
    out: Dict[str, FieldConfig], stored: List[str], excluded: List[str],
) -> None:
    if dm.get("enabled", True) is False:
        excluded.append(prefix)
        return
    eff = dm.get("default_analyzer") or default_analyzer
    for prop, sub in (dm.get("properties") or {}).items():
        path = f"{prefix}.{prop}" if prefix else prop
        _walk_json_mapping(sub, path, eff, out, stored, excluded)
    for spec in dm.get("fields") or []:
        # a field list entry names the leaf; the common case keeps the
        # property's own name (mapping/document.go processProperty)
        path = prefix
        name = spec.get("name")
        if name and prefix and name != prefix.rsplit(".", 1)[-1]:
            parent = prefix.rsplit(".", 1)[0] if "." in prefix else ""
            path = f"{parent}.{name}" if parent else name
        cfg = _field_config_from_spec(spec, eff)
        if cfg is not None and path:
            out[path] = cfg
            if spec.get("store"):
                stored.append(path)


def _infer_dynamic(value, default_analyzer: str) -> Optional[FieldConfig]:
    if isinstance(value, bool):
        return FieldConfig(field_type="boolean", positions=False)
    if isinstance(value, (int, float)):
        return FieldConfig(field_type="numeric", positions=False)
    if isinstance(value, str):
        return FieldConfig(analyzer=default_analyzer or "standard",
                           positions=True)
    return None


def _doc_mapping_for(mapping: dict) -> dict:
    types = mapping.get("types") or {}
    dt = mapping.get("default_type")
    if dt and dt in types:
        return types[dt]
    if len(types) == 1 and not mapping.get("default_mapping"):
        return next(iter(types.values()))
    return mapping.get("default_mapping") or {}


def options_from_bleve_mapping(
    mapping: dict,
    docs: List[Tuple[str, dict]],
    **option_kwargs,
) -> Tuple[pa.Table, IndexOptions]:
    """(doc_id, document) pairs + a bleve JSON mapping -> (arrow table,
    IndexOptions).  All fields are registered as docvalues (sort/facet/
    geo-filter need them at this scale); store:true fields are stored;
    _all is enabled like the reference default (include_in_all)."""
    default_analyzer = mapping.get("default_analyzer") or "standard"
    dm = _doc_mapping_for(mapping)

    fields: Dict[str, FieldConfig] = {}
    stored: List[str] = []
    excluded: List[str] = []
    _walk_json_mapping(dm, "", default_analyzer, fields, stored, excluded)
    dm_default = dm.get("default_analyzer") or default_analyzer

    # dynamic attributes: union over docs, value-type inference
    dynamic = dm.get("dynamic", True)

    def visit(prefix: str, value) -> None:
        if prefix in fields or prefix in excluded:
            return
        if isinstance(value, dict):
            for k, v in value.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
            return
        if isinstance(value, list):
            if value and not isinstance(value[0], (dict, list)):
                cfg = _infer_dynamic(value[0], dm_default)
                if cfg is not None:
                    fields.setdefault(prefix, cfg)
            elif value and isinstance(value[0], dict):
                for el in value:
                    visit(prefix, el)
            return
        cfg = _infer_dynamic(value, dm_default)
        if cfg is not None:
            fields.setdefault(prefix, cfg)

    dyn_values: Dict[str, list] = {}

    def record(prefix: str, value) -> None:
        if isinstance(value, dict):
            for k, v in value.items():
                record(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(value, list):
            for el in value:
                record(prefix, el)
        elif value is not None:
            dyn_values.setdefault(prefix, []).append(value)

    if dynamic:
        for _id, doc in docs:
            for k, v in doc.items():
                if k in excluded:
                    continue
                visit(k, v)
                record(k, v)
        # bleve's dynamic walk indexes a string as datetime when the
        # default datetime parser accepts it (mapping/document.go
        # processProperty dateTimeOptional attempt)
        from ..analysis.datetime_parsers import resolve_datetime_parser

        dt_parse = resolve_datetime_parser(
            mapping.get("default_datetime_parser") or "dateTimeOptional"
        )
        for path, vals in dyn_values.items():
            cfg = fields.get(path)
            if cfg is None or cfg.field_type != "text":
                continue
            if not all(isinstance(v, str) for v in vals):
                continue

            def _is_dt(v):
                try:
                    return dt_parse(v) is not None
                except Exception:
                    return False

            if vals and all(_is_dt(v) for v in vals):
                fields[path] = FieldConfig(
                    field_type="datetime", positions=False,
                    datetime_parser=(
                        mapping.get("default_datetime_parser")
                        or "dateTimeOptional"
                    ),
                )

    # arrow table: one row per doc, one column per TOP-LEVEL attribute
    # (dotted paths resolve through struct columns at build time)
    geoshape_cols = {f for f, c in fields.items()
                     if c.field_type == "geoshape" and "." not in f}
    rows = []
    for doc_id, doc in docs:
        row = {"doc_id": doc_id}
        for k, v in doc.items():
            if k in excluded:
                continue
            if k in geoshape_cols and not isinstance(v, str):
                # heterogeneous GeoJSON geometries can't share one Arrow
                # struct type; the geoshape tokenizer parses JSON strings
                import json as _json

                v = _json.dumps(v)
            row[k] = v
        rows.append(row)
    # bleve fields accept scalar OR array values per doc; Arrow needs one
    # type per column, so a column mixing both becomes all-arrays
    mixed = set()
    kinds: Dict[str, set] = {}
    for row in rows:
        for k, v in row.items():
            if v is not None:
                kinds.setdefault(k, set()).add(isinstance(v, list))
    mixed = {k for k, s in kinds.items() if len(s) > 1}
    for row in rows:
        for k in mixed:
            v = row.get(k)
            if v is not None and not isinstance(v, list):
                row[k] = [v]
    # normalize every row to the full key set: from_pylist derives the
    # schema from the first rows, silently dropping late-appearing keys
    all_keys = []
    for row in rows:
        for k in row:
            if k not in all_keys:
                all_keys.append(k)
    rows = [{k: row.get(k) for k in all_keys} for row in rows]
    tbl = pa.Table.from_pylist(rows)

    fields = {f: c for f, c in fields.items()
              if f != "doc_id" and not any(
                  f == e or f.startswith(e + ".") for e in excluded)}
    dv = [c for c in tbl.column_names if c != "doc_id"]
    opts = IndexOptions(
        fields=fields,
        doc_id_fields=["doc_id"],
        docvalue_fields=dv,
        store_fields=sorted({*stored, *(
            f for f, c in fields.items()
            if c.field_type == "text" and "." not in f and f in tbl.column_names
        )}),
        enable_all_field=True,
        default_analyzer=default_analyzer,
        # the reference's default scoring model (tf-idf) unless the
        # caller overrides; its integration goldens assume these scores
        scoring_model=option_kwargs.pop("scoring_model", "tfidf"),
        **option_kwargs,
    )
    return tbl, opts
