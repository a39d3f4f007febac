"""Nested document mappings (reference mapping/document.go:48
DocumentMapping.Nested, NewNestedDocumentMapping:235-258).

A DocumentMapping tree describes hierarchical documents: named
sub-sections map through ``properties``; leaf values index through
``fields``.  A sub-mapping with ``nested=True`` treats each element of
its array value as a NESTED sub-document: conjunctions over fields
under the same nested path must match within the SAME element
(search_nested_test.go).

Engine shape (deliberately NOT the reference's block-indexed
sub-documents): documents keep ONE docnum each — nested element
values are flattened into their parent doc's postings at build (so
doc-level matching, scoring, facets, match_all/_id semantics are
unchanged and need no root-doc filtering) — and same-element scoping
is enforced by a query-time verifier (search/nested.py) over the
stored nested structure of the doc-level candidate set.  At cluster
scale the verifier is a bounded post-filter on an already-intersected
candidate set, not a second index scan.

NestedDepth mirrors the reference's mapping.NestedMapping interface
(search_nested_test.go TestNestedPrefixes): for a set of fields,
``common`` = depth of the deepest nested ancestor shared by ALL
fields, ``max`` = deepest nested ancestor of any field.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field, replace as dc_replace
from typing import Dict, List, Optional, Sequence, Tuple

from .build import FieldConfig, IndexOptions


@dataclass
class DocumentMapping:
    """mapping/document.go DocumentMapping subset: the hierarchy +
    nested flag + per-leaf FieldConfig."""

    enabled: bool = True
    dynamic: bool = True
    nested: bool = False
    properties: Dict[str, "DocumentMapping"] = dc_field(default_factory=dict)
    # leaf name -> index config (the FieldMapping role)
    fields: Dict[str, FieldConfig] = dc_field(default_factory=dict)
    default_analyzer: str = ""

    def add_sub_document_mapping(
        self, prop: str, sub: "DocumentMapping"
    ) -> None:
        self.properties[prop] = sub

    def add_field_mapping_at(self, name: str, cfg: FieldConfig) -> None:
        self.fields[name] = cfg


def new_document_mapping() -> DocumentMapping:
    return DocumentMapping(enabled=True, dynamic=True)


def new_nested_document_mapping() -> DocumentMapping:
    """mapping/document.go:238-244 NewNestedDocumentMapping."""
    return DocumentMapping(enabled=True, dynamic=True, nested=True)


def new_document_static_mapping() -> DocumentMapping:
    return DocumentMapping(enabled=True, dynamic=False)


def new_nested_document_static_mapping() -> DocumentMapping:
    return DocumentMapping(enabled=True, dynamic=False, nested=True)


def validate_root_mapping(
    root: DocumentMapping,
    type_mappings: Optional[Dict[str, DocumentMapping]] = None,
) -> None:
    """Top-level mappings — the default mapping and any type mappings —
    cannot themselves be nested (search_nested_test.go
    TestValidNestedMapping): nesting scopes array elements under a
    PARENT document, which a root has none of."""
    if root.nested:
        raise ValueError("top-level document mapping cannot be nested")
    for name, tm in (type_mappings or {}).items():
        if tm.nested:
            raise ValueError(
                f"type mapping {name!r} cannot be nested"
            )


def collect_nested_paths(
    root: DocumentMapping, prefix: str = ""
) -> List[str]:
    """Dotted paths of every nested sub-mapping, depth-first."""
    out: List[str] = []
    for prop, sub in root.properties.items():
        path = f"{prefix}.{prop}" if prefix else prop
        if sub.nested:
            out.append(path)
        out.extend(collect_nested_paths(sub, path))
    return out


def nested_prefixes(
    field: str, nested_paths: Sequence[str]
) -> Tuple[str, ...]:
    """The chain of nested ancestor paths of ``field``, outermost first
    (e.g. company.departments.employees.name ->
    (company.departments, company.departments.employees))."""
    return tuple(
        sorted(
            (
                p
                for p in nested_paths
                if field == p or field.startswith(p + ".")
            ),
            key=len,
        )
    )


def nested_depth(
    fields: Sequence[str], nested_paths: Sequence[str]
) -> Tuple[int, int]:
    """(common, max) nested depth of a field set — the reference's
    NestedMapping.NestedDepth(FieldSet) (search_nested_test.go
    TestNestedPrefixes vectors).  Empty set -> (0, 0)."""
    chains = [nested_prefixes(f, nested_paths) for f in fields]
    if not chains:
        return 0, 0
    mx = max(len(c) for c in chains)
    common = 0
    for level in range(min(len(c) for c in chains)):
        first = chains[0][level]
        if all(c[level] == first for c in chains):
            common = level + 1
        else:
            break
    return common, mx


def _walk_fields(
    dm: DocumentMapping, prefix: str, out: Dict[str, FieldConfig],
    inherited_analyzer: str = "",
) -> None:
    """Leaf FieldConfigs with analyzer "" inherit the CLOSEST enclosing
    mapping's default_analyzer, falling back to the index default
    (reference mapping/index.go defaultAnalyzerName resolution,
    TestAnalyzerInheritance)."""
    if not dm.enabled:
        return
    effective = dm.default_analyzer or inherited_analyzer
    for name, cfg in dm.fields.items():
        path = f"{prefix}.{name}" if prefix else name
        if not getattr(cfg, "analyzer", None) and effective:
            cfg = dc_replace(cfg, analyzer=effective)
        out[path] = cfg
    for prop, sub in dm.properties.items():
        _walk_fields(sub, f"{prefix}.{prop}" if prefix else prop, out,
                     effective)


def options_from_mapping(
    root: DocumentMapping,
    type_mappings: Optional[Dict[str, DocumentMapping]] = None,
    default_analyzer: str = "",
    **option_kwargs,
) -> IndexOptions:
    """Flatten a DocumentMapping tree into IndexOptions: dotted field
    paths + FieldConfigs, nested_paths, and each nested path's ROOT
    parquet column auto-registered as a docvalue so the query-time
    same-element verifier can read the structure back.
    ``default_analyzer`` is the INDEX-level default: leaves with no
    analyzer inherit the closest mapping default_analyzer up the tree,
    then this (TestAnalyzerInheritance chains; dynamic discovery of
    unmapped columns is out of scope — parquet schemas are explicit)."""
    validate_root_mapping(root, type_mappings)
    fields: Dict[str, FieldConfig] = {}
    _walk_fields(root, "", fields, default_analyzer)
    if not fields:
        raise ValueError("mapping defines no fields")
    nested = collect_nested_paths(root)
    opts = IndexOptions(fields=fields, nested_paths=nested, **option_kwargs)
    for p in nested:
        rootcol = p.split(".", 1)[0]
        if rootcol not in opts.docvalue_fields:
            opts.docvalue_fields.append(rootcol)
    return opts
