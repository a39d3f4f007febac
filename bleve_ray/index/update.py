"""Live mapping-update validation + application.

Mirrors the reference's index-update rules (index_update.go:46-140,
compareFieldMapping index_update.go:476-566): comparing an index's
current mapping with a proposed one yields, per field, which DATA
DROPS are legal (stop indexing / stop storing / stop docvalues /
delete the field outright) -- everything else (new fields, type or
analyzer changes, enabling a capability that was off at build time)
is rejected, because persisted segments cannot be retro-fitted.

Applying a legal update commits a new manifest epoch whose options
reflect the narrowed mapping; readers consult the live options, so
dropped fields stop serving postings/docvalues immediately and the
change is rollback-able like any other epoch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

from .build import IndexOptions
from . import manifest as manifest_mod


@dataclass
class UpdateFieldInfo:
    """Which per-field data drops an update implies
    (bleve_index_api UpdateFieldInfo equivalent)."""

    deleted: bool = False
    index: bool = False
    docvalues: bool = False
    store: bool = False

    def any(self) -> bool:
        return self.deleted or self.index or self.docvalues or self.store


class MappingUpdateError(ValueError):
    pass


def deleted_fields(
    ori: IndexOptions, upd: IndexOptions
) -> Dict[str, UpdateFieldInfo]:
    """Validate ``upd`` against ``ori`` and return the legal drops.

    Raises MappingUpdateError (with reference-matching messages) for any
    change an existing index cannot honour."""
    # top-level invariants (compareMappings analog): the knobs that shape
    # persisted segments can never change
    for attr, label in (
        ("num_shards", "num_shards"),
        ("bucket_bits", "bucket_bits"),
        ("doc_id_fields", "doc_id_fields"),
        ("scoring_model", "scoring model"),
        ("index_id_field", "index_id_field"),
    ):
        if getattr(ori, attr) != getattr(upd, attr):
            raise MappingUpdateError(f"{label} cannot be updated")
    if ori.enable_all_field != upd.enable_all_field:
        raise MappingUpdateError("'_all' field cannot be toggled")

    # new mappings are not allowed (checkUpdatedMapping analog)
    for name in upd.fields:
        if name not in ori.fields:
            raise MappingUpdateError(
                "matching field not found in original index mapping"
            )

    info: Dict[str, UpdateFieldInfo] = {}
    for name, fo in ori.fields.items():
        fu = upd.fields.get(name)
        rv = UpdateFieldInfo()
        if fu is None:
            # field deletion; impossible while the field feeds '_all'
            # (compareFieldMapping: "deleted field present in '_all'")
            if ori.enable_all_field and fo.field_type == "text":
                raise MappingUpdateError(
                    "deleted field present in '_all' field"
                )
            rv.deleted = True
            rv.index = rv.docvalues = rv.store = True
        else:
            if fo.field_type != fu.field_type:
                raise MappingUpdateError("field type cannot be updated")
            if fo.field_type == "text" and fo.analyzer != fu.analyzer:
                raise MappingUpdateError(
                    "analyzer cannot be updated for text fields"
                )
            if fo.positions != fu.positions:
                # positions play the IncludeTermVectors role here
                raise MappingUpdateError(
                    "includeTermVectors cannot be changed"
                )
        if rv.any():
            info[name] = rv

    def _list_changes(attr: str, flag: str):
        o, u = set(getattr(ori, attr)), set(getattr(upd, attr))
        for f in u - o:
            raise MappingUpdateError(
                f"{flag} cannot be changed from false to true"
            )
        for f in o - u:
            if f in upd.fields or f not in ori.fields:
                # narrowing store/docvalues on a retained (or non-indexed
                # stored-only) field is a legal drop
                rv = info.setdefault(f, UpdateFieldInfo())
                setattr(rv, flag, True)

    _list_changes("store_fields", "store")
    _list_changes("docvalue_fields", "docvalues")
    return info


def apply_mapping_update(
    index_dir: str, upd: IndexOptions
) -> Dict[str, UpdateFieldInfo]:
    """Validate and commit ``upd`` as the index's live mapping.

    The new options land in a fresh manifest epoch (atomic, rollback-able);
    readers opened afterwards serve only the narrowed mapping.  Returns
    the per-field drop info (what a background purge could physically
    delete from segments; logically the drops are effective at once)."""
    man = manifest_mod.load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    ori = IndexOptions.from_dict(man.options)
    info = deleted_fields(ori, upd)
    # accumulate drops across successive updates (read the OLD options'
    # list before replacing them)
    prior_dropped = set(man.options.get("dropped_fields", ()))
    man.options = upd.to_dict()
    dropped = sorted(
        prior_dropped | {f for f, i in info.items() if i.deleted}
    )
    if dropped:
        man.options["dropped_fields"] = dropped
    manifest_mod.commit(index_dir, man)
    return info
