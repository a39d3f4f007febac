from .build import FieldConfig, IndexOptions, build_index
from .nested import (
    DocumentMapping,
    collect_nested_paths,
    nested_depth,
    new_document_mapping,
    new_document_static_mapping,
    new_nested_document_mapping,
    new_nested_document_static_mapping,
    options_from_mapping,
    validate_root_mapping,
)
from .manifest import Manifest, load as load_manifest
from .update import (
    MappingUpdateError,
    UpdateFieldInfo,
    apply_mapping_update,
    deleted_fields,
)
