from .build import FieldConfig, IndexOptions, build_index
from .manifest import Manifest, load as load_manifest
from .update import (
    MappingUpdateError,
    UpdateFieldInfo,
    apply_mapping_update,
    deleted_fields,
)
