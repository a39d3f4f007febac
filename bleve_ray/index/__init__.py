from .build import FieldConfig, IndexOptions, build_index
from .manifest import Manifest, load as load_manifest
