"""Driver-side conversion plans (ComponentProperty analog)."""

from .components import (
    ComponentPlan,
    ComponentProperty,
    ComponentType,
    DatasetMeta,
    DatasetRejectedError,
    UnknownMappingTypeError,
    compile_plan,
)

__all__ = [
    "ComponentPlan",
    "ComponentProperty",
    "ComponentType",
    "DatasetMeta",
    "DatasetRejectedError",
    "UnknownMappingTypeError",
    "compile_plan",
]
