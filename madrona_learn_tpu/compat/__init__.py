"""Compatibility helpers for migrating from the reference framework."""

from .reference_import import (
    convert_reference_params,
    import_reference_checkpoint,
)

__all__ = [
    "convert_reference_params",
    "import_reference_checkpoint",
]
