"""bsonutil analogue (reference bsonutil/helpers.go:7-9,
bsonutil/tags.go:23-59): dotted key-name helpers and typed-model
field→column mapping.

The reference reflects over Go struct tags (`bson:"name"`); the Python
shape is dataclass metadata: ``field(metadata={"bson": "colname"})``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

__all__ = ["get_dotted_key_name", "tag", "must_have_tag", "model_columns", "row_to_model"]


def get_dotted_key_name(*parts: str) -> str:
    """GetDottedKeyName (bsonutil/helpers.go:7-9)."""
    return ".".join(parts)


def tag(model: type, field_name: str) -> str:
    """Column name for a dataclass field: the ``bson`` metadata key if
    present, else the field name (bsonutil.Tag semantics; empty string if
    the field does not exist → use must_have_tag to raise)."""
    for f in dataclasses.fields(model):
        if f.name == field_name:
            return f.metadata.get("bson", f.name)
    return ""


def must_have_tag(model: type, field_name: str) -> str:
    """Tag, raising when the field is missing (bsonutil.MustHaveTag)."""
    out = tag(model, field_name)
    if not out:
        raise KeyError(f"{model.__name__} has no field {field_name!r}")
    return out


def model_columns(model: type) -> dict[str, str]:
    """field name → column name map for a dataclass model."""
    return {f.name: f.metadata.get("bson", f.name) for f in dataclasses.fields(model)}


def row_to_model(model: type, doc: dict[str, Any]):
    """Build a dataclass instance from a document using the column map."""
    kwargs = {}
    for f in dataclasses.fields(model):
        col = f.metadata.get("bson", f.name)
        if col in doc:
            kwargs[f.name] = doc[col]
    return model(**kwargs)
