"""Minimal JSON-Schema validator (draft-7 core subset).

The reference validates via the ``jsonschema`` package inside a
row-at-a-time Python UDF
(column_values_match_json_schema.py:39-60). That package is not
available here, so this implements the keywords the golden corpus
exercises: type, properties, required, items, enum, minimum, maximum,
minLength, maxLength, minItems, maxItems, pattern, additionalProperties.
Used from an Arrow-batched pandas UDF — never per-row Python UDFs.
"""

from __future__ import annotations

import re
from typing import Any


_TYPE_CHECKS = {
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, list),
    "string": lambda v: isinstance(v, str),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: (isinstance(v, int) and not isinstance(v, bool))
    or (isinstance(v, float) and v.is_integer()),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
}


def validates(value: Any, schema: dict) -> bool:
    """Return True iff ``value`` conforms to ``schema``."""
    if not isinstance(schema, dict):
        return True

    t = schema.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        if not any(_TYPE_CHECKS.get(x, lambda v: True)(value) for x in types):
            return False

    if "enum" in schema and value not in schema["enum"]:
        return False

    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            return False
        if "maximum" in schema and value > schema["maximum"]:
            return False
        if "exclusiveMinimum" in schema and value <= schema["exclusiveMinimum"]:
            return False
        if "exclusiveMaximum" in schema and value >= schema["exclusiveMaximum"]:
            return False

    if isinstance(value, str):
        if "minLength" in schema and len(value) < schema["minLength"]:
            return False
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            return False
        if "pattern" in schema and not re.search(schema["pattern"], value):
            return False

    if isinstance(value, list):
        if "minItems" in schema and len(value) < schema["minItems"]:
            return False
        if "maxItems" in schema and len(value) > schema["maxItems"]:
            return False
        items = schema.get("items")
        if isinstance(items, dict):
            if not all(validates(v, items) for v in value):
                return False
        elif isinstance(items, list):
            for v, s in zip(value, items):
                if not validates(v, s):
                    return False

    if isinstance(value, dict):
        for req in schema.get("required", []):
            if req not in value:
                return False
        props = schema.get("properties", {})
        for k, s in props.items():
            if k in value and not validates(value[k], s):
                return False
        addl = schema.get("additionalProperties")
        if addl is False:
            if any(k not in props for k in value):
                return False
        elif isinstance(addl, dict):
            for k, v in value.items():
                if k not in props and not validates(v, addl):
                    return False

    return True
