"""Declared sink schemas (YAML) → Spark StructType.

Mirrors the reference's recursive YAML→Arrow conversion
(reference: src/schema.rs:13-94):

| config type | Arrow (reference)        | Spark          |
|-------------|--------------------------|----------------|
| string      | Utf8                     | StringType     |
| boolean     | Boolean                  | BooleanType    |
| integer     | Int32                    | IntegerType    |
| long        | Int64                    | LongType       |
| float       | Float64                  | DoubleType     |
| timestamp   | Timestamp(ms, tz=None)   | TimestampNTZType |
| struct      | Struct(fields), recursive| StructType     |

All fields nullable (src/schema.rs:75,88).  A struct without declared
fields degrades to NullType (src/schema.rs:78-83).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from hotdog_spark.config import ConfigError, SchemaField, SinkSchema

_SCALARS: dict[str, DataType] = {
    "string": StringType(),
    "boolean": BooleanType(),
    "integer": IntegerType(),
    "long": LongType(),
    "float": DoubleType(),
    "timestamp": TimestampNTZType(),
}


def field_to_spark(f: SchemaField) -> DataType:
    if f.type == "struct":
        if not f.fields:
            # struct without fields → Null type (src/schema.rs:78-83)
            return NullType()
        return fields_to_struct(f.fields)
    try:
        return _SCALARS[f.type]
    except KeyError:
        raise ConfigError(f"unknown schema field type: {f.type!r}") from None


def fields_to_struct(fields: dict[str, SchemaField]) -> StructType:
    # Sort for a deterministic field order (the reference iterates a
    # HashMap, i.e. its order is arbitrary; deterministic is strictly
    # better for plan reuse and testability).
    return StructType(
        [
            StructField(name, field_to_spark(f), nullable=True)
            for name, f in sorted(fields.items())
        ]
    )


def sink_schema_to_struct(schema: SinkSchema) -> StructType:
    return fields_to_struct(schema.fields)


def ensure_paths(struct: StructType, paths: list[str]) -> StructType:
    """Return a StructType that contains every dotted path in ``paths``,
    adding missing leaves as nullable strings (merge-patch leaves render to
    strings).  Used so the native merge fast path can graft static patch
    fields into a declared sink schema."""
    for path in paths:
        struct = _ensure_path(struct, path.split("."))
    return struct


def _ensure_path(struct: StructType, parts: list[str]) -> StructType:
    head, rest = parts[0], parts[1:]
    fields = list(struct.fields)
    idx = next((i for i, f in enumerate(fields) if f.name == head), None)
    if not rest:
        if idx is None:
            fields.append(StructField(head, StringType(), nullable=True))
        return StructType(fields)
    if idx is None:
        fields.append(
            StructField(head, _ensure_path(StructType([]), rest), nullable=True)
        )
    else:
        inner = fields[idx].dataType
        if not isinstance(inner, StructType):
            inner = StructType([])
        fields[idx] = StructField(head, _ensure_path(inner, rest), nullable=True)
    return StructType(fields)
