"""YAML sink schema → StructType conversion (reference: src/schema.rs:96-196)."""

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    NullType,
    StringType,
    StructType,
    TimestampNTZType,
)

from hotdog_spark.config import load_dict
from hotdog_spark.plans.schema import sink_schema_to_struct


def build(fields_yaml: dict):
    s = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [],
            "schemas": [{"topic": "test", "fields": fields_yaml}],
        },
        environ={},
    )
    return sink_schema_to_struct(s.schemas[0])


def test_simple_field():
    st = build({"version": {"type": "string"}})
    assert st["version"].dataType == StringType()
    assert st["version"].nullable


def test_all_scalar_types():
    st = build(
        {
            "s": {"type": "string"},
            "b": {"type": "boolean"},
            "i": {"type": "integer"},
            "l": {"type": "long"},
            "f": {"type": "float"},
            "t": {"type": "timestamp"},
        }
    )
    assert st["s"].dataType == StringType()
    assert st["b"].dataType == BooleanType()
    assert st["i"].dataType == IntegerType()
    assert st["l"].dataType == LongType()
    assert st["f"].dataType == DoubleType()
    # Arrow Timestamp(ms, tz=None) → TimestampNTZ (src/schema.rs:32)
    assert st["t"].dataType == TimestampNTZType()


def test_nested_struct():
    st = build(
        {
            "meta": {
                "type": "struct",
                "fields": {"version": {"type": "string"}},
            }
        }
    )
    inner = st["meta"].dataType
    assert isinstance(inner, StructType)
    assert inner["version"].dataType == StringType()


def test_struct_without_fields_is_null_type():
    # src/schema.rs:78-83
    st = build({"mystery": {"type": "struct"}})
    assert st["mystery"].dataType == NullType()
