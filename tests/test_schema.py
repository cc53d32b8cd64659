"""Schema-derivation exactness tests.

Pins the descriptor->StructType mapping the same way the reference
pins descriptor->pa.Schema (``tests/data/test_schema.py:9-60``):
every scalar kind, nullability semantics, the four nullability knobs,
WKT dispatch, enum/uint64/timestamp/duration policies, maps (both
representations), recursion policy, and field-number metadata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.proto import fixtures
from protarrow_spark.proto.model import Field, Kind, MessageType
from protarrow_spark.schema import (
    TIME_OF_DAY_METADATA,
    message_type_to_schema,
    message_type_to_struct_type,
)

CFG = ProtarrowSparkConfig()
SCHEMA = message_type_to_schema(fixtures.EXAMPLE, CFG)


# ---------------------------------------------------------------------------
# Scalar kinds
# ---------------------------------------------------------------------------

EXPECTED_SCALAR = {
    Kind.DOUBLE: T.DoubleType(),
    Kind.FLOAT: T.FloatType(),
    Kind.INT32: T.IntegerType(),
    Kind.INT64: T.LongType(),
    Kind.UINT32: T.LongType(),  # widened: Spark has no unsigned ints
    Kind.UINT64: T.DecimalType(20, 0),  # default policy: exact
    Kind.SINT32: T.IntegerType(),
    Kind.SINT64: T.LongType(),
    Kind.FIXED32: T.LongType(),  # widened like uint32
    Kind.FIXED64: T.DecimalType(20, 0),  # follows uint64 policy
    Kind.SFIXED32: T.IntegerType(),
    Kind.SFIXED64: T.LongType(),
    Kind.BOOL: T.BooleanType(),
    Kind.STRING: T.StringType(),
    Kind.BYTES: T.BinaryType(),
}


@pytest.mark.parametrize("kind", fixtures.SCALAR_KINDS, ids=lambda k: k.value)
def test_scalar_types(kind: Kind) -> None:
    f = SCHEMA[f"{kind.value}_value"]
    assert f.dataType == EXPECTED_SCALAR[kind]
    assert f.nullable is False, "plain proto3 scalars are non-nullable"


@pytest.mark.parametrize("kind", fixtures.SCALAR_KINDS, ids=lambda k: k.value)
def test_repeated_scalar_types(kind: Kind) -> None:
    f = SCHEMA[f"{kind.value}_values"]
    assert f.dataType == T.ArrayType(EXPECTED_SCALAR[kind], containsNull=False)
    assert f.nullable is False, "repeated fields are non-nullable by default"


@pytest.mark.parametrize("kind", [Kind.INT32, Kind.STRING, Kind.DOUBLE, Kind.BOOL])
def test_optional_scalars_nullable(kind: Kind) -> None:
    f = SCHEMA[f"optional_{kind.value}_value"]
    assert f.dataType == EXPECTED_SCALAR[kind]
    assert f.nullable is True, "explicit-presence fields are nullable"


def test_uint64_long_policy() -> None:
    schema = message_type_to_schema(
        fixtures.EXAMPLE, ProtarrowSparkConfig(uint64_type="long")
    )
    assert schema["uint64_value"].dataType == T.LongType()
    assert schema["fixed64_value"].dataType == T.LongType()


# ---------------------------------------------------------------------------
# Wrappers & WKTs
# ---------------------------------------------------------------------------

WRAPPER_EXPECTED = {
    "wrapped_double_value": T.DoubleType(),
    "wrapped_float_value": T.FloatType(),
    "wrapped_int32_value": T.IntegerType(),
    "wrapped_int64_value": T.LongType(),
    "wrapped_u_int32_value": T.LongType(),
    "wrapped_u_int64_value": T.DecimalType(20, 0),
    "wrapped_bool_value": T.BooleanType(),
    "wrapped_string_value": T.StringType(),
    "wrapped_bytes_value": T.BinaryType(),
}


@pytest.mark.parametrize("name", sorted(WRAPPER_EXPECTED))
def test_wrappers_unwrap_nullable(name: str) -> None:
    f = SCHEMA[name]
    assert f.dataType == WRAPPER_EXPECTED[name]
    assert f.nullable is True, "wrapper fields are nullable (have presence)"


def test_wkt_types_default_config() -> None:
    assert SCHEMA["timestamp_value"].dataType == T.TimestampType()
    assert SCHEMA["timestamp_value"].nullable is True
    assert SCHEMA["timestamp_values"].dataType == T.ArrayType(
        T.TimestampType(), containsNull=False
    )
    assert SCHEMA["date_value"].dataType == T.DateType()
    assert SCHEMA["time_of_day_value"].dataType == T.LongType()
    assert SCHEMA["time_of_day_value"].metadata == TIME_OF_DAY_METADATA
    assert SCHEMA["duration_value"].dataType == T.DayTimeIntervalType(
        T.DayTimeIntervalType.DAY, T.DayTimeIntervalType.SECOND
    )
    assert SCHEMA["empty_value"].dataType == T.StructType([])


def test_wkt_nanos_configs() -> None:
    schema = message_type_to_schema(
        fixtures.EXAMPLE,
        ProtarrowSparkConfig(timestamp_type="long_nanos", duration_type="long_nanos"),
    )
    ts = schema["timestamp_value"]
    assert ts.dataType == T.LongType()
    assert ts.metadata["protarrow_spark.logical_type"] == "timestamp_nanos"
    dur = schema["duration_value"]
    assert dur.dataType == T.LongType()
    assert dur.metadata["protarrow_spark.logical_type"] == "duration_nanos"


# ---------------------------------------------------------------------------
# Enums
# ---------------------------------------------------------------------------


def test_enum_policies() -> None:
    assert SCHEMA["enum_value"].dataType == T.IntegerType()
    assert SCHEMA["enum_values"].dataType == T.ArrayType(T.IntegerType(), containsNull=False)
    s = message_type_to_schema(fixtures.EXAMPLE, ProtarrowSparkConfig(enum_type="string"))
    assert s["enum_value"].dataType == T.StringType()
    assert s["string_enum_map"].dataType == T.MapType(
        T.StringType(), T.StringType(), valueContainsNull=False
    )


# ---------------------------------------------------------------------------
# Messages & nesting
# ---------------------------------------------------------------------------


def test_nested_message_nullable_struct() -> None:
    f = SCHEMA["message_value"]
    assert f.nullable is True, "message fields have presence"
    assert f.dataType == T.StructType(
        [
            T.StructField("nested_int", T.IntegerType(), nullable=False),
            T.StructField("nested_text", T.StringType(), nullable=False),
        ]
    )
    rep = SCHEMA["message_values"]
    assert rep.nullable is False
    assert rep.dataType == T.ArrayType(f.dataType, containsNull=False)


def test_nested_schema_equals_top_level() -> None:
    """The schema of a nested message matches the message's own schema
    (reference ``tests/data/test_schema.py:85-104``)."""
    nested = message_type_to_schema(fixtures.NESTED_EXAMPLE, CFG)
    assert T.StructType(nested["example_message"].dataType.fields) == SCHEMA


# ---------------------------------------------------------------------------
# Maps
# ---------------------------------------------------------------------------


def test_map_types() -> None:
    assert SCHEMA["int32_string_map"].dataType == T.MapType(
        T.IntegerType(), T.StringType(), valueContainsNull=False
    )
    assert SCHEMA["int32_string_map"].nullable is False
    assert SCHEMA["string_double_map"].dataType == T.MapType(
        T.StringType(), T.DoubleType(), valueContainsNull=False
    )
    assert SCHEMA["string_message_map"].dataType == T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField("nested_int", T.IntegerType(), nullable=False),
                T.StructField("nested_text", T.StringType(), nullable=False),
            ]
        ),
        valueContainsNull=False,
    )


def test_map_as_list() -> None:
    s = message_type_to_schema(fixtures.EXAMPLE, ProtarrowSparkConfig(map_as_list=True))
    assert s["int32_string_map"].dataType == T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.IntegerType(), nullable=False),
                T.StructField("value", T.StringType(), nullable=False),
            ]
        ),
        containsNull=False,
    )


# ---------------------------------------------------------------------------
# Nullability knobs (the reference's four, common.py:53-56)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("flag", [True, False])
def test_list_nullable_config(flag: bool) -> None:
    s = message_type_to_schema(fixtures.EXAMPLE, ProtarrowSparkConfig(list_nullable=flag))
    assert s["double_values"].nullable is flag
    assert s["int32_string_map"].nullable is False  # maps use map_nullable


@pytest.mark.parametrize("flag", [True, False])
def test_map_nullable_config(flag: bool) -> None:
    s = message_type_to_schema(fixtures.EXAMPLE, ProtarrowSparkConfig(map_nullable=flag))
    assert s["int32_string_map"].nullable is flag
    assert s["double_values"].nullable is False  # lists use list_nullable


@pytest.mark.parametrize("flag", [True, False])
def test_list_value_nullable_config(flag: bool) -> None:
    s = message_type_to_schema(
        fixtures.EXAMPLE, ProtarrowSparkConfig(list_value_nullable=flag)
    )
    assert s["double_values"].dataType.containsNull is flag


@pytest.mark.parametrize("flag", [True, False])
def test_map_value_nullable_config(flag: bool) -> None:
    s = message_type_to_schema(
        fixtures.EXAMPLE, ProtarrowSparkConfig(map_value_nullable=flag)
    )
    assert s["int32_string_map"].dataType.valueContainsNull is flag
    s2 = message_type_to_schema(
        fixtures.EXAMPLE, ProtarrowSparkConfig(map_value_nullable=flag, map_as_list=True)
    )
    assert s2["int32_string_map"].dataType.elementType["value"].nullable is flag


# ---------------------------------------------------------------------------
# Field-number metadata
# ---------------------------------------------------------------------------


def test_field_number_metadata() -> None:
    s = message_type_to_schema(
        fixtures.EXAMPLE, ProtarrowSparkConfig(field_number_key="PARQUET:field_id")
    )
    by_number = {f.number: f.name for f in fixtures.EXAMPLE.fields}
    for field in s.fields:
        num = field.metadata["PARQUET:field_id"]
        assert by_number[num] == field.name
    assert message_type_to_schema(fixtures.EXAMPLE, CFG)["double_value"].metadata == {}


# ---------------------------------------------------------------------------
# Recursion & groups
# ---------------------------------------------------------------------------


def test_recursive_raises_by_default() -> None:
    with pytest.raises(TypeError, match="recursive"):
        message_type_to_schema(fixtures.RECURSIVE, CFG)


def test_recursive_pruned_when_skipped() -> None:
    s = message_type_to_schema(
        fixtures.RECURSIVE, ProtarrowSparkConfig(skip_recursive_messages=True)
    )
    assert s["name"].dataType == T.StringType()
    assert s["child"].dataType == T.StructType([]), "recursive branch pruned"
    assert s["children"].dataType == T.ArrayType(T.StructType([]), containsNull=False)


def test_group_unsupported() -> None:
    mt = MessageType(
        "protarrow_spark.test.HasGroup", (Field("g", 1, Kind.GROUP),)
    )
    with pytest.raises(TypeError, match="group"):
        message_type_to_schema(mt, CFG)


# ---------------------------------------------------------------------------
# struct_type/schema parity + config validation
# ---------------------------------------------------------------------------


def test_struct_type_matches_schema() -> None:
    assert message_type_to_struct_type(fixtures.EXAMPLE, CFG) == SCHEMA


@pytest.mark.parametrize(
    "kwargs",
    [
        {"enum_type": "dictionary"},
        {"uint64_type": "int"},
        {"timestamp_type": "ns"},
        {"duration_type": "nanos"},
    ],
)
def test_config_validation(kwargs: dict) -> None:
    with pytest.raises(ValueError):
        ProtarrowSparkConfig(**kwargs)
