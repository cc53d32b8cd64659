"""Descriptor -> Spark schema mapping.

Re-expresses the reference's schema derivation
(``proto_to_arrow.py:267-383,716-741``) for Spark's type system, with
the SURVEY.md §1.2 policy decisions:

* uint32 widens to LongType (Spark has no unsigned ints).
* uint64 -> DecimalType(20,0) (exact) or LongType (config).
* Timestamp -> TimestampType (µs) or LongType epoch-nanos (config).
* Duration -> DayTimeIntervalType (µs) or LongType nanos (config).
* TimeOfDay -> LongType nanos-of-day + metadata tag (no Spark type).
* enum -> IntegerType or StringType (config; no dictionary type).
* nullability from field presence (``proto_to_arrow.py:593-601``):
  plain scalars/lists/maps non-nullable, presence fields nullable,
  relaxable via the four config knobs.
* recursion: TypeError, or prune to empty struct when
  ``skip_recursive_messages`` (``proto_to_arrow.py:208-216``).
* ``field_number_key`` writes proto field numbers into StructField
  metadata (``common.py:59,89-93``).
"""

from __future__ import annotations

from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.proto.model import (
    DATE,
    DURATION,
    EMPTY,
    TIME_OF_DAY,
    TIMESTAMP,
    WRAPPER_TYPES,
    Field,
    Kind,
    MessageType,
)

#: metadata key marking a LongType column as nanos-of-day (TimeOfDay).
TIME_OF_DAY_METADATA = {"protarrow_spark.logical_type": "time_of_day_nanos"}
#: metadata key marking a LongType column as epoch-nanos (Timestamp).
TIMESTAMP_NANOS_METADATA = {"protarrow_spark.logical_type": "timestamp_nanos"}
DURATION_NANOS_METADATA = {"protarrow_spark.logical_type": "duration_nanos"}

_PRIMITIVE_TYPES: dict[Kind, T.DataType] = {
    Kind.BOOL: T.BooleanType(),
    Kind.DOUBLE: T.DoubleType(),
    Kind.FLOAT: T.FloatType(),
    Kind.INT32: T.IntegerType(),
    Kind.SINT32: T.IntegerType(),
    Kind.SFIXED32: T.IntegerType(),
    Kind.INT64: T.LongType(),
    Kind.SINT64: T.LongType(),
    Kind.SFIXED64: T.LongType(),
    # Spark has no unsigned types: widen uint32 to long (lossless).
    Kind.UINT32: T.LongType(),
    Kind.FIXED32: T.LongType(),
    Kind.STRING: T.StringType(),
    Kind.BYTES: T.BinaryType(),
}


def _uint64_type(config: ProtarrowSparkConfig) -> T.DataType:
    return T.DecimalType(20, 0) if config.uint64_type == "decimal" else T.LongType()


def _timestamp_type(config: ProtarrowSparkConfig) -> T.DataType:
    return T.TimestampType() if config.timestamp_type == "timestamp" else T.LongType()


def _duration_type(config: ProtarrowSparkConfig) -> T.DataType:
    if config.duration_type == "interval":
        return T.DayTimeIntervalType(T.DayTimeIntervalType.DAY, T.DayTimeIntervalType.SECOND)
    return T.LongType()


def _wkt_type(mt: MessageType, config: ProtarrowSparkConfig) -> T.DataType | None:
    """Well-known-type dispatch (``proto_to_arrow.py:48-57``); returns
    None when ``mt`` is a plain message."""
    name = mt.full_name
    if name == TIMESTAMP.full_name:
        return _timestamp_type(config)
    if name == DURATION.full_name:
        return _duration_type(config)
    if name == DATE.full_name:
        return T.DateType()
    if name == TIME_OF_DAY.full_name:
        return T.LongType()  # nanos-of-day; metadata set by caller
    if name in WRAPPER_TYPES:
        kind = WRAPPER_TYPES[name]
        if kind is Kind.UINT64:
            return _uint64_type(config)
        if kind is Kind.ENUM:  # pragma: no cover — no enum wrappers exist
            raise AssertionError
        return _PRIMITIVE_TYPES[kind]
    if name == EMPTY.full_name:
        return T.StructType([])
    return None


def _scalar_type(field: Field, config: ProtarrowSparkConfig, trace: tuple[str, ...]) -> T.DataType:
    """Type of one (non-repeated) occurrence of the field."""
    if field.kind is Kind.GROUP:
        raise TypeError("proto2 groups are not supported")  # proto_to_arrow.py:378-383
    if field.kind is Kind.ENUM:
        return T.IntegerType() if config.enum_type == "int" else T.StringType()
    if field.kind in (Kind.UINT64, Kind.FIXED64):
        # Both map to pa.uint64() in the reference (proto_to_arrow.py:63);
        # follow the same uint64 widening policy here.
        return _uint64_type(config)
    if field.kind is Kind.MESSAGE:
        assert field.message is not None
        wkt = _wkt_type(field.message, config)
        if wkt is not None:
            return wkt
        return message_type_to_struct_type(field.message, config, _trace=trace)
    return _PRIMITIVE_TYPES[field.kind]


def _field_metadata(field: Field, config: ProtarrowSparkConfig) -> dict:
    meta: dict = {}
    if field.kind is Kind.MESSAGE and field.message is not None:
        if field.message.full_name == TIME_OF_DAY.full_name:
            meta.update(TIME_OF_DAY_METADATA)
        elif (
            field.message.full_name == TIMESTAMP.full_name
            and config.timestamp_type == "long_nanos"
        ):
            meta.update(TIMESTAMP_NANOS_METADATA)
        elif (
            field.message.full_name == DURATION.full_name
            and config.duration_type == "long_nanos"
        ):
            meta.update(DURATION_NANOS_METADATA)
    if config.field_number_key is not None:
        meta[config.field_number_key] = field.number
    return meta


def _field_nullable(field: Field, config: ProtarrowSparkConfig) -> bool:
    """Mirrors ``_proto_field_nullable`` (``proto_to_arrow.py:593-601``):
    plain scalars are non-nullable; only presence fields are nullable."""
    if field.is_map:
        return config.map_nullable
    if field.repeated:
        return config.list_nullable
    return field.has_presence


def field_to_struct_field(
    field: Field, config: ProtarrowSparkConfig, _trace: tuple[str, ...] = ()
) -> T.StructField:
    """Mirrors ``field_descriptor_to_field`` (``proto_to_arrow.py:267-323``)."""
    if field.is_map:
        entry = field.message
        assert entry is not None
        key_f, val_f = entry.fields_by_number[1], entry.fields_by_number[2]
        key_type = _scalar_type(key_f, config, _trace)
        val_type = _scalar_type(val_f, config, _trace)
        if config.map_as_list:
            dtype: T.DataType = T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", key_type, nullable=False),
                        T.StructField("value", val_type, nullable=config.map_value_nullable),
                    ]
                ),
                containsNull=False,
            )
        else:
            dtype = T.MapType(key_type, val_type, valueContainsNull=config.map_value_nullable)
        return T.StructField(
            field.name, dtype, nullable=config.map_nullable, metadata=_field_metadata(field, config)
        )
    scalar = _scalar_type(field, config, _trace)
    if field.repeated:
        return T.StructField(
            field.name,
            T.ArrayType(scalar, containsNull=config.list_value_nullable),
            nullable=config.list_nullable,
            metadata=_field_metadata(field, config),
        )
    return T.StructField(
        field.name,
        scalar,
        nullable=_field_nullable(field, config),
        metadata=_field_metadata(field, config),
    )


def message_type_to_struct_type(
    message_type: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    _trace: tuple[str, ...] = (),
) -> T.StructType:
    """Mirrors ``message_type_to_struct_type`` (``proto_to_arrow.py:730-741``)
    with the recursion policy of ``proto_to_arrow.py:208-216``."""
    if message_type.full_name in _trace:
        if config.skip_recursive_messages:
            return T.StructType([])
        raise TypeError(
            f"recursive message {message_type.full_name} "
            f"(set skip_recursive_messages=True to prune)"
        )
    trace = _trace + (message_type.full_name,)
    return T.StructType([field_to_struct_field(f, config, trace) for f in message_type.fields])


def message_type_to_schema(
    message_type: MessageType, config: ProtarrowSparkConfig = ProtarrowSparkConfig()
) -> T.StructType:
    """Top-level schema (mirrors ``message_type_to_schema``,
    ``proto_to_arrow.py:716-727``). In Spark a schema and a struct type
    are both StructType; kept as two functions for API parity."""
    return message_type_to_struct_type(message_type, config)
