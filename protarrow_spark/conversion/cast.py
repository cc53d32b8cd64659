"""Schema conformance: cast an arbitrary DataFrame to a proto schema.

Re-expresses the reference's cast path (``cast_to_proto.py:196-253``:
project + cast + default-fill + missing-column synthesis) as a PURE
Catalyst expression builder — one ``select`` of conforming
expressions, no UDFs, fully codegen'd and pushdown-friendly. SURVEY
§3.3 calls this "the most valuable piece to make a first-class API":
it is the engine's schema-evolution / contract-enforcement operator.

Behavior (mirroring ``cast_to_proto.py``):

* columns are matched by name against the descriptor, reordered to
  descriptor order, unknown columns dropped (``cast_to_proto.py:203-207``);
* missing columns are synthesized: null for presence fields, proto
  default for plain scalars, empty array/map for repeated/maps
  (``get_casted_array``, ``cast_to_proto.py:166-193``);
* existing columns cast recursively: scalars via ``cast``, arrays via
  ``transform``, maps via ``map_from_arrays`` / ``map_entries`` /
  ``map_from_entries`` (including list-as-map in both directions,
  ``cast_to_proto.py:105-163``), structs rebuilt field-by-field;
* non-presence scalars are null-filled with proto defaults after the
  cast (``_cast_flat_array``, ``cast_to_proto.py:71-102``);
* enums convert between number and name representations with the
  reference's fallbacks (unknown number -> first declared name,
  unknown name -> 0).

Scale: everything stays in whole-stage codegen; a conform over 100 TB
is a zero-shuffle projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.proto.model import (
    WRAPPER_TYPES,
    EnumType,
    Field,
    Kind,
    MessageType,
    TIMESTAMP,
    DURATION,
    DATE,
    TIME_OF_DAY,
    EMPTY,
)
from protarrow_spark.schema import field_to_struct_field, message_type_to_schema

_NUMERIC_DEFAULT_KINDS = {
    Kind.INT32,
    Kind.INT64,
    Kind.UINT32,
    Kind.UINT64,
    Kind.SINT32,
    Kind.SINT64,
    Kind.FIXED32,
    Kind.FIXED64,
    Kind.SFIXED32,
    Kind.SFIXED64,
}


def _enum_name_expr(col: Column, enum: EnumType) -> Column:
    """number -> name with unknown-number fallback to the first
    declared value (``proto_to_arrow.py:242-262``)."""
    mapping = F.create_map(
        *[F.lit(x) for number, name in enum.values for x in (number, name)]
    )
    return F.coalesce(mapping[col.cast("int")], F.lit(enum.fallback_name))


def _enum_number_expr(col: Column, enum: EnumType) -> Column:
    """name -> number with unknown-name fallback to 0
    (``arrow_to_proto.py:284-289``)."""
    mapping = F.create_map(
        *[F.lit(x) for number, name in enum.values for x in (name, number)]
    )
    return F.coalesce(mapping[col], F.lit(0))


def _default_literal(field: Field, config: ProtarrowSparkConfig) -> Column:
    """Proto default as a literal of the target Spark type
    (``get_arrow_default_value``, ``cast_to_proto.py:28-46``)."""
    kind = field.kind
    if kind is Kind.ENUM:
        if config.enum_type == "string":
            return F.lit(field.enum.by_number.get(0, field.enum.fallback_name))
        return F.lit(0)
    if kind is Kind.BOOL:
        return F.lit(False)
    if kind is Kind.STRING:
        return F.lit("")
    if kind is Kind.BYTES:
        return F.lit(b"")
    if kind in (Kind.DOUBLE, Kind.FLOAT):
        return F.lit(0.0).cast(_target_type(field, config))
    if kind in _NUMERIC_DEFAULT_KINDS:
        return F.lit(0).cast(_target_type(field, config))
    raise TypeError(f"no scalar default for {kind}")  # pragma: no cover


def _target_type(field: Field, config: ProtarrowSparkConfig) -> T.DataType:
    """Spark type of one occurrence of the field's value."""
    single = Field(
        field.name,
        field.number,
        field.kind,
        repeated=False,
        optional=field.optional,
        message=field.message,
        enum=field.enum,
        oneof=field.oneof,
    )
    return field_to_struct_field(single, config).dataType


def _is_enum_string_source(src: T.DataType) -> bool:
    return isinstance(src, T.StringType)


def _cast_value(
    col: Column, src: T.DataType, field: Field, config: ProtarrowSparkConfig
) -> Column:
    """Cast ONE occurrence of a field's value (``_cast_array``,
    ``cast_to_proto.py:105-163``)."""
    target = _target_type(field, config)
    if field.kind is Kind.ENUM:
        if config.enum_type == "string":
            if _is_enum_string_source(src):
                return col  # already names
            return _enum_name_expr(col, field.enum)
        if _is_enum_string_source(src):
            return _enum_number_expr(col, field.enum)
        return col.cast(target)
    if field.kind is Kind.MESSAGE:
        wkt = field.message.full_name
        if wkt in WRAPPER_TYPES or wkt in (
            TIMESTAMP.full_name,
            DURATION.full_name,
            DATE.full_name,
            TIME_OF_DAY.full_name,
            EMPTY.full_name,
        ):
            return col.cast(target)
        return _cast_struct(col, src, field.message, config)
    return col.cast(target)


def _cast_struct(
    col: Column, src: T.DataType, mtype: MessageType, config: ProtarrowSparkConfig
) -> Column:
    """Rebuild a struct column field-by-field against ``mtype``,
    synthesizing missing subfields; null structs stay null."""
    src_fields = (
        {f.name: f.dataType for f in src.fields} if isinstance(src, T.StructType) else {}
    )
    parts = []
    for sub in mtype.fields:
        if sub.name in src_fields:
            sub_col = col.getField(sub.name)
            parts.append(
                _conform_field(sub_col, src_fields[sub.name], sub, config).alias(sub.name)
            )
        else:
            parts.append(_missing_field(sub, config).alias(sub.name))
    rebuilt = F.struct(*parts)
    # preserve outer-struct nullness (presence mask semantics)
    return F.when(col.isNotNull(), rebuilt)


def _conform_field(
    col: Column, src: T.DataType, field: Field, config: ProtarrowSparkConfig
) -> Column:
    """Cast a full field occurrence incl. repeated/map shapes."""
    if field.is_map:
        entry = field.message
        key_f, val_f = entry.fields_by_number[1], entry.fields_by_number[2]
        # normalize source to entries (works for MapType AND
        # list<struct<key,value>> sources — list-as-map both ways,
        # cast_to_proto.py:110-140)
        if isinstance(src, T.MapType):
            entries = F.map_entries(col)
            key_src, val_src = src.keyType, src.valueType
        elif isinstance(src, T.ArrayType) and isinstance(src.elementType, T.StructType):
            entries = col
            elem = src.elementType
            key_src = elem["key"].dataType
            val_src = elem["value"].dataType
        else:
            raise TypeError(f"cannot cast {src} to map field {field.name}")
        casted = F.transform(
            entries,
            lambda e: F.struct(
                _cast_value(e.getField("key"), key_src, key_f, config).alias("key"),
                _cast_value(e.getField("value"), val_src, val_f, config).alias("value"),
            ),
        )
        out = casted if config.map_as_list else F.map_from_entries(casted)
        if not config.map_nullable:
            return F.coalesce(out, _missing_field(field, config))
        return out
    if field.repeated:
        if not isinstance(src, T.ArrayType):
            raise TypeError(f"cannot cast {src} to repeated field {field.name}")
        out = F.transform(col, lambda e: _cast_value(e, src.elementType, field, config))
        if not config.list_nullable:
            return F.coalesce(out, F.array().cast(f"array<{_target_type(field, config).simpleString()}>"))
        return out
    out = _cast_value(col, src, field, config)
    if not field.has_presence and field.kind is not Kind.MESSAGE:
        # non-presence scalars null-fill with the proto default
        # (_cast_flat_array, cast_to_proto.py:100)
        return F.coalesce(out, _default_literal(field, config))
    return out


def _missing_field(field: Field, config: ProtarrowSparkConfig) -> Column:
    """Synthesize a column absent from the source
    (``get_casted_array``, ``cast_to_proto.py:166-193``)."""
    struct_field = field_to_struct_field(field, config)
    if field.is_map or field.repeated:
        if field.is_map and not config.map_as_list:
            return F.map_from_entries(
                F.array().cast(
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("key", struct_field.dataType.keyType, False),
                                T.StructField("value", struct_field.dataType.valueType, True),
                            ]
                        )
                    ).simpleString()
                )
            )
        return F.array().cast(struct_field.dataType.simpleString())
    if field.has_presence:
        return F.lit(None).cast(struct_field.dataType)
    return _default_literal(field, config)


def conform_expr(
    df: DataFrame, field: Field, config: ProtarrowSparkConfig
) -> Column:
    """The conforming expression for one top-level field of ``df``."""
    src_types = {f.name: f.dataType for f in df.schema.fields}
    if field.name in src_types:
        return _conform_field(
            F.col(field.name), src_types[field.name], field, config
        ).alias(field.name)
    return _missing_field(field, config).alias(field.name)


def cast_dataframe(
    df: DataFrame,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """Conform ``df`` to ``mtype``'s schema (reference ``cast_table``,
    ``cast_to_proto.py:243-253``): descriptor order, unknown columns
    dropped, missing columns synthesized, values cast recursively.

    One zero-shuffle ``select`` — Catalyst folds the casts into
    whole-stage codegen and pushdown still reaches the scan.
    """
    projected = df.select(*[conform_expr(df, f, config) for f in mtype.fields])
    # carry field metadata (field numbers, logical-type tags) onto the
    # result; nullability stays advisory in Spark but values conform
    # by construction (defaults coalesced above)
    target = message_type_to_schema(mtype, config)
    cols = [
        F.col(f.name).alias(f.name, metadata=dict(f.metadata))
        if f.metadata
        else F.col(f.name)
        for f in target.fields
    ]
    return projected.select(*cols)
