"""Bridge: ``google.protobuf`` descriptors -> internal model.

When the real protobuf runtime is available, this adapter converts
``google.protobuf.descriptor.Descriptor`` objects (or generated
message classes) into the engine's internal :class:`MessageType`
model, so user code can call the public API with real descriptors
exactly like the reference (``protarrow/__init__.py:14-26``):

    from my_protos_pb2 import MyMessage
    mt = adapt_descriptor(MyMessage.DESCRIPTOR)
    df = messages_to_dataframe(spark, rows, mt)

The module itself never imports protobuf at import time (the library
is not installable in every environment); it duck-types against the
*public* descriptor API — ``fields``, ``name``/``number``/``type``/
``label``, ``message_type``/``enum_type``, ``has_presence``,
``GetOptions().map_entry`` — which also makes it testable with fake
descriptor objects.
"""

from __future__ import annotations

from typing import Any

from protarrow_spark.proto.model import (
    EnumType,
    Field,
    Kind,
    MessageType,
)

#: public FieldDescriptor.TYPE_* constants -> internal Kind.
_TYPE_TO_KIND: dict[int, Kind] = {
    1: Kind.DOUBLE,
    2: Kind.FLOAT,
    3: Kind.INT64,
    4: Kind.UINT64,
    5: Kind.INT32,
    6: Kind.FIXED64,
    7: Kind.FIXED32,
    8: Kind.BOOL,
    9: Kind.STRING,
    10: Kind.GROUP,
    11: Kind.MESSAGE,
    12: Kind.BYTES,
    13: Kind.UINT32,
    14: Kind.ENUM,
    15: Kind.SFIXED32,
    16: Kind.SFIXED64,
    17: Kind.SINT32,
    18: Kind.SINT64,
}

_LABEL_REPEATED = 3


def _adapt_enum(enum_descriptor: Any) -> EnumType:
    """EnumDescriptor -> EnumType, values in declaration order (the
    first declared value is the unknown-number fallback)."""
    return EnumType(
        full_name=enum_descriptor.full_name,
        values=tuple((v.number, v.name) for v in enum_descriptor.values),
    )


def _field_has_presence(fd: Any) -> bool:
    """Public ``FieldDescriptor.has_presence`` where available, with a
    fallback for older runtimes: message/group fields and proto2/
    proto3-optional scalars have presence; repeated never does."""
    if getattr(fd, "label", None) == _LABEL_REPEATED:
        return False
    has_presence = getattr(fd, "has_presence", None)
    if has_presence is not None:
        return bool(has_presence)
    return _TYPE_TO_KIND[fd.type] in (Kind.MESSAGE, Kind.GROUP)


def adapt_descriptor(
    descriptor: Any, _memo: dict[str, MessageType] | None = None
) -> MessageType:
    """``google.protobuf`` Descriptor (or generated message class with
    a ``DESCRIPTOR`` attribute) -> internal :class:`MessageType`.

    Recursive message graphs convert into self-referential
    MessageType graphs (memoized per full name); the schema layer's
    recursion policy (raise vs ``skip_recursive_messages``) then
    applies downstream, mirroring ``proto_to_arrow.py:208-216``.
    """
    descriptor = getattr(descriptor, "DESCRIPTOR", descriptor)
    memo = _memo if _memo is not None else {}
    full_name = descriptor.full_name
    if full_name in memo:
        return memo[full_name]

    mt = MessageType(
        full_name=full_name,
        fields=(),
        map_entry=bool(descriptor.GetOptions().map_entry),
    )
    memo[full_name] = mt  # register BEFORE walking fields (cycles)

    fields: list[Field] = []
    for fd in descriptor.fields:
        kind = _TYPE_TO_KIND[fd.type]
        repeated = getattr(fd, "label", None) == _LABEL_REPEATED
        message = None
        enum = None
        if kind in (Kind.MESSAGE, Kind.GROUP) and fd.message_type is not None:
            message = adapt_descriptor(fd.message_type, _memo=memo)
        if kind is Kind.ENUM:
            enum = _adapt_enum(fd.enum_type)
        oneof = _real_oneof_name(fd)
        fields.append(
            Field(
                name=fd.name,
                number=fd.number,
                kind=kind,
                repeated=repeated,
                optional=(not repeated)
                and oneof is None
                and kind not in (Kind.MESSAGE, Kind.GROUP)
                and _field_has_presence(fd),
                message=message,
                enum=enum,
                oneof=oneof,
            )
        )
    mt.fields = tuple(fields)
    return mt


def _real_oneof_name(fd: Any) -> str | None:
    """Name of the REAL oneof containing ``fd``, or None. proto3
    ``optional`` compiles to a synthetic one-member oneof named
    ``_<field>``; the public ``OneofDescriptor`` exposes that via
    ``is_synthetic`` (older runtimes: ``containing_oneof`` vs
    ``real_containing_oneof``) — synthetic groups map to plain
    ``optional`` in the internal model, real groups carry the oneof
    name so member-exclusion semantics survive the adaptation."""
    real = getattr(fd, "real_containing_oneof", _MISSING)
    if real is not _MISSING:
        return real.name if real is not None else None
    oo = getattr(fd, "containing_oneof", None)
    if oo is None or getattr(oo, "is_synthetic", False):
        return None
    return oo.name


_MISSING = object()


def message_class_to_schema(message_class: Any, config: Any = None):
    """Convenience parity entry point: generated message class ->
    Spark StructType (reference ``message_type_to_schema``)."""
    from protarrow_spark.config import ProtarrowSparkConfig
    from protarrow_spark.schema import message_type_to_schema

    mt = adapt_descriptor(message_class)
    return message_type_to_schema(mt, config or ProtarrowSparkConfig())
