"""Test-fixture message types covering the full proto type matrix.

Mirrors the coverage-by-construction strategy of the reference's
``protos/bench.proto:24-173`` (``ExampleMessage`` enumerates every
scalar kind x {plain, optional, repeated, map, wrapped}); the types
here are built on the engine's internal descriptor model so the same
fixtures drive schema tests, round-trip property tests, and the
driver-facing conversion CORRECTNESS queries.
"""

from __future__ import annotations

from protarrow_spark.proto.model import (
    BOOL_VALUE,
    BYTES_VALUE,
    DATE,
    DOUBLE_VALUE,
    DURATION,
    EMPTY,
    FLOAT_VALUE,
    INT32_VALUE,
    INT64_VALUE,
    STRING_VALUE,
    TIME_OF_DAY,
    TIMESTAMP,
    UINT32_VALUE,
    UINT64_VALUE,
    EnumType,
    Field,
    Kind,
    MessageType,
    map_field,
)

COLOR = EnumType(
    "protarrow_spark.test.Color",
    ((0, "COLOR_UNSPECIFIED"), (1, "RED"), (2, "GREEN"), (3, "BLUE")),
)

#: every scalar kind, in declaration order (field numbers 1..15).
SCALAR_KINDS = (
    Kind.DOUBLE,
    Kind.FLOAT,
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
    Kind.BOOL,
    Kind.STRING,
    Kind.BYTES,
)

WRAPPERS = (
    DOUBLE_VALUE,
    FLOAT_VALUE,
    INT32_VALUE,
    INT64_VALUE,
    UINT32_VALUE,
    UINT64_VALUE,
    BOOL_VALUE,
    STRING_VALUE,
    BYTES_VALUE,
)


def _n(kind: Kind) -> str:
    return kind.value


NESTED = MessageType(
    "protarrow_spark.test.Nested",
    (
        Field("nested_int", 1, Kind.INT32),
        Field("nested_text", 2, Kind.STRING),
    ),
)


def example_message_type() -> MessageType:
    """The full matrix: every scalar kind plain/optional/repeated,
    every wrapper, every WKT, enums, maps, nested messages."""
    fields: list[Field] = []
    num = 0

    def nxt() -> int:
        nonlocal num
        num += 1
        return num

    for kind in SCALAR_KINDS:
        fields.append(Field(f"{_n(kind)}_value", nxt(), kind))
    for kind in SCALAR_KINDS:
        fields.append(Field(f"{_n(kind)}_values", nxt(), kind, repeated=True))
    for kind in (Kind.INT32, Kind.STRING, Kind.DOUBLE, Kind.BOOL):
        fields.append(Field(f"optional_{_n(kind)}_value", nxt(), kind, optional=True))
    for wrapper in WRAPPERS:
        # DoubleValue -> wrapped_double_value (reference naming).
        short = "".join(
            ("_" + c.lower()) if c.isupper() else c for c in wrapper.name
        ).lstrip("_")
        fields.append(Field(f"wrapped_{short}", nxt(), Kind.MESSAGE, message=wrapper))
    fields.extend(
        [
            Field("enum_value", nxt(), Kind.ENUM, enum=COLOR),
            Field("enum_values", nxt(), Kind.ENUM, repeated=True, enum=COLOR),
            Field("timestamp_value", nxt(), Kind.MESSAGE, message=TIMESTAMP),
            Field("timestamp_values", nxt(), Kind.MESSAGE, repeated=True, message=TIMESTAMP),
            Field("date_value", nxt(), Kind.MESSAGE, message=DATE),
            Field("time_of_day_value", nxt(), Kind.MESSAGE, message=TIME_OF_DAY),
            Field("duration_value", nxt(), Kind.MESSAGE, message=DURATION),
            Field("empty_value", nxt(), Kind.MESSAGE, message=EMPTY),
            map_field(
                "int32_string_map",
                nxt(),
                Kind.INT32,
                Kind.STRING,
                entry_full_name="protarrow_spark.test.Example.Int32StringMapEntry",
            ),
            map_field(
                "string_double_map",
                nxt(),
                Kind.STRING,
                Kind.DOUBLE,
                entry_full_name="protarrow_spark.test.Example.StringDoubleMapEntry",
            ),
            map_field(
                "string_message_map",
                nxt(),
                Kind.STRING,
                Kind.MESSAGE,
                value_message=NESTED,
                entry_full_name="protarrow_spark.test.Example.StringMessageMapEntry",
            ),
            map_field(
                "string_enum_map",
                nxt(),
                Kind.STRING,
                Kind.ENUM,
                value_enum=COLOR,
                entry_full_name="protarrow_spark.test.Example.StringEnumMapEntry",
            ),
            Field("message_value", nxt(), Kind.MESSAGE, message=NESTED),
            Field("message_values", nxt(), Kind.MESSAGE, repeated=True, message=NESTED),
            # real oneof group (reference exercises oneofs through its
            # random generator, tests/random_generator.py:83-90): one
            # scalar, one message, one enum member — at most one set.
            Field("payload_text", nxt(), Kind.STRING, oneof="payload"),
            Field("payload_number", nxt(), Kind.INT64, oneof="payload"),
            Field("payload_nested", nxt(), Kind.MESSAGE, message=NESTED, oneof="payload"),
            Field("payload_color", nxt(), Kind.ENUM, enum=COLOR, oneof="payload"),
        ]
    )
    return MessageType("protarrow_spark.test.Example", tuple(fields))


EXAMPLE = example_message_type()

NESTED_EXAMPLE = MessageType(
    "protarrow_spark.test.NestedExample",
    (
        Field("example_message", 1, Kind.MESSAGE, message=EXAMPLE),
        Field("repeated_examples", 2, Kind.MESSAGE, repeated=True, message=NESTED),
    ),
)


def recursive_message_type() -> MessageType:
    """Self-referential message (mirrors the reference's recursion
    tests, ``tests/test_conversion_recursive_messages.py:24-120``)."""
    rec = MessageType("protarrow_spark.test.Recursive", ())
    rec.fields = (
        Field("name", 1, Kind.STRING),
        Field("child", 2, Kind.MESSAGE, message=rec),
        Field("children", 3, Kind.MESSAGE, repeated=True, message=rec),
    )
    return rec


# ---------------------------------------------------------------------------
# The reference's four distinct recursion shapes
# (protos/bench.proto:191-222, exercised with data files by
# tests/test_conversion_recursive_messages.py:24-120): direct
# self-reference, a 3-message cycle, repeated self-reference, and
# map-valued self-reference. Builders return FRESH graphs (the types
# are mutable and self-referential, so sharing a module-level instance
# across mutating tests would alias).
# ---------------------------------------------------------------------------


def recursive_self_type() -> MessageType:
    """A -> A: message field of its own type + a scalar."""
    rec = MessageType("protarrow_spark.test.RecursiveSelf", ())
    rec.fields = (
        Field("next", 1, Kind.MESSAGE, message=rec),
        Field("depth", 2, Kind.INT32),
    )
    return rec


def recursive_nested_cycle_types() -> tuple[MessageType, MessageType, MessageType]:
    """A -> B -> C -> A: recursion through a 3-message cycle (the
    trace at prune/raise time lists all three)."""
    l1 = MessageType("protarrow_spark.test.RecursiveNested1", ())
    l2 = MessageType("protarrow_spark.test.RecursiveNested2", ())
    l3 = MessageType("protarrow_spark.test.RecursiveNested3", ())
    l1.fields = (
        Field("name", 1, Kind.STRING),
        Field("next", 2, Kind.MESSAGE, message=l2),
    )
    l2.fields = (
        Field("name", 1, Kind.STRING),
        Field("next", 2, Kind.MESSAGE, message=l3),
    )
    l3.fields = (
        Field("name", 1, Kind.STRING),
        Field("next", 2, Kind.MESSAGE, message=l1),
    )
    return l1, l2, l3


def recursive_repeated_type() -> MessageType:
    """A -> repeated A: recursion through a list field."""
    rec = MessageType("protarrow_spark.test.RecursiveRepeated", ())
    rec.fields = (
        Field("depth", 1, Kind.INT32),
        Field("children", 2, Kind.MESSAGE, repeated=True, message=rec),
    )
    return rec


def recursive_map_type() -> MessageType:
    """A -> map<string, A>: recursion through a map value."""
    rec = MessageType("protarrow_spark.test.RecursiveMap", ())
    rec.fields = (
        Field("name", 1, Kind.STRING),
        map_field(
            "children_map",
            2,
            Kind.STRING,
            Kind.MESSAGE,
            value_message=rec,
            entry_full_name="protarrow_spark.test.RecursiveMap.ChildrenMapEntry",
        ),
    )
    return rec


RECURSIVE = recursive_message_type()
