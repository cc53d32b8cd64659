"""FileDescriptorSet codec round-trip: the protoc artifact written and
read back with the engine's own wire codec must rebuild a model that
is structurally identical, derives the identical Spark schema, and
parses the original model's wire bytes bit-for-bit."""

from __future__ import annotations

import random

from protarrow_spark.proto import fixtures
from protarrow_spark.proto.descriptor_set import (
    read_descriptor_set,
    write_descriptor_set,
)
from protarrow_spark.proto.message import parse, serialize
from protarrow_spark.proto.model import MessageType
from tests.random_messages import random_message


def _assert_same_model(a: MessageType, b: MessageType, seen: set[str]) -> None:
    assert a.full_name == b.full_name
    if a.full_name in seen:
        return
    seen.add(a.full_name)
    assert a.map_entry == b.map_entry, a.full_name
    assert [f.name for f in a.fields] == [f.name for f in b.fields], a.full_name
    for fa, fb in zip(a.fields, b.fields):
        ctx = f"{a.full_name}.{fa.name}"
        assert fa.number == fb.number, ctx
        assert fa.kind == fb.kind, ctx
        assert fa.repeated == fb.repeated, ctx
        assert fa.optional == fb.optional, ctx
        assert fa.oneof == fb.oneof, ctx
        if fa.enum is not None:
            assert fb.enum is not None and fa.enum.values == fb.enum.values, ctx
        if fa.message is not None:
            assert fb.message is not None, ctx
            _assert_same_model(fa.message, fb.message, seen)


def _roundtrip(root: MessageType) -> MessageType:
    data = write_descriptor_set([root])
    messages, _enums = read_descriptor_set(data)
    return messages[root.full_name]


def test_example_roundtrips_structurally():
    rebuilt = _roundtrip(fixtures.EXAMPLE)
    _assert_same_model(fixtures.EXAMPLE, rebuilt, set())


def test_recursive_shapes_roundtrip():
    for root in (
        fixtures.RECURSIVE,
        fixtures.recursive_self_type(),
        fixtures.recursive_repeated_type(),
        fixtures.recursive_map_type(),
    ):
        rebuilt = _roundtrip(root)
        _assert_same_model(root, rebuilt, set())


def test_mutually_recursive_cycle_roundtrips():
    l1, _l2, _l3 = fixtures.recursive_nested_cycle_types()
    rebuilt = _roundtrip(l1)
    _assert_same_model(l1, rebuilt, set())


def test_rebuilt_model_derives_identical_spark_schema():
    from protarrow_spark.schema import message_type_to_struct_type

    rebuilt = _roundtrip(fixtures.EXAMPLE)
    assert message_type_to_struct_type(rebuilt) == message_type_to_struct_type(
        fixtures.EXAMPLE
    )


def test_rebuilt_model_is_wire_compatible():
    """Bytes serialized under the original model parse identically
    under the rebuilt one — the interchange property the artifact
    exists for."""
    rebuilt = _roundtrip(fixtures.EXAMPLE)
    rng = random.Random(42)
    for _ in range(25):
        msg = random_message(fixtures.EXAMPLE, rng)
        data = serialize(msg)
        again = parse(data, rebuilt)
        assert serialize(again) == data


def test_wkt_full_names_survive():
    """WKT dispatch is by full name; the rebuilt model must keep
    google.protobuf.* names intact for schema derivation to treat
    them as timestamps/durations/wrappers."""
    data = write_descriptor_set([fixtures.EXAMPLE])
    messages, _ = read_descriptor_set(data)
    assert "google.protobuf.Timestamp" in messages
    assert "google.protobuf.Int64Value" in messages
