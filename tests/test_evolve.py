"""Schema-evolution diff: classification per the public protobuf
compatibility rules (conversion/evolve.py)."""

from __future__ import annotations

from protarrow_spark.conversion.evolve import breaking_changes, diff_contracts
from protarrow_spark.proto.model import EnumType, Field, Kind, MessageType

COLOR_V1 = EnumType("t.Color", ((0, "UNKNOWN"), (1, "RED")))
COLOR_V2 = EnumType("t.Color", ((0, "UNKNOWN"), (1, "RED"), (2, "BLUE")))


def _msg(name, *fields):
    return MessageType(name, tuple(fields))


def test_added_removed_renamed() -> None:
    old = _msg(
        "t.M",
        Field("a", 1, Kind.INT64),
        Field("gone", 2, Kind.STRING),
        Field("old_name", 3, Kind.BOOL),
    )
    new = _msg(
        "t.M",
        Field("a", 1, Kind.INT64),
        Field("new_name", 3, Kind.BOOL),
        Field("fresh", 4, Kind.DOUBLE),
    )
    changes = {(c.change, c.path) for c in diff_contracts(old, new)}
    assert changes == {
        ("field_removed", "gone"),
        ("field_renamed", "new_name"),
        ("field_added", "fresh"),
    }
    assert breaking_changes(old, new) == []


def test_kind_changes_use_wire_groups() -> None:
    old = _msg(
        "t.M",
        Field("widened", 1, Kind.INT32),
        Field("swapped", 2, Kind.STRING),
        Field("broken", 3, Kind.INT32),
        Field("fixed_broken", 4, Kind.FIXED32),
    )
    new = _msg(
        "t.M",
        Field("widened", 1, Kind.INT64),   # varint group: compatible
        Field("swapped", 2, Kind.BYTES),   # len group: compatible
        Field("broken", 3, Kind.DOUBLE),   # varint -> i64: breaking
        Field("fixed_broken", 4, Kind.FIXED64),  # i32 -> i64: breaking
    )
    by_path = {c.path: c for c in diff_contracts(old, new)}
    assert not by_path["widened"].breaking
    assert not by_path["swapped"].breaking
    assert by_path["broken"].breaking
    assert by_path["fixed_broken"].breaking
    assert {c.path for c in breaking_changes(old, new)} == {
        "broken", "fixed_broken"
    }


def test_label_and_presence_and_oneof() -> None:
    old = _msg(
        "t.M",
        Field("r", 1, Kind.INT64),
        Field("p", 2, Kind.INT64),
        Field("o", 3, Kind.STRING),
    )
    new = _msg(
        "t.M",
        Field("r", 1, Kind.INT64, repeated=True),
        Field("p", 2, Kind.INT64, optional=True),
        Field("o", 3, Kind.STRING, oneof="choice"),
    )
    by = {(c.path, c.change): c for c in diff_contracts(old, new)}
    assert by[("r", "label_changed")].breaking
    assert not by[("p", "presence_changed")].breaking
    # joining a oneof also grants presence -> two non-breaking changes
    assert not by[("o", "oneof_changed")].breaking
    assert not by[("o", "presence_changed")].breaking


def test_nested_recursion_and_enum_values() -> None:
    inner_old = _msg("t.Inner", Field("x", 1, Kind.INT32))
    inner_new = _msg(
        "t.Inner", Field("x", 1, Kind.INT32), Field("y", 2, Kind.INT32)
    )
    old = _msg(
        "t.M",
        Field("inner", 1, Kind.MESSAGE, message=inner_old),
        Field("color", 2, Kind.ENUM, enum=COLOR_V1),
    )
    new = _msg(
        "t.M",
        Field("inner", 1, Kind.MESSAGE, message=inner_new),
        Field("color", 2, Kind.ENUM, enum=COLOR_V2),
    )
    changes = {(c.change, c.path) for c in diff_contracts(old, new)}
    assert ("field_added", "inner.y") in changes
    assert ("enum_value_added", "color") in changes
    assert breaking_changes(old, new) == []


def test_map_value_type_change_is_breaking() -> None:
    """Map fields recurse into their entry message: changing the
    value kind across wire groups must fail the CI gate (LEN -> I32
    misparses old bytes)."""

    def map_entry(value_kind):
        return MessageType(
            "t.M.AttrsEntry",
            (Field("key", 1, Kind.STRING), Field("value", 2, value_kind)),
            map_entry=True,
        )

    old = _msg(
        "t.M",
        Field("attrs", 1, Kind.MESSAGE, repeated=True, message=map_entry(Kind.STRING)),
    )
    new = _msg(
        "t.M",
        Field("attrs", 1, Kind.MESSAGE, repeated=True, message=map_entry(Kind.FIXED32)),
    )
    broken = breaking_changes(old, new)
    assert [c.path for c in broken] == ["attrs.value"]
    # wire-compatible value widening stays non-breaking
    assert breaking_changes(
        _msg("t.M", Field("attrs", 1, Kind.MESSAGE, repeated=True,
                          message=map_entry(Kind.INT32))),
        _msg("t.M", Field("attrs", 1, Kind.MESSAGE, repeated=True,
                          message=map_entry(Kind.INT64))),
    ) == []


def test_enum_to_uint64_not_breaking() -> None:
    """The language guide's enum group includes uint64."""
    old = _msg("t.M", Field("c", 1, Kind.ENUM, enum=COLOR_V1))
    new = _msg("t.M", Field("c", 1, Kind.UINT64))
    assert breaking_changes(old, new) == []


def test_identical_contracts_diff_empty() -> None:
    m = _msg("t.M", Field("a", 1, Kind.INT64), Field("b", 2, Kind.STRING))
    assert diff_contracts(m, m) == []
