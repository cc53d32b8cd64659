"""Adapter tests with duck-typed fake descriptors mimicking the public
``google.protobuf.descriptor`` API (the real runtime is not
installable here; the adapter deliberately duck-types so these fakes
exercise the same code paths)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.proto.adapter import adapt_descriptor, message_class_to_schema
from protarrow_spark.proto.model import Kind
from protarrow_spark.schema import message_type_to_schema


@dataclasses.dataclass
class FakeOptions:
    map_entry: bool = False


@dataclasses.dataclass
class FakeEnumValue:
    name: str
    number: int


@dataclasses.dataclass
class FakeEnum:
    full_name: str
    values: list[FakeEnumValue]


@dataclasses.dataclass
class FakeField:
    name: str
    number: int
    type: int
    label: int = 1  # LABEL_OPTIONAL
    message_type: Optional["FakeDescriptor"] = None
    enum_type: Optional[FakeEnum] = None
    has_presence: bool = False


@dataclasses.dataclass
class FakeDescriptor:
    full_name: str
    fields: list[FakeField]
    _options: FakeOptions = dataclasses.field(default_factory=FakeOptions)

    def GetOptions(self) -> FakeOptions:  # noqa: N802 — protobuf API
        return self._options


class FakeMessageClass:
    DESCRIPTOR: Any = None


TYPE_DOUBLE, TYPE_INT64, TYPE_UINT64 = 1, 3, 4
TYPE_BOOL, TYPE_STRING, TYPE_MESSAGE, TYPE_BYTES = 8, 9, 11, 12
TYPE_UINT32, TYPE_ENUM, TYPE_SINT64 = 13, 14, 18
LABEL_REPEATED = 3


def _example_descriptor() -> FakeDescriptor:
    color = FakeEnum(
        "ex.Color",
        [FakeEnumValue("UNKNOWN", 0), FakeEnumValue("RED", 1), FakeEnumValue("BLUE", 5)],
    )
    inner = FakeDescriptor(
        "ex.Inner", [FakeField("val", 1, TYPE_INT64)]
    )
    entry = FakeDescriptor(
        "ex.Outer.AttrsEntry",
        [FakeField("key", 1, TYPE_STRING), FakeField("value", 2, TYPE_INT64)],
        FakeOptions(map_entry=True),
    )
    return FakeDescriptor(
        "ex.Outer",
        [
            FakeField("id", 1, TYPE_INT64),
            FakeField("opt_name", 2, TYPE_STRING, has_presence=True),
            FakeField("big", 3, TYPE_UINT64),
            FakeField("flags", 4, TYPE_BOOL, label=LABEL_REPEATED),
            FakeField("color", 5, TYPE_ENUM, enum_type=color),
            FakeField("inner", 6, TYPE_MESSAGE, message_type=inner, has_presence=True),
            FakeField("attrs", 7, TYPE_MESSAGE, message_type=entry, label=LABEL_REPEATED),
            FakeField("blob", 8, TYPE_BYTES),
        ],
    )


def test_adapt_basic_fields() -> None:
    mt = adapt_descriptor(_example_descriptor())
    f = mt.fields_by_name
    assert f["id"].kind is Kind.INT64 and not f["id"].has_presence
    assert f["opt_name"].optional and f["opt_name"].has_presence
    assert f["big"].kind is Kind.UINT64
    assert f["flags"].repeated and f["flags"].kind is Kind.BOOL
    assert f["color"].enum.by_number == {0: "UNKNOWN", 1: "RED", 5: "BLUE"}
    assert f["color"].enum.fallback_name == "UNKNOWN"
    assert f["inner"].message.full_name == "ex.Inner"
    assert f["attrs"].is_map
    assert f["blob"].kind is Kind.BYTES


def test_adapt_message_class_wrapper() -> None:
    cls = FakeMessageClass()
    cls.DESCRIPTOR = _example_descriptor()
    schema = message_class_to_schema(cls)
    assert schema == message_type_to_schema(
        adapt_descriptor(_example_descriptor()), ProtarrowSparkConfig()
    )
    assert schema["attrs"].dataType == T.MapType(
        T.StringType(), T.LongType(), valueContainsNull=False
    )
    assert schema["opt_name"].nullable is True
    assert schema["id"].nullable is False


def test_adapt_recursive_graph() -> None:
    node = FakeDescriptor("ex.Node", [])
    node.fields = [
        FakeField("name", 1, TYPE_STRING),
        FakeField("children", 2, TYPE_MESSAGE, message_type=node, label=LABEL_REPEATED),
    ]
    mt = adapt_descriptor(node)
    assert mt.fields_by_name["children"].message is mt, "cycle preserved via memo"
    s = message_type_to_schema(mt, ProtarrowSparkConfig(skip_recursive_messages=True))
    assert s["children"].dataType == T.ArrayType(T.StructType([]), containsNull=False)


def test_shared_submessage_adapts_once() -> None:
    inner = FakeDescriptor("ex.Shared", [FakeField("v", 1, TYPE_DOUBLE)])
    outer = FakeDescriptor(
        "ex.Twice",
        [
            FakeField("a", 1, TYPE_MESSAGE, message_type=inner, has_presence=True),
            FakeField("b", 2, TYPE_MESSAGE, message_type=inner, has_presence=True),
        ],
    )
    mt = adapt_descriptor(outer)
    assert mt.fields_by_name["a"].message is mt.fields_by_name["b"].message


@dataclasses.dataclass
class FakeOneof:
    name: str
    is_synthetic: bool = False


def test_adapt_oneof_real_vs_synthetic() -> None:
    # modern runtime surface: real_containing_oneof present
    choice = FakeOneof("choice")
    d = _example_descriptor()
    fa = FakeField("as_str", 20, TYPE_STRING, has_presence=True)
    fb = FakeField("as_int", 21, TYPE_INT64, has_presence=True)
    fc = FakeField("maybe", 22, TYPE_STRING, has_presence=True)  # proto3 optional
    fa.real_containing_oneof = choice
    fb.real_containing_oneof = choice
    fc.real_containing_oneof = None  # synthetic oneof -> None here
    d.fields += [fa, fb, fc]
    mt = adapt_descriptor(d)
    f = mt.fields_by_name
    assert f["as_str"].oneof == "choice" and f["as_int"].oneof == "choice"
    assert f["as_str"].has_presence and not f["as_str"].optional
    assert f["maybe"].oneof is None and f["maybe"].optional
    assert set(x.name for x in mt.oneofs["choice"]) == {"as_str", "as_int"}


def test_adapt_oneof_older_runtime_fallback() -> None:
    # older runtime: only containing_oneof (+ is_synthetic flag)
    d = _example_descriptor()
    fa = FakeField("as_str", 20, TYPE_STRING, has_presence=True)
    fb = FakeField("maybe", 21, TYPE_INT64, has_presence=True)
    fa.containing_oneof = FakeOneof("choice")
    fb.containing_oneof = FakeOneof("_maybe", is_synthetic=True)
    d.fields += [fa, fb]
    mt = adapt_descriptor(d)
    assert mt.fields_by_name["as_str"].oneof == "choice"
    assert mt.fields_by_name["maybe"].oneof is None
    assert mt.fields_by_name["maybe"].optional
