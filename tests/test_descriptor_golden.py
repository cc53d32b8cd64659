"""Vendored descriptor-set golden: a FileDescriptorSet built by an
INDEPENDENT inline wire encoder (raw tag/varint packing written here,
sharing no code with protarrow_spark.proto.message), pinned byte-exact
in tests/data/golden_fds.bin.

Pins, without needing google.protobuf in the sandbox:
  1. read_descriptor_set accepts externally-shaped descriptor bytes —
     field numbers/wire types straight from the published
     descriptor.proto (google/protobuf/descriptor.proto), not from
     this repo's serializer;
  2. the rebuilt model has the exact field names/numbers/kinds/labels,
     proto3 optional presence, nested message, nested enum, and
     map<string,int64> semantics the golden encodes;
  3. write_descriptor_set(model) re-read equals the golden's model
     structurally (cross-runtime shape compatibility modulo ordering).

The (environment-gated) descriptor_pool test remains the live-protoc
acceptance check; this one always runs.
"""

from __future__ import annotations

import pathlib

from protarrow_spark.proto.descriptor_set import (
    read_descriptor_set,
    write_descriptor_set,
)
from protarrow_spark.proto.model import Kind

DATA = pathlib.Path(__file__).parent / "data"


# ---------------------------------------------------------------------------
# Independent minimal proto wire encoder (no imports from the package)
# ---------------------------------------------------------------------------

def _vv(n: int) -> bytes:  # varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wt: int) -> bytes:
    return _vv((field << 3) | wt)


def _len(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _vv(len(payload)) + payload


def _s(field: int, text: str) -> bytes:
    return _len(field, text.encode())


def _i(field: int, n: int) -> bytes:
    return _tag(field, 0) + _vv(n)


# descriptor.proto field numbers (public):
# FileDescriptorSet.file = 1
# FileDescriptorProto: name=1 package=2 message_type=4 enum_type=5 syntax=12
# DescriptorProto: name=1 field=2 nested_type=3 enum_type=4 oneof_decl=8
#                  options=7
# MessageOptions.map_entry = 7
# FieldDescriptorProto: name=1 number=3 label=4 type=5 type_name=6
#                       oneof_index=9 proto3_optional=17
# EnumDescriptorProto: name=1 value=2
# EnumValueDescriptorProto: name=1 number=2
# OneofDescriptorProto: name=1
# labels: OPTIONAL=1 REPEATED=3 ; types: double=1 int64=3 int32=5
#         string=9 message=11 enum=14

def _field(
    name: str,
    number: int,
    ftype: int,
    label: int = 1,
    type_name: str | None = None,
    oneof_index: int | None = None,
    proto3_optional: bool = False,
) -> bytes:
    b = _s(1, name) + _i(3, number) + _i(4, label) + _i(5, ftype)
    if type_name:
        b += _s(6, type_name)
    if oneof_index is not None:
        b += _i(9, oneof_index)
    if proto3_optional:
        b += _i(17, 1)
    return b


def golden_bytes() -> bytes:
    # nested message N { string s = 1; }
    msg_n = _s(1, "N") + _len(2, _field("s", 1, 9))
    # map entry MEntry { string key = 1; int64 value = 2; } map_entry=true
    map_entry = (
        _s(1, "MEntry")
        + _len(2, _field("key", 1, 9))
        + _len(2, _field("value", 2, 3))
        + _len(7, _i(7, 1))  # options.map_entry = true
    )
    # enum E { E_UNSPEC = 0; E_ONE = 1; } (nested in G)
    enum_def = (
        _s(1, "E")
        + _len(2, _s(1, "E_UNSPEC") + _i(2, 0))
        + _len(2, _s(1, "E_ONE") + _i(2, 1))
    )
    msg_g = (
        _s(1, "G")
        + _len(2, _field("id", 1, 3))
        + _len(2, _field("name", 2, 9))
        + _len(2, _field("xs", 3, 5, label=3))
        + _len(
            2,
            _field("opt", 4, 1, oneof_index=0, proto3_optional=True),
        )
        + _len(2, _field("e", 5, 14, type_name=".g.G.E"))
        + _len(2, _field("n", 6, 11, type_name=".g.G.N"))
        + _len(2, _field("m", 7, 11, label=3, type_name=".g.G.MEntry"))
        + _len(3, msg_n)
        + _len(3, map_entry)
        + _len(4, enum_def)
        + _len(8, _s(1, "_opt"))  # oneof_decl[0] = "_opt" (synthetic)
    )
    file_proto = (
        _s(1, "golden.proto") + _s(2, "g") + _len(4, msg_g) + _s(12, "proto3")
    )
    return _len(1, file_proto)


def test_golden_bytes_pinned():
    """The vendored file is exactly what the inline encoder produces —
    drift in either direction fails."""
    assert (DATA / "golden_fds.bin").read_bytes() == golden_bytes()


def _model():
    messages, enums = read_descriptor_set((DATA / "golden_fds.bin").read_bytes())
    return messages, enums


def test_reader_rebuilds_golden_model():
    messages, enums = _model()
    g = messages["g.G"]
    by = {f.name: f for f in g.fields}
    assert [f.name for f in g.fields] == ["id", "name", "xs", "opt", "e", "n", "m"]
    assert (by["id"].number, by["id"].kind) == (1, Kind.INT64)
    assert (by["name"].number, by["name"].kind) == (2, Kind.STRING)
    assert by["xs"].repeated and by["xs"].kind == Kind.INT32
    assert by["opt"].optional and by["opt"].kind == Kind.DOUBLE
    assert by["e"].kind == Kind.ENUM and by["e"].enum.full_name == "g.G.E"
    assert by["e"].enum.values == ((0, "E_UNSPEC"), (1, "E_ONE"))
    assert by["n"].kind == Kind.MESSAGE and by["n"].message.full_name == "g.G.N"
    # map<string,int64>: the reader surfaces protobuf map semantics
    m = by["m"]
    assert m.repeated and m.message is not None and m.message.map_entry
    kv = {f.name: f for f in m.message.fields}
    assert kv["key"].kind == Kind.STRING and kv["value"].kind == Kind.INT64


def test_writer_output_matches_golden_structurally():
    """write_descriptor_set of the golden's model, re-read, must equal
    the golden's model: same types, fields, numbers, kinds, labels,
    presence, map-entry flags — cross-runtime shape compatibility
    modulo field ordering inside the descriptor."""
    messages, _ = _model()
    rewritten = write_descriptor_set([messages["g.G"]])
    messages2, enums2 = read_descriptor_set(rewritten)
    g1, g2 = messages["g.G"], messages2["g.G"]

    def sig(mt, seen=None):
        seen = seen or set()
        if mt.full_name in seen:
            return mt.full_name
        seen = seen | {mt.full_name}
        return (
            mt.full_name,
            mt.map_entry,
            tuple(
                (
                    f.name,
                    f.number,
                    f.kind,
                    f.repeated,
                    f.optional,
                    f.oneof,
                    f.enum.full_name if f.enum else None,
                    sig(f.message, seen) if f.message else None,
                )
                for f in sorted(mt.fields, key=lambda f: f.number)
            ),
        )

    assert sig(g1) == sig(g2)
    assert "g.G.E" in enums2
