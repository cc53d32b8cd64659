"""Native FileDescriptorSet codec: read and write the protoc
``--descriptor_set_out`` artifact with the engine's OWN wire codec —
no protobuf runtime required.

This closes the contract-interchange loop: the binary descriptor set
is the lingua franca of the proto ecosystem (it is what Spark's
built-in ``from_protobuf``/``to_protobuf`` take as ``descFilePath``,
what registries serve, and what every toolchain emits), and this
module converts it to/from the engine's internal model
(:mod:`protarrow_spark.proto.model`) by parsing ``descriptor.proto``
messages — themselves just proto messages with PUBLIC field numbers —
through :func:`protarrow_spark.proto.message.parse`.

Reference analogue: the reference binds contracts via compiled
``google.protobuf`` classes (its only option as a pyarrow library);
this engine additionally speaks the artifact format directly, so a
Spark cluster can load contracts where only the descriptor file
ships. Scope mirrors the model: proto3 + proto2 presence, oneofs
(incl. proto3 ``optional`` synthetic oneofs), maps, nested and
recursive types, enums; extensions/groups/custom options are out of
scope (as in the reference).
"""

from __future__ import annotations

from protarrow_spark.proto.message import Message, parse, serialize
from protarrow_spark.proto.model import EnumType, Field, Kind, MessageType

# ---------------------------------------------------------------------------
# descriptor.proto modeled with the engine's own model (public field
# numbers from google/protobuf/descriptor.proto).
# ---------------------------------------------------------------------------

_ENUM_VALUE_PROTO = MessageType(
    "google.protobuf.EnumValueDescriptorProto",
    (
        Field("name", 1, Kind.STRING, optional=True),
        Field("number", 2, Kind.INT32, optional=True),
    ),
)

_ENUM_PROTO = MessageType(
    "google.protobuf.EnumDescriptorProto",
    (
        Field("name", 1, Kind.STRING, optional=True),
        Field("value", 2, Kind.MESSAGE, repeated=True, message=_ENUM_VALUE_PROTO),
    ),
)

_FIELD_PROTO = MessageType(
    "google.protobuf.FieldDescriptorProto",
    (
        Field("name", 1, Kind.STRING, optional=True),
        Field("number", 3, Kind.INT32, optional=True),
        Field("label", 4, Kind.INT32, optional=True),  # enum on the wire
        Field("ftype", 5, Kind.INT32, optional=True),  # "type" collides with Message.type
        Field("type_name", 6, Kind.STRING, optional=True),
        Field("oneof_index", 9, Kind.INT32, optional=True),
        Field("proto3_optional", 17, Kind.BOOL, optional=True),
    ),
)

_ONEOF_PROTO = MessageType(
    "google.protobuf.OneofDescriptorProto",
    (Field("name", 1, Kind.STRING, optional=True),),
)

_MESSAGE_OPTIONS = MessageType(
    "google.protobuf.MessageOptions",
    (Field("map_entry", 7, Kind.BOOL, optional=True),),
)

_DESCRIPTOR_PROTO = MessageType("google.protobuf.DescriptorProto", ())
_DESCRIPTOR_PROTO.fields = (
    Field("name", 1, Kind.STRING, optional=True),
    Field("field", 2, Kind.MESSAGE, repeated=True, message=_FIELD_PROTO),
    Field("nested_type", 3, Kind.MESSAGE, repeated=True, message=_DESCRIPTOR_PROTO),
    Field("enum_type", 4, Kind.MESSAGE, repeated=True, message=_ENUM_PROTO),
    Field("options", 7, Kind.MESSAGE, optional=True, message=_MESSAGE_OPTIONS),
    Field("oneof_decl", 8, Kind.MESSAGE, repeated=True, message=_ONEOF_PROTO),
)

_FILE_PROTO = MessageType(
    "google.protobuf.FileDescriptorProto",
    (
        Field("name", 1, Kind.STRING, optional=True),
        Field("package", 2, Kind.STRING, optional=True),
        Field("dependency", 3, Kind.STRING, repeated=True),
        Field("message_type", 4, Kind.MESSAGE, repeated=True, message=_DESCRIPTOR_PROTO),
        Field("enum_type", 5, Kind.MESSAGE, repeated=True, message=_ENUM_PROTO),
        Field("syntax", 12, Kind.STRING, optional=True),
    ),
)

_FILE_SET = MessageType(
    "google.protobuf.FileDescriptorSet",
    (Field("file", 1, Kind.MESSAGE, repeated=True, message=_FILE_PROTO),),
)

#: FieldDescriptorProto.Type number <-> model Kind (public spec).
_TYPE_TO_KIND = {
    1: Kind.DOUBLE,
    2: Kind.FLOAT,
    3: Kind.INT64,
    4: Kind.UINT64,
    5: Kind.INT32,
    6: Kind.FIXED64,
    7: Kind.FIXED32,
    8: Kind.BOOL,
    9: Kind.STRING,
    11: Kind.MESSAGE,
    12: Kind.BYTES,
    13: Kind.UINT32,
    14: Kind.ENUM,
    15: Kind.SFIXED32,
    16: Kind.SFIXED64,
    17: Kind.SINT32,
    18: Kind.SINT64,
}
_KIND_TO_TYPE = {k: t for t, k in _TYPE_TO_KIND.items()}
_LABEL_REPEATED = 3
_LABEL_OPTIONAL = 1


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def read_descriptor_set(
    data: bytes,
) -> tuple[dict[str, MessageType], dict[str, EnumType]]:
    """Parse a binary FileDescriptorSet into the internal model.

    Returns (messages by full name, enums by full name). Recursive and
    mutually-recursive types resolve via the same two-pass bind the
    hand-built fixtures use: shell MessageTypes first, fields patched
    in once every type name is known.
    """
    fs = parse(data, _FILE_SET)
    messages: dict[str, MessageType] = {}
    enums: dict[str, EnumType] = {}
    pending: list[tuple[MessageType, Message, bool]] = []

    def register(dp: Message, prefix: str, proto2: bool) -> None:
        full = f"{prefix}.{dp.name}" if prefix else dp.name
        map_entry = bool(dp.HasField("options") and dp.options.map_entry)
        mt = MessageType(full, (), map_entry=map_entry)
        messages[full] = mt
        pending.append((mt, dp, proto2))
        for ep in dp.enum_type:
            _register_enum(ep, full)
        for nested in dp.nested_type:
            register(nested, full, proto2)

    def _register_enum(ep: Message, prefix: str) -> None:
        full = f"{prefix}.{ep.name}" if prefix else ep.name
        enums[full] = EnumType(
            full, tuple((v.number, v.name) for v in ep.value)
        )

    for fp in fs.file:
        pkg = fp.package
        # FileDescriptorProto.syntax is OMITTED for proto2 files (the
        # historical default); only "proto3"/"editions" mark the
        # no-presence regime. Every proto2 optional scalar carries
        # explicit presence without a synthetic oneof.
        proto2 = (not fp.HasField("syntax")) or fp.syntax == "proto2"
        for ep in fp.enum_type:
            _register_enum(ep, pkg)
        for dp in fp.message_type:
            register(dp, pkg, proto2)

    def resolve(name: str):
        n = name.lstrip(".")
        if n in messages:
            return messages[n]
        if n in enums:
            return enums[n]
        raise KeyError(f"descriptor set does not define {name!r}")

    for mt, dp, proto2 in pending:
        oneof_names = [od.name for od in dp.oneof_decl]
        fields = []
        for f in dp.field:
            kind = _TYPE_TO_KIND.get(f.ftype)
            if kind is None:
                raise ValueError(
                    f"unsupported descriptor type {f.ftype} on {mt.full_name}.{f.name}"
                    " (groups/extensions are out of scope)"
                )
            msg = enum = None
            if kind is Kind.MESSAGE:
                msg = resolve(f.type_name)
            elif kind is Kind.ENUM:
                enum = resolve(f.type_name)
            repeated = f.label == _LABEL_REPEATED
            if f.proto3_optional:
                optional, oneof = True, None  # synthetic oneof -> presence
            elif f.HasField("oneof_index"):
                optional, oneof = False, oneof_names[f.oneof_index]
            elif proto2 and f.label == _LABEL_OPTIONAL and not repeated:
                # proto2 `optional` scalars/enums have explicit presence
                # with no synthetic-oneof marker; mirror adapt_descriptor
                # (message fields already carry presence via kind).
                optional, oneof = kind is not Kind.MESSAGE, None
            else:
                optional, oneof = False, None
            fields.append(
                Field(
                    f.name,
                    f.number,
                    kind,
                    repeated=repeated,
                    optional=optional,
                    message=msg,
                    enum=enum,
                    oneof=oneof,
                )
            )
        mt.fields = tuple(fields)
    return messages, enums


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _split(full_name: str) -> tuple[str, str]:
    if "." in full_name:
        pkg, name = full_name.rsplit(".", 1)
        return pkg, name
    return "", full_name


def write_descriptor_set(
    roots: list[MessageType], file_name: str = "contract.proto"
) -> bytes:
    """Serialize the transitive closure of ``roots`` (+ their enums)
    into a binary FileDescriptorSet protoc/Spark can consume.

    Layout: one FileDescriptorProto per package; a type whose full
    name extends another message's full name (map entries, declared
    nested types) is emitted nested inside its parent so rebuilt
    full names match exactly.
    """
    from protarrow_spark.proto.model import iter_message_types

    all_msgs: dict[str, MessageType] = {}
    all_enums: dict[str, EnumType] = {}
    for root in roots:
        for mt in iter_message_types(root):
            all_msgs[mt.full_name] = mt
            for f in mt.fields:
                if f.enum is not None:
                    all_enums[f.enum.full_name] = f.enum

    def children_of(parent: str) -> list[MessageType]:
        pre = parent + "."
        return [
            m
            for n, m in sorted(all_msgs.items())
            if n.startswith(pre) and "." not in n[len(pre):]
        ]

    def enum_children_of(parent: str) -> list[EnumType]:
        pre = parent + "."
        return [
            e
            for n, e in sorted(all_enums.items())
            if n.startswith(pre) and "." not in n[len(pre):]
        ]

    top_level = [
        m
        for n, m in sorted(all_msgs.items())
        if _split(n)[0] not in all_msgs  # parent prefix is a package, not a message
    ]

    def emit_enum(et: EnumType) -> Message:
        return Message(
            _ENUM_PROTO,
            name=_split(et.full_name)[1],
            value=[
                Message(_ENUM_VALUE_PROTO, name=n, number=v) for v, n in et.values
            ],
        )

    def emit_message(mt: MessageType) -> Message:
        real_oneofs: list[str] = []
        synthetic: list[tuple[Message, str]] = []  # (field proto, oneof name)
        fields = []
        for f in sorted(mt.fields, key=lambda f: f.number):
            fd = Message(
                _FIELD_PROTO,
                name=f.name,
                number=f.number,
                label=_LABEL_REPEATED if f.repeated else _LABEL_OPTIONAL,
                ftype=_KIND_TO_TYPE[f.kind],
            )
            if f.kind is Kind.MESSAGE:
                fd.type_name = "." + f.message.full_name
            elif f.kind is Kind.ENUM:
                fd.type_name = "." + f.enum.full_name
            if f.oneof is not None:
                if f.oneof not in real_oneofs:
                    real_oneofs.append(f.oneof)
                fd.oneof_index = real_oneofs.index(f.oneof)
            elif f.optional:
                # spec: proto3 optional = member of its own synthetic
                # oneof, and ALL synthetic oneofs must be ordered after
                # every real oneof — index assignment deferred to a
                # second pass so interleaved field numbers can't
                # interleave the oneof_decl list.
                fd.proto3_optional = True
                synthetic.append((fd, f"_{f.name}"))
            fields.append(fd)
        for i, (fd, _) in enumerate(synthetic):
            fd.oneof_index = len(real_oneofs) + i
        oneof_names = real_oneofs + [n for _, n in synthetic]
        dp = Message(
            _DESCRIPTOR_PROTO,
            name=_split(mt.full_name)[1],
            field=fields,
            nested_type=[emit_message(c) for c in children_of(mt.full_name)],
            enum_type=[emit_enum(e) for e in enum_children_of(mt.full_name)],
            oneof_decl=[Message(_ONEOF_PROTO, name=n) for n in oneof_names],
        )
        if mt.map_entry:
            dp.options = Message(_MESSAGE_OPTIONS, map_entry=True)
        return dp

    def owner_pkg(full: str) -> str:
        """Package owning a (possibly nested) type: strip message-name
        components until the prefix is no longer a known message."""
        pkg, _ = _split(full)
        while pkg in all_msgs:
            pkg, _ = _split(pkg)
        return pkg

    by_pkg: dict[str, tuple[list[Message], list[Message]]] = {}
    for mt in top_level:
        pkg = _split(mt.full_name)[0]
        by_pkg.setdefault(pkg, ([], []))[0].append(emit_message(mt))
    for et in sorted(all_enums.values(), key=lambda e: e.full_name):
        pkg, _ = _split(et.full_name)
        if pkg in all_msgs:
            continue  # nested enum: emitted inside its parent message
        by_pkg.setdefault(pkg, ([], []))[1].append(emit_enum(et))

    pkg_order = sorted(by_pkg)
    pkg_file = {
        pkg: (file_name if i == 0 else f"{file_name}.{i}")
        for i, pkg in enumerate(pkg_order)
    }

    # Cross-file references MUST be declared (FileDescriptorProto
    # field 3) or real protobuf runtimes (protoc, descriptor_pool,
    # Spark's from_protobuf descFilePath) reject the set as referring
    # to an unimported type; only a global-name resolver would accept
    # it. A field's target file is its type's OWNING package's file.
    deps: dict[str, set[str]] = {pkg: set() for pkg in pkg_order}
    for mt in all_msgs.values():
        src = owner_pkg(mt.full_name)
        for f in mt.fields:
            target = None
            if f.message is not None:
                target = owner_pkg(f.message.full_name)
            elif f.enum is not None:
                target = owner_pkg(f.enum.full_name)
            if target is not None and target != src and target in pkg_file:
                deps[src].add(pkg_file[target])

    # Topological emission order: protobuf runtimes that Add() files
    # to a pool sequentially (descriptor_pool, protoc --decode) require
    # every file to appear AFTER the files it depends on. File NAMES
    # stay in alphabetical-package order (stable across runs); only
    # the emission sequence is re-ordered. Kahn over the dep edges;
    # alphabetical tie-break keeps the order deterministic.
    file_pkg = {fn: pkg for pkg, fn in pkg_file.items()}
    emitted: set[str] = set()
    topo: list[str] = []
    pending = list(pkg_order)
    while pending:
        progressed = False
        remaining = []
        for pkg in pending:
            if all(file_pkg[d] in emitted for d in deps[pkg]):
                topo.append(pkg)
                emitted.add(pkg)
                progressed = True
            else:
                remaining.append(pkg)
        if not progressed:  # dependency cycle between packages
            topo.extend(remaining)  # emit anyway; pool load will report
            break
        pending = remaining

    files = []
    for pkg in topo:
        msgs, enums_ = by_pkg[pkg]
        files.append(
            Message(
                _FILE_PROTO,
                name=pkg_file[pkg],
                package=pkg,
                dependency=sorted(deps[pkg]),
                message_type=msgs,
                enum_type=enums_,
                syntax="proto3",
            )
        )
    return serialize(Message(_FILE_SET, file=files))
