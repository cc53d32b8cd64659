"""Schema evolution: structural diff between two versions of a proto
contract, classified by protobuf's PUBLIC compatibility rules.

The reference stops at enforcing a single contract (``cast_to_proto``);
a production deployment also needs to know what changed BETWEEN
contract versions before running the migration cast over 100 TB. This
module is that preflight: :func:`diff_contracts` matches fields by
FIELD NUMBER (the wire identity — names are documentation, public
encoding spec) and emits one :class:`SchemaChange` per difference,
each flagged ``breaking`` per the language guide's wire-compatibility
rules (the same rule set tools like ``buf breaking`` implement from
the spec):

* adding a field — non-breaking (old writers omit it, readers see the
  proto default; the columnar cast synthesizes the column);
* removing a field — non-breaking on the wire (unknown fields are
  skipped) but surfaced so columnar consumers know the column drops;
* renaming (same number, new name) — non-breaking on the wire; the
  columnar cast matches by NAME, so it is surfaced prominently;
* changing the kind — non-breaking only within the spec's
  wire-compatible groups (int32/int64/uint32/uint64/bool varints;
  sint32/sint64; string/bytes; fixed32/sfixed32; fixed64/sfixed64),
  breaking otherwise;
* repeated <-> singular, map <-> non-map — breaking (shape change);
* presence change (``optional`` toggled, oneof membership) —
  non-breaking on the wire, changes nullability in the derived schema;
* enum value added — non-breaking; enum value removed — surfaced
  (old numbers fall back to the first declared value on re-render);
* nested messages recurse with dotted paths.

The migration itself is the existing engine operator:
``cast_dataframe(df, new_contract)`` executes every non-breaking
change as a zero-shuffle Catalyst projection (conversion/cast.py).
"""

from __future__ import annotations

import dataclasses

from protarrow_spark.proto.model import Field, Kind, MessageType

#: Wire-compatible kind groups (public language guide, "Updating a
#: message type").
_COMPAT_GROUPS: tuple[frozenset[Kind], ...] = (
    frozenset({Kind.INT32, Kind.INT64, Kind.UINT32, Kind.UINT64, Kind.BOOL}),
    frozenset({Kind.SINT32, Kind.SINT64}),
    frozenset({Kind.STRING, Kind.BYTES}),
    frozenset({Kind.FIXED32, Kind.SFIXED32}),
    frozenset({Kind.FIXED64, Kind.SFIXED64}),
    frozenset({Kind.ENUM, Kind.INT32, Kind.INT64, Kind.UINT32, Kind.UINT64}),
)


def _wire_compatible(a: Kind, b: Kind) -> bool:
    if a is b:
        return True
    return any(a in g and b in g for g in _COMPAT_GROUPS)


@dataclasses.dataclass(frozen=True)
class SchemaChange:
    """One difference between two contract versions.

    ``path`` is the dotted field path in the NEW contract (or the old
    one for removals); ``change`` is a stable tag; ``breaking`` means
    wire-incompatible per the public rules (a reader with the new
    contract can misread bytes written under the old one).
    """

    path: str
    change: str
    detail: str
    breaking: bool


def _field_path(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def diff_contracts(
    old: MessageType, new: MessageType, _prefix: str = ""
) -> list[SchemaChange]:
    """Structural diff of two contract versions; see the module
    docstring for the classification rules. Deterministic order:
    removals, then per-number comparisons, then additions, each in
    field-number order."""
    changes: list[SchemaChange] = []
    old_by_num = {f.number: f for f in old.fields}
    new_by_num = {f.number: f for f in new.fields}

    for num in sorted(old_by_num.keys() - new_by_num.keys()):
        f = old_by_num[num]
        changes.append(
            SchemaChange(
                _field_path(_prefix, f.name),
                "field_removed",
                f"field #{num} removed; old writers' bytes are skipped as "
                "unknown fields, columnar consumers lose the column",
                breaking=False,
            )
        )
    for num in sorted(old_by_num.keys() & new_by_num.keys()):
        fo, fn = old_by_num[num], new_by_num[num]
        path = _field_path(_prefix, fn.name)
        if fo.name != fn.name:
            changes.append(
                SchemaChange(
                    path,
                    "field_renamed",
                    f"field #{num} renamed {fo.name!r} -> {fn.name!r}; "
                    "wire-identical, but name-matched columnar casts treat "
                    "it as remove+add",
                    breaking=False,
                )
            )
        if fo.is_map != fn.is_map or (fo.repeated != fn.repeated):
            changes.append(
                SchemaChange(
                    path,
                    "label_changed",
                    f"field #{num}: "
                    f"{'map' if fo.is_map else 'repeated' if fo.repeated else 'singular'}"
                    " -> "
                    f"{'map' if fn.is_map else 'repeated' if fn.repeated else 'singular'}",
                    breaking=True,
                )
            )
        if fo.kind is not fn.kind:
            compat = _wire_compatible(fo.kind, fn.kind)
            changes.append(
                SchemaChange(
                    path,
                    "kind_changed",
                    f"field #{num}: {fo.kind.value} -> {fn.kind.value}"
                    + (
                        " (wire-compatible group; values reinterpret)"
                        if compat
                        else " (incompatible wire types)"
                    ),
                    breaking=not compat,
                )
            )
        elif fo.kind is Kind.MESSAGE and fn.kind is Kind.MESSAGE:
            # Recurse into plain nested messages AND map entry
            # messages alike — a map's key/value type change is a
            # per-entry-field kind change (key=1 / value=2), and
            # skipping it would let a wire-breaking map migration
            # through the breaking_changes() gate.
            changes.extend(diff_contracts(fo.message, fn.message, path))
        elif fo.kind is Kind.ENUM:
            old_vals = dict(fo.enum.values)
            new_vals = dict(fn.enum.values)
            for v in sorted(new_vals.keys() - old_vals.keys()):
                changes.append(
                    SchemaChange(
                        path,
                        "enum_value_added",
                        f"enum value {new_vals[v]!r} = {v}",
                        breaking=False,
                    )
                )
            for v in sorted(old_vals.keys() - new_vals.keys()):
                changes.append(
                    SchemaChange(
                        path,
                        "enum_value_removed",
                        f"enum value {old_vals[v]!r} = {v}; stored numbers "
                        "re-render as the first declared value",
                        breaking=False,
                    )
                )
        if fo.has_presence != fn.has_presence:
            changes.append(
                SchemaChange(
                    path,
                    "presence_changed",
                    f"field #{num}: presence {fo.has_presence} -> "
                    f"{fn.has_presence}; nullability flips in the derived "
                    "schema",
                    breaking=False,
                )
            )
        if (fo.oneof or None) != (fn.oneof or None):
            changes.append(
                SchemaChange(
                    path,
                    "oneof_changed",
                    f"field #{num}: oneof {fo.oneof!r} -> {fn.oneof!r}; "
                    "moving a field in/out of a oneof changes sibling-"
                    "clearing semantics",
                    breaking=False,
                )
            )
    for num in sorted(new_by_num.keys() - old_by_num.keys()):
        f = new_by_num[num]
        changes.append(
            SchemaChange(
                _field_path(_prefix, f.name),
                "field_added",
                f"field #{num} added; old data default-fills "
                f"({f.default_value!r})"
                if not f.has_presence
                else f"field #{num} added; old data reads as null",
                breaking=False,
            )
        )
    return changes


def breaking_changes(old: MessageType, new: MessageType) -> list[SchemaChange]:
    """Just the wire-breaking subset — the empty-list check a CI
    contract gate runs before accepting a schema bump."""
    return [c for c in diff_contracts(old, new) if c.breaking]
