"""proto3 JSON rendering for the internal message model.

A minimal ``google.protobuf.json_format`` analogue (public proto3
JSON mapping, protobuf.dev/programming-guides/json) so golden
fixtures can be CHECKED IN as proto-JSONL — the reference's
cross-version pinning strategy (``scripts/generate_data.py:16-31``
writes ``tests/data/*.jsonl`` via ``MessageToDict``; its tests read
them back with ``json_format.Parse``).

Mapping implemented (the subset the fixture shapes use, with
``preserving_proto_field_name`` semantics):

* int32/sint32/sfixed32/uint32/fixed32, float/double, bool -> JSON
  number/bool; int64/sint64/sfixed64/uint64/fixed64 -> JSON string
  (the canonical proto3 JSON rule — 2^53 float precision);
* string -> string, bytes -> base64;
* enum -> declared name, unknown numbers -> number;
* message -> object (only set fields emitted), repeated -> array,
  map -> object with stringified keys;
* WKTs: Timestamp -> RFC3339 ``Z`` string (nanos as needed),
  Duration -> ``"<seconds>s"`` decimal string, wrappers -> bare
  value, google.type.Date / TimeOfDay -> plain objects, Empty -> {}.
"""

from __future__ import annotations

import base64
import datetime
from typing import Any

from protarrow_spark.proto.message import Message
from protarrow_spark.proto.model import (
    DURATION,
    EMPTY,
    TIMESTAMP,
    WRAPPER_TYPES,
    Field,
    Kind,
    MessageType,
)

_INT64_KINDS = {
    Kind.INT64,
    Kind.SINT64,
    Kind.SFIXED64,
    Kind.UINT64,
    Kind.FIXED64,
}


def _ts_to_json(msg: Message) -> str:
    dt = datetime.datetime.fromtimestamp(
        msg.seconds, datetime.timezone.utc
    )
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    nanos = msg.nanos
    if nanos == 0:
        return base + "Z"
    if nanos % 1_000_000 == 0:
        return base + f".{nanos // 1_000_000:03d}Z"
    if nanos % 1_000 == 0:
        return base + f".{nanos // 1_000:06d}Z"
    return base + f".{nanos:09d}Z"


def _ts_from_json(text: str) -> Message:
    body = text[:-1] if text.endswith("Z") else text
    if "." in body:
        main, frac = body.split(".")
        nanos = int(frac.ljust(9, "0"))
    else:
        main, nanos = body, 0
    dt = datetime.datetime.strptime(main, "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=datetime.timezone.utc
    )
    return Message(TIMESTAMP, seconds=int(dt.timestamp()), nanos=nanos)


def _dur_to_json(msg: Message) -> str:
    total_ns = msg.seconds * 1_000_000_000 + msg.nanos
    sign = "-" if total_ns < 0 else ""
    total_ns = abs(total_ns)
    secs, ns = divmod(total_ns, 1_000_000_000)
    if ns == 0:
        return f"{sign}{secs}s"
    return f"{sign}{secs}.{ns:09d}".rstrip("0") + "s"


def _dur_from_json(text: str) -> Message:
    body = text[:-1]  # strip 's'
    neg = body.startswith("-")
    if neg:
        body = body[1:]
    if "." in body:
        main, frac = body.split(".")
        secs, nanos = int(main), int(frac.ljust(9, "0"))
    else:
        secs, nanos = int(body), 0
    if neg:
        secs, nanos = -secs, -nanos
    return Message(DURATION, seconds=secs, nanos=nanos)


def _value_to_json(field: Field, value: Any) -> Any:
    kind = field.kind
    if kind is Kind.MESSAGE:
        return message_to_json_dict(value)
    if kind is Kind.ENUM:
        return field.enum.by_number.get(value, value)
    if kind in _INT64_KINDS:
        return str(value)
    if kind is Kind.BYTES:
        return base64.b64encode(value).decode("ascii")
    return value


def message_to_json_dict(msg: Message) -> Any:
    """Message -> plain JSON-able value (WKTs get their special
    renderings; regular messages emit only set fields, mirroring
    ``MessageToDict(preserving_proto_field_name=True)``)."""
    mtype = msg.type
    name = mtype.full_name
    if name == TIMESTAMP.full_name:
        return _ts_to_json(msg)
    if name == DURATION.full_name:
        return _dur_to_json(msg)
    if name == EMPTY.full_name:
        return {}
    if name in WRAPPER_TYPES:
        return _value_to_json(mtype.fields[0], msg.value)
    out: dict[str, Any] = {}
    for field in mtype.fields:
        if field.name not in msg._values:
            continue
        value = msg._values[field.name]
        if field.is_map:
            val_f = field.message.fields_by_number[2]
            out[field.name] = {
                str(k): _value_to_json(val_f, v) for k, v in value.items()
            }
        elif field.repeated:
            out[field.name] = [_value_to_json(field, v) for v in value]
        else:
            out[field.name] = _value_to_json(field, value)
    return out


def _value_from_json(field: Field, raw: Any) -> Any:
    kind = field.kind
    if kind is Kind.MESSAGE:
        return message_from_json_dict(raw, field.message)
    if kind is Kind.ENUM:
        if isinstance(raw, str):
            return field.enum.by_name[raw]
        return int(raw)
    if kind in _INT64_KINDS:
        return int(raw)
    if kind is Kind.BYTES:
        return base64.b64decode(raw)
    if kind in (Kind.INT32, Kind.SINT32, Kind.SFIXED32, Kind.UINT32, Kind.FIXED32):
        return int(raw)
    return raw


def _map_key_from_json(field: Field, raw: str) -> Any:
    kind = field.kind
    if kind is Kind.BOOL:
        return raw == "true"
    if kind is Kind.STRING:
        return raw
    return int(raw)


def message_from_json_dict(raw: Any, mtype: MessageType) -> Message:
    """Plain JSON value -> Message of ``mtype`` (inverse of
    :func:`message_to_json_dict`; the reference side is
    ``json_format.Parse``)."""
    name = mtype.full_name
    if name == TIMESTAMP.full_name:
        return _ts_from_json(raw)
    if name == DURATION.full_name:
        return _dur_from_json(raw)
    if name == EMPTY.full_name:
        return Message(EMPTY)
    if name in WRAPPER_TYPES:
        return Message(mtype, value=_value_from_json(mtype.fields[0], raw))
    msg = Message(mtype)
    for fname, rv in raw.items():
        field = mtype.fields_by_name[fname]
        if field.is_map:
            key_f = field.message.fields_by_number[1]
            val_f = field.message.fields_by_number[2]
            setattr(
                msg,
                fname,
                {
                    _map_key_from_json(key_f, k): _value_from_json(val_f, v)
                    for k, v in rv.items()
                },
            )
        elif field.repeated:
            setattr(msg, fname, [_value_from_json(field, v) for v in rv])
        else:
            setattr(msg, fname, _value_from_json(field, rv))
    return msg
