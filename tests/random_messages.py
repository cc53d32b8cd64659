"""Deterministic random message generator + expected-lossiness model.

Mirrors the reference's correctness backbone
(``tests/random_generator.py:81-155``: random messages for any
descriptor; ``truncate_nanos`` ``tests/random_generator.py:158-227``:
the expected lossiness under coarser time units) over the engine's
internal descriptor model.

Lossiness model for this engine (see SURVEY §1.2 hard parts):

* ``timestamp_type="timestamp"``: nanos floor to µs;
* ``duration_type="interval"``: total duration floors to µs, then
  seconds/nanos re-normalize to the same sign;
* ``Date(year=0)`` round-trips to ``Date()`` (month/day of an unset
  date are not preserved — the sentinel encodes only "unset");
* everything else round-trips exactly (uint64 under both policies,
  enum under both renderings for *declared* values, float32 rounding
  happens on assignment so messages already hold float32 values).
"""

from __future__ import annotations

import random

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.proto.message import Message
from protarrow_spark.proto.model import (
    DATE,
    DURATION,
    EMPTY,
    TIME_OF_DAY,
    TIMESTAMP,
    WRAPPER_TYPES,
    Field,
    Kind,
    MessageType,
)

# Bounded so epoch-NANOS fit int64 (the long_nanos columns are
# LongType, ~±292 years — the same int64 bound as Arrow timestamp(ns))
# and datetimes stay representable under the µs config.
_TS_SECONDS_MIN = -9_200_000_000
_TS_SECONDS_MAX = 9_200_000_000
_DUR_SECONDS_MAX = 9_200_000_000

_WORDS = ["alpha", "béta", "gamma", "", "delta delta", "Ω", "x" * 50]


def _random_scalar(rng: random.Random, kind: Kind) -> object:
    if kind is Kind.DOUBLE:
        return rng.choice([0.0, -1.5, rng.uniform(-1e12, 1e12)])
    if kind is Kind.FLOAT:
        return rng.choice([0.0, 2.5, rng.uniform(-1e6, 1e6)])
    if kind in (Kind.INT32, Kind.SINT32, Kind.SFIXED32):
        return rng.randint(-(2**31), 2**31 - 1)
    if kind in (Kind.INT64, Kind.SINT64, Kind.SFIXED64):
        return rng.randint(-(2**63), 2**63 - 1)
    if kind in (Kind.UINT32, Kind.FIXED32):
        return rng.randint(0, 2**32 - 1)
    if kind in (Kind.UINT64, Kind.FIXED64):
        return rng.randint(0, 2**64 - 1)
    if kind is Kind.BOOL:
        return rng.random() < 0.5
    if kind is Kind.STRING:
        return rng.choice(_WORDS)
    if kind is Kind.BYTES:
        return bytes(rng.randrange(256) for _ in range(rng.randrange(8)))
    raise TypeError(kind)


def _random_wkt(rng: random.Random, mtype: MessageType) -> Message:
    name = mtype.full_name
    if name == TIMESTAMP.full_name:
        return Message(
            TIMESTAMP,
            seconds=rng.randint(_TS_SECONDS_MIN, _TS_SECONDS_MAX),
            nanos=rng.randrange(1_000_000_000),
        )
    if name == DURATION.full_name:
        seconds = rng.randint(-_DUR_SECONDS_MAX, _DUR_SECONDS_MAX)
        nanos = rng.randrange(1_000_000_000)
        if seconds < 0:
            nanos = -nanos  # proto Duration: same sign
        elif seconds == 0 and rng.random() < 0.5:
            nanos = -nanos
        return Message(DURATION, seconds=seconds, nanos=nanos)
    if name == DATE.full_name:
        if rng.random() < 0.2:
            return Message(DATE)  # unset
        return Message(
            DATE,
            year=rng.randint(1, 9999),
            month=rng.randint(1, 12),
            day=rng.randint(1, 28),
        )
    if name == TIME_OF_DAY.full_name:
        return Message(
            TIME_OF_DAY,
            hours=rng.randrange(24),
            minutes=rng.randrange(60),
            seconds=rng.randrange(60),
            nanos=rng.randrange(1_000_000_000),
        )
    if name == EMPTY.full_name:
        return Message(EMPTY)
    if name in WRAPPER_TYPES:
        return Message(mtype, value=_random_scalar(rng, WRAPPER_TYPES[name]))
    raise TypeError(name)


def _random_value(rng: random.Random, field: Field, depth: int) -> object:
    if field.kind is Kind.ENUM:
        return rng.choice([n for n, _ in field.enum.values])
    if field.kind is Kind.MESSAGE:
        mt = field.message
        if mt.full_name in WRAPPER_TYPES or mt.full_name.startswith("google."):
            return _random_wkt(rng, mt)
        return random_message(mt, rng, depth + 1)
    return _random_scalar(rng, field.kind)


def random_message(
    mtype: MessageType, rng: random.Random, depth: int = 0
) -> Message:
    """A random message with ~coverage of presence/absence, empty and
    populated repeated fields and maps."""
    msg = Message(mtype)
    # Oneof groups: independently sampling each member would bias
    # toward later-declared members (each set clears the previous);
    # instead pick at most ONE member per group, mirroring the
    # reference generator (tests/random_generator.py:83-90).
    oneof_pick: dict[str, str | None] = {
        group: (rng.choice(members).name if rng.random() < 0.8 else None)
        for group, members in mtype.oneofs.items()
    }
    for field in mtype.fields:
        if field.oneof is not None:
            if oneof_pick[field.oneof] == field.name and depth < 3:
                setattr(msg, field.name, _random_value(rng, field, depth))
            continue
        if field.is_map:
            entry = field.message
            key_f, val_f = entry.fields_by_number[1], entry.fields_by_number[2]
            n = rng.choice([0, 0, 1, 2, 3])
            if n:
                d = {}
                for _ in range(n):
                    d[_random_scalar(rng, key_f.kind)] = _random_value(
                        rng, val_f, depth
                    )
                setattr(msg, field.name, d)
        elif field.repeated:
            n = rng.choice([0, 0, 1, 2, 3])
            if n:
                setattr(
                    msg,
                    field.name,
                    [_random_value(rng, field, depth) for _ in range(n)],
                )
        elif field.has_presence:
            if depth < 3 and rng.random() < 0.7:
                setattr(msg, field.name, _random_value(rng, field, depth))
        else:
            if rng.random() < 0.8:
                setattr(msg, field.name, _random_value(rng, field, depth))
    return msg


def random_messages(
    mtype: MessageType, n: int, seed: int = 0
) -> list[Message]:
    rng = random.Random(seed)
    return [random_message(mtype, rng) for _ in range(n)]


# ---------------------------------------------------------------------------
# Expected-lossiness model
# ---------------------------------------------------------------------------


def _truncate_wkt(msg: Message, config: ProtarrowSparkConfig) -> Message:
    name = msg.type.full_name
    if name == TIMESTAMP.full_name and config.timestamp_type == "timestamp":
        return Message(
            TIMESTAMP, seconds=msg.seconds, nanos=(msg.nanos // 1_000) * 1_000
        )
    if name == DURATION.full_name and config.duration_type == "interval":
        micros = msg.seconds * 1_000_000 + msg.nanos // 1_000
        seconds, rem = divmod(micros, 1_000_000)
        nanos = rem * 1_000
        if seconds < 0 and nanos > 0:
            seconds += 1
            nanos -= 1_000_000_000
        return Message(DURATION, seconds=seconds, nanos=nanos)
    if name == DATE.full_name and msg.year == 0:
        return Message(DATE)
    return msg


def expected_roundtrip(msg: Message, config: ProtarrowSparkConfig) -> Message:
    """What ``decode(encode(msg))`` should equal under ``config``
    (the reference's ``truncate_nanos`` analogue)."""
    mtype = msg.type
    if mtype.full_name in WRAPPER_TYPES or mtype.full_name.startswith("google."):
        return _truncate_wkt(msg, config)
    out = Message(mtype)
    for field in mtype.fields:
        if field.name not in msg._values:
            continue
        value = msg._values[field.name]
        if field.is_map:
            setattr(
                out,
                field.name,
                {
                    k: expected_roundtrip(v, config) if isinstance(v, Message) else v
                    for k, v in value.items()
                },
            )
        elif field.repeated:
            setattr(
                out,
                field.name,
                [
                    expected_roundtrip(v, config) if isinstance(v, Message) else v
                    for v in value
                ],
            )
        elif isinstance(value, Message):
            setattr(out, field.name, expected_roundtrip(value, config))
        else:
            setattr(out, field.name, value)
    return out
