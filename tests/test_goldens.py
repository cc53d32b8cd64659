"""Checked-in golden fixtures (the reference's ``tests/data/*.jsonl``
strategy): proto-JSONL corpora generated ONCE by
``tools/generate_goldens.py`` and committed, with sha256 digests of
their wire serialization and default-config row encoding. Tests parse
the FILES (never regenerate in-process), so both generator drift and
codec/converter drift across versions fail loudly. Plus the four
recursion shapes from the reference
(``tests/test_conversion_recursive_messages.py:24-120``,
``protos/bench.proto:191-222``) through ENCODE/DECODE — not just
schema derivation."""

from __future__ import annotations

import hashlib
import json
import pathlib

import pytest

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import (
    dataframe_to_messages,
    messages_to_dataframe,
    messages_to_rows,
    rows_to_messages,
)
from protarrow_spark.proto import fixtures
from protarrow_spark.proto.jsonfmt import (
    message_from_json_dict,
    message_to_json_dict,
)
from protarrow_spark.proto.message import Message, parse, serialize
from protarrow_spark.schema import message_type_to_schema

DATA_DIR = pathlib.Path(__file__).parent / "data"
DIGESTS = json.loads((DATA_DIR / "golden_digests.json").read_text())

SKIP_CFG = ProtarrowSparkConfig(skip_recursive_messages=True)


def _corpus_types():
    l1, _, _ = fixtures.recursive_nested_cycle_types()
    return {
        "Example": fixtures.EXAMPLE,
        "NestedExample": fixtures.NESTED_EXAMPLE,
        "RecursiveSelf": fixtures.recursive_self_type(),
        "RecursiveNested1": l1,
        "RecursiveRepeated": fixtures.recursive_repeated_type(),
        "RecursiveMap": fixtures.recursive_map_type(),
    }


def _load(name: str) -> list[Message]:
    mtype = _corpus_types()[name]
    msgs = [
        message_from_json_dict(json.loads(line), mtype)
        for line in (DATA_DIR / f"{name}.jsonl").read_text().splitlines()
        if line
    ]
    assert msgs, f"empty golden file {name}"
    return msgs


@pytest.mark.parametrize("name", sorted(DIGESTS))
def test_golden_wire_digest_pinned(name: str) -> None:
    msgs = _load(name)
    h = hashlib.sha256()
    for m in msgs:
        h.update(serialize(m))
        h.update(b"\x00")
    assert h.hexdigest() == DIGESTS[name]["wire_sha256"], (
        f"{name}: wire serialization drifted from the checked-in golden "
        "(regenerate with tools/generate_goldens.py --update only for a "
        "DELIBERATE behavior change)"
    )


@pytest.mark.parametrize("name", sorted(DIGESTS))
def test_golden_row_encoding_pinned(name: str) -> None:
    msgs = _load(name)
    h = hashlib.sha256()
    for row in messages_to_rows(msgs, msgs[0].type, SKIP_CFG):
        h.update(repr(row).encode())
        h.update(b"\x00")
    assert h.hexdigest() == DIGESTS[name]["rows_sha256"], (
        f"{name}: encoded rows drifted from the checked-in golden"
    )


@pytest.mark.parametrize("name", sorted(DIGESTS))
def test_golden_json_and_wire_roundtrip(name: str) -> None:
    msgs = _load(name)
    for m in msgs:
        assert message_from_json_dict(message_to_json_dict(m), m.type) == m
        assert parse(serialize(m), m.type) == m


# ---------------------------------------------------------------------------
# The four recursion shapes through encode/decode
# ---------------------------------------------------------------------------

RECURSIVE_NAMES = [
    "RecursiveSelf",
    "RecursiveNested1",
    "RecursiveRepeated",
    "RecursiveMap",
]


@pytest.mark.parametrize("name", RECURSIVE_NAMES)
def test_recursive_raises_without_skip(name: str) -> None:
    msgs = _load(name)
    mtype = msgs[0].type
    with pytest.raises(TypeError, match="recursive"):
        message_type_to_schema(mtype, ProtarrowSparkConfig())
    with pytest.raises(TypeError, match="recursive"):
        messages_to_rows(msgs, mtype, ProtarrowSparkConfig())


def _pruned(msg: Message, _trace: tuple[str, ...] = ()) -> Message:
    """Expected decode(encode(msg)) under pruning: descending the
    message graph, the FIRST re-occurrence of a type already on the
    trace becomes an EMPTY message when present (reference: empty
    struct with a presence mask), absent stays absent — so a 3-type
    cycle keeps three levels before the cut."""
    mtype = msg.type
    if mtype.full_name in _trace:
        return Message(mtype)
    trace = _trace + (mtype.full_name,)

    def walk(x):
        return _pruned(x, trace) if isinstance(x, Message) else x

    out = Message(mtype)
    for field in mtype.fields:
        if field.name not in msg._values:
            continue
        v = msg._values[field.name]
        if field.is_map:
            setattr(out, field.name, {k: walk(x) for k, x in v.items()})
        elif field.repeated:
            setattr(out, field.name, [walk(x) for x in v])
        else:
            setattr(out, field.name, walk(v))
    return out


@pytest.mark.parametrize("name", RECURSIVE_NAMES)
def test_recursive_rows_roundtrip_pruned(name: str) -> None:
    msgs = _load(name)
    mtype = msgs[0].type
    rows = messages_to_rows(msgs, mtype, SKIP_CFG)
    back = rows_to_messages(rows, mtype, SKIP_CFG)
    assert back == [_pruned(m) for m in msgs]


@pytest.mark.parametrize("name", RECURSIVE_NAMES)
def test_recursive_spark_dataframe_roundtrip(spark, name: str) -> None:
    msgs = _load(name)
    mtype = msgs[0].type
    df = messages_to_dataframe(spark, msgs, mtype, SKIP_CFG)
    assert df.schema == message_type_to_schema(mtype, SKIP_CFG)
    back = dataframe_to_messages(df, mtype, SKIP_CFG)
    assert sorted(back, key=repr) == sorted(
        (_pruned(m) for m in msgs), key=repr
    )


def test_recursive_self_presence_semantics() -> None:
    """The reference pins present-vs-absent at the pruned point
    (empty struct vs null mask): depth-1 has NO next (null), deeper
    chains have an (empty) present next."""
    msgs = _load("RecursiveSelf")
    rows = messages_to_rows(msgs, msgs[0].type, SKIP_CFG)
    assert rows[0][0] is None and rows[0][1] == 1
    assert rows[1][0] == () and rows[1][1] == 12
    assert rows[2][0] == () and rows[2][1] == 23
