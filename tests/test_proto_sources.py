"""Typed file sources: proto-JSONL, delimited proto-binary, CSV.

Each reader must land the exact derived schema and proto-default
semantics that the in-memory encode path produces — tested by
round-tripping the same messages through both paths.
"""

from __future__ import annotations

import datetime
import json

import pytest

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import messages_to_dataframe
from protarrow_spark.proto.message import Message, serialize
from protarrow_spark.proto.model import TIMESTAMP, Field, Kind, MessageType
from protarrow_spark.sources import (
    read_csv_typed,
    read_proto_binary,
    read_proto_jsonl,
)

CFG = ProtarrowSparkConfig()

EVENT = MessageType(
    "t.Event",
    (
        Field("event_id", 1, Kind.INT64),
        Field("user_id", 2, Kind.INT64),
        Field("kind", 3, Kind.STRING),
        Field("amount", 4, Kind.DOUBLE),
        Field("ts", 5, Kind.MESSAGE, message=TIMESTAMP),
    ),
)


def _event_messages(n: int = 60) -> list[Message]:
    return [
        Message(
            EVENT,
            event_id=i,
            user_id=i % 7,
            kind=f"k{i % 3}",
            amount=i * 0.25,
            ts=Message(TIMESTAMP, seconds=1_700_000_000 + i, nanos=(i % 1000) * 1000),
        )
        for i in range(n)
    ]


def _expected_rows(spark):
    df = messages_to_dataframe(spark, _event_messages(), EVENT, CFG)
    return sorted(df.collect(), key=lambda r: r["event_id"])


def test_read_proto_jsonl(spark, tmp_path):
    path = tmp_path / "events.jsonl"
    with open(path, "w") as f:
        for i in range(60):
            # WKT timestamp maps to TimestampType in the scan schema,
            # so render RFC3339 text (proto-JSON's rendering too).
            dt = datetime.datetime.fromtimestamp(
                1_700_000_000 + i, datetime.timezone.utc
            )
            micros = (i % 1000) * 1000 // 1000
            f.write(
                json.dumps(
                    {
                        "event_id": i,
                        "user_id": i % 7,
                        "kind": f"k{i % 3}",
                        "amount": i * 0.25,
                        "ts": dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{micros:06d}Z",
                    }
                )
                + "\n"
            )
    got = sorted(
        read_proto_jsonl(spark, str(path), EVENT, CFG).collect(),
        key=lambda r: r["event_id"],
    )
    assert got == _expected_rows(spark)


def test_read_proto_jsonl_missing_fields(spark, tmp_path):
    """Absent JSON fields land as proto defaults (non-presence
    scalars) — cast_dataframe conformance at the scan edge."""
    path = tmp_path / "sparse.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"event_id": 1}) + "\n")
        f.write(json.dumps({"event_id": 2, "kind": "x"}) + "\n")
    rows = sorted(
        read_proto_jsonl(spark, str(path), EVENT, CFG).collect(),
        key=lambda r: r["event_id"],
    )
    assert rows[0]["kind"] == "" and rows[0]["amount"] == 0.0
    assert rows[0]["ts"] is None  # message field: absent -> null
    assert rows[1]["kind"] == "x"


def test_read_proto_binary_roundtrip(spark, tmp_path):
    """writeDelimitedTo-layout files decode to the exact encode-path
    rows, split across multiple files (one frame stream each)."""
    msgs = _event_messages()
    for part in range(3):
        chunk = bytearray()
        for m in msgs[part::3]:
            data = serialize(m)
            length = len(data)
            while True:
                b = length & 0x7F
                length >>= 7
                if length:
                    chunk.append(b | 0x80)
                else:
                    chunk.append(b)
                    break
            chunk.extend(data)
        (tmp_path / f"part-{part}.bin").write_bytes(bytes(chunk))
    got = sorted(
        read_proto_binary(spark, str(tmp_path), EVENT, CFG).collect(),
        key=lambda r: r["event_id"],
    )
    assert got == _expected_rows(spark)


def test_read_csv_typed(spark, tmp_path):
    """Header CSV conforms to the contract: strings cast to descriptor
    types, unknown column dropped, missing message field null."""
    path = tmp_path / "events.csv"
    with open(path, "w") as f:
        f.write("event_id,kind,amount,junk\n")
        f.write("7,a,1.5,IGNORED\n")
        f.write("8,b,2.5,IGNORED\n")
    rows = sorted(
        read_csv_typed(spark, str(path), EVENT, CFG).collect(),
        key=lambda r: r["event_id"],
    )
    assert [f.name for f in read_csv_typed(spark, str(path), EVENT, CFG).schema.fields] == [
        "event_id", "user_id", "kind", "amount", "ts",
    ]
    assert rows[0]["event_id"] == 7 and rows[0]["amount"] == 1.5
    assert rows[0]["user_id"] == 0  # missing scalar -> proto default
    assert rows[0]["ts"] is None

def test_read_proto_binary_corrupt_frames(spark, tmp_path):
    """Corrupt framing fails loudly with the file path in the error:
    a length prefix overrunning the file, and an unbounded varint."""
    import pytest
    from py4j.protocol import Py4JJavaError

    # Frame length 200 but only 3 payload bytes follow.
    (tmp_path / "bad-length.bin").write_bytes(bytes([200, 1]) + b"abc")
    with pytest.raises(Exception, match="bad-length.bin"):
        read_proto_binary(spark, str(tmp_path), EVENT, CFG).collect()

    # 11 continuation bytes: varint wider than 64 bits.
    (tmp_path / "bad-length.bin").unlink()
    (tmp_path / "bad-varint.bin").write_bytes(bytes([0x80] * 11) + b"\x01")
    with pytest.raises(Exception, match="malformed varint"):
        read_proto_binary(spark, str(tmp_path), EVENT, CFG).collect()


def test_read_jsonl_typed_native(spark, tmp_path):
    # native JVM JSON reader with the contract schema: values equal the
    # in-memory encode path; extra fields never parsed, missing fields
    # land proto defaults
    from protarrow_spark.sources import read_jsonl_typed

    msgs = _event_messages(30)
    ref = messages_to_dataframe(spark, msgs, EVENT, CFG)
    path = tmp_path / "ev.jsonl"
    with open(path, "w") as f:
        for m in msgs:
            f.write(
                json.dumps(
                    {
                        "event_id": m.event_id,
                        "user_id": m.user_id,
                        "kind": m.kind,
                        "amount": m.amount,
                        "extra_junk": "ignored",
                    }
                )
                + "\n"
            )
    got = read_jsonl_typed(spark, str(path), EVENT, CFG)
    assert got.schema == ref.schema
    g = {r["event_id"]: r for r in got.collect()}
    for m in msgs:
        row = g[m.event_id]
        assert row["kind"] == m.kind and row["amount"] == m.amount
        assert row["ts"] is None  # absent presence field -> null


def test_read_orc_typed_roundtrip(spark, tmp_path):
    # ORC edge: write the reference frame as ORC (columns shuffled and
    # one dropped), read back through the contract
    from protarrow_spark.sources import read_orc_typed

    msgs = _event_messages(30)
    ref = messages_to_dataframe(spark, msgs, EVENT, CFG)
    path = str(tmp_path / "ev_orc")
    ref.select("amount", "kind", "user_id", "event_id").write.orc(path)
    got = read_orc_typed(spark, path, EVENT, CFG)
    assert [f.name for f in got.schema.fields] == [f.name for f in ref.schema.fields]
    g = {r["event_id"]: r for r in got.collect()}
    for m in msgs:
        assert g[m.event_id]["amount"] == m.amount
