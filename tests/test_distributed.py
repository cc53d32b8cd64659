"""Distributed conversion tests: binary proto columns encoded/decoded
on executors via mapInPandas + the wire codec (no driver data path)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import (
    dataframe_to_messages,
    decode_proto_bytes,
    encode_proto_bytes,
    messages_to_dataframe,
)
from protarrow_spark.conversion.distributed import proto_roundtrip
from protarrow_spark.conversion.encode import row_builder
from protarrow_spark.proto import fixtures
from protarrow_spark.proto.message import Message, parse, serialize
from protarrow_spark.proto.model import (
    TIMESTAMP,
    Field,
    Kind,
    MessageType,
    map_field,
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


def _event_messages(n: int = 100) -> list[Message]:
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


def test_decode_proto_bytes(spark) -> None:
    msgs = _event_messages()
    blobs = [(i, serialize(m)) for i, m in enumerate(msgs)]
    df = spark.createDataFrame(blobs, "key long, value binary").repartition(4)
    decoded = decode_proto_bytes(df, "value", EVENT, CFG, keep_cols=["key"])
    assert [f.name for f in decoded.schema.fields] == [
        "key", "event_id", "user_id", "kind", "amount", "ts",
    ]
    rows = {r["key"]: r for r in decoded.collect()}
    assert len(rows) == len(msgs)
    assert rows[3]["amount"] == 0.75
    assert rows[3]["ts"] == datetime.datetime(2023, 11, 14, 22, 13, 23, 3)


def test_encode_proto_bytes_inverse(spark) -> None:
    msgs = _event_messages(50)
    df = messages_to_dataframe(spark, msgs, EVENT, CFG).repartition(4)
    encoded = encode_proto_bytes(df, EVENT, CFG, output_col="proto")
    assert encoded.schema["proto"].dataType == T.BinaryType()
    back = sorted(
        (parse(bytes(r["proto"]), EVENT) for r in encoded.collect()),
        key=lambda m: m.event_id,
    )
    assert back == msgs


def test_distributed_roundtrip_matches_input(spark) -> None:
    msgs = _event_messages(200)
    df = messages_to_dataframe(spark, msgs, EVENT, CFG).repartition(8)
    out = proto_roundtrip(df, EVENT, CFG)
    assert sorted(dataframe_to_messages(out, EVENT, CFG), key=lambda m: m.event_id) == msgs


def test_distributed_roundtrip_nested_types(spark) -> None:
    mt = MessageType(
        "t.Rich",
        (
            Field("id", 1, Kind.INT64),
            Field("tags", 2, Kind.STRING, repeated=True),
            Field("nested", 3, Kind.MESSAGE, message=fixtures.NESTED),
            map_field("attrs", 4, Kind.STRING, Kind.INT64),
        ),
    )
    msgs = [
        Message(
            mt,
            id=i,
            tags=[f"t{j}" for j in range(i % 4)],
            nested=Message(fixtures.NESTED, nested_int=i) if i % 2 else None,
            attrs={f"a{j}": j for j in range(i % 3)},
        )
        for i in range(40)
    ]
    df = messages_to_dataframe(spark, msgs, mt, CFG).repartition(4)
    out = proto_roundtrip(df, mt, CFG)
    assert sorted(dataframe_to_messages(out, mt, CFG), key=lambda m: m.id) == msgs


def test_plan_has_no_shuffle(spark) -> None:
    msgs = _event_messages(10)
    df = messages_to_dataframe(spark, msgs, EVENT, CFG)
    plan = proto_roundtrip(df, EVENT, CFG)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"conversion must not shuffle:\n{plan}"


# ---------------------------------------------------------------------------
# Unified codec dispatch (built-in spark-protobuf vs native wire codec)
# ---------------------------------------------------------------------------


def test_unified_dispatch_falls_back_to_native(spark) -> None:
    from protarrow_spark.conversion import (
        decode_proto_column,
        encode_proto_column,
        spark_protobuf_available,
    )

    # This environment has no spark-protobuf jar: the probe must say
    # so (quietly — no exception), and the unified entry points must
    # route to the native codec even when the caller supplies the
    # built-in path's arguments.
    assert spark_protobuf_available(spark) is False

    msgs = _event_messages(12)
    df = messages_to_dataframe(spark, msgs, EVENT, CFG)
    encoded = encode_proto_column(
        df,
        EVENT,
        CFG,
        desc_file_path="/nonexistent/descriptors.bin",
        message_full_name=EVENT.full_name,
    )
    assert encoded.schema["proto"].dataType.simpleString() == "binary"
    decoded = decode_proto_column(
        encoded,
        "proto",
        EVENT,
        CFG,
        desc_file_path="/nonexistent/descriptors.bin",
        message_full_name=EVENT.full_name,
    )
    back = sorted(dataframe_to_messages(decoded, EVENT, CFG), key=lambda m: m.event_id)
    assert back == sorted(msgs, key=lambda m: m.event_id)


@pytest.mark.skipif(
    True,
    reason=(
        "requires the external spark-protobuf jar "
        "(--packages org.apache.spark:spark-protobuf_2.13:<spark-version>) "
        "plus a protoc-compiled FileDescriptorSet; neither ships in this "
        "sandbox. With both present, spark_protobuf_available(spark) turns "
        "True and decode_proto_column/encode_proto_column run the built-in "
        "Catalyst expressions instead of the native codec — config "
        "ProtarrowSparkConfig(uint64_type='long', enum_type='string') gives "
        "drop-in type parity between the two paths."
    ),
)
def test_unified_dispatch_uses_builtin_when_jar_present(spark) -> None:
    from protarrow_spark.conversion import decode_proto_column

    decoded = decode_proto_column(
        spark.read.parquet("events_proto"),
        "proto",
        EVENT,
        CFG,
        desc_file_path="descriptors.bin",
        message_full_name=EVENT.full_name,
    )
    assert decoded.count() > 0


# ---------------------------------------------------------------------------
# Compiled row->wire fast path: bit-identical to the Message path
# ---------------------------------------------------------------------------


def test_compiled_wire_encoder_matches_message_path() -> None:
    """For every shape x config: row -> compile_row_to_wire bytes must
    equal serialize(message_builder(row)) byte-for-byte (the fast path
    skips Message objects but must not change one bit on the wire)."""
    import itertools

    from protarrow_spark.conversion.decode import message_builder
    from protarrow_spark.conversion.distributed import compile_row_to_wire
    from protarrow_spark.conversion.encode import messages_to_rows
    from protarrow_spark.proto.message import serialize
    from tests.random_messages import random_messages

    shapes = [fixtures.EXAMPLE, fixtures.NESTED_EXAMPLE]
    configs = [
        ProtarrowSparkConfig(),
        ProtarrowSparkConfig(enum_type="string", uint64_type="long"),
        ProtarrowSparkConfig(
            timestamp_type="long_nanos", duration_type="long_nanos",
            map_as_list=True,
        ),
    ]
    for mtype, cfg in itertools.product(shapes, configs):
        msgs = random_messages(mtype, 25, seed=42)
        rows = messages_to_rows(msgs, mtype, cfg)
        fast = compile_row_to_wire(mtype, cfg)
        slow_build = message_builder(mtype, cfg)
        for row in rows:
            assert fast(row) == serialize(slow_build(row)), (
                mtype.full_name,
                cfg,
            )


def test_compiled_wire_encoder_oneof_single_member() -> None:
    from protarrow_spark.conversion.decode import message_builder
    from protarrow_spark.conversion.distributed import compile_row_to_wire
    from protarrow_spark.proto.message import parse, serialize
    from protarrow_spark.proto.model import Field, Kind

    mt = MessageType(
        "t.OneofWire",
        (
            Field("id", 1, Kind.INT64),
            Field("a", 2, Kind.STRING, oneof="p"),
            Field("b", 3, Kind.INT64, oneof="p"),
        ),
    )
    fast = compile_row_to_wire(mt, CFG)
    build = message_builder(mt, CFG)
    for row in [(7, "x", None), (7, None, 9), (7, None, None)]:
        assert fast(row) == serialize(build(row))
    # invalid double-set row: wire bytes differ (documented), but the
    # PARSED result is identical (last member wins on both paths)
    double = (7, "x", 9)
    assert parse(fast(double), mt) == parse(serialize(build(double)), mt)


def test_compiled_wire_decoder_matches_message_path() -> None:
    """wire -> compile_wire_to_row must equal row_builder(parse(wire))
    for every shape x config, including wire-level merge semantics."""
    import itertools

    from protarrow_spark.conversion.distributed import compile_wire_to_row
    from protarrow_spark.proto.message import serialize
    from tests.random_messages import random_messages

    shapes = [fixtures.EXAMPLE, fixtures.NESTED_EXAMPLE]
    configs = [
        ProtarrowSparkConfig(),
        ProtarrowSparkConfig(enum_type="string", uint64_type="long"),
        ProtarrowSparkConfig(
            timestamp_type="long_nanos", duration_type="long_nanos",
            map_as_list=True,
        ),
    ]
    for mtype, cfg in itertools.product(shapes, configs):
        fast = compile_wire_to_row(mtype, cfg)
        slow = row_builder(mtype, cfg)
        wires = [serialize(m) for m in random_messages(mtype, 25, seed=7)]
        for wire in wires:
            assert fast(wire) == slow(parse(wire, mtype)), (
                mtype.full_name,
                cfg,
            )
        # concatenated serializations exercise the merge rules
        # (scalars last-wins, messages merge, repeated/map append)
        for a, b in zip(wires[:-1], wires[1:]):
            assert fast(a + b) == slow(parse(a + b, mtype))


def test_compiled_wire_decoder_expanded_repeated_and_unknown() -> None:
    from protarrow_spark.conversion.distributed import compile_wire_to_row
    from protarrow_spark.proto.message import serialize
    from protarrow_spark.proto.model import Field, Kind

    mt = MessageType(
        "t.RepWire",
        (Field("xs", 1, Kind.INT64, repeated=True), Field("s", 2, Kind.STRING)),
    )
    fast = compile_wire_to_row(mt, CFG)
    # expanded (unpacked) encoding: one varint tag per element — the
    # decoder must accept it like the Message path does
    donor = MessageType(
        "t.Donor",
        (
            Field("x", 1, Kind.INT64),
            Field("s", 2, Kind.STRING),
            Field("junk", 9, Kind.STRING),  # unknown to RepWire
        ),
    )
    wire = (
        serialize(Message(donor, x=4, junk="skip me"))
        + serialize(Message(donor, x=5, s="keep"))
    )
    assert fast(wire) == row_builder(mt, CFG)(parse(wire, mt))
    assert fast(wire) == ([4, 5], "keep")


def test_compiled_wire_decoder_packed_length_bounds() -> None:
    """A corrupt PACKED length that overruns the buffer must raise the
    uniform ValueError('truncated message') — same contract as every
    other LEN path (strings, bytes, maps, nested messages) — not leak
    an IndexError/struct.error from the inner scalar reads."""
    import pytest

    from protarrow_spark.conversion.distributed import compile_wire_to_row
    from protarrow_spark.proto.message import serialize
    from protarrow_spark.proto.model import Field, Kind

    mt = MessageType("t.Packed", (Field("xs", 1, Kind.INT64, repeated=True),))
    fast = compile_wire_to_row(mt, CFG)
    wire = bytearray(serialize(Message(mt, xs=[1, 2, 3])))
    assert wire[0] == (1 << 3) | 2  # field 1, LEN (packed)
    wire[1] = 120  # declared packed length >> remaining bytes
    with pytest.raises(ValueError, match="truncated"):
        fast(bytes(wire))
    # fixed-width packed too (I64 elements inside the packed blob)
    mtd = MessageType("t.PackedD", (Field("ds", 1, Kind.DOUBLE, repeated=True),))
    fastd = compile_wire_to_row(mtd, CFG)
    wired = bytearray(serialize(Message(mtd, ds=[1.0, 2.0])))
    wired[1] = 120
    with pytest.raises(ValueError, match="truncated"):
        fastd(bytes(wired))


def test_compiled_wire_decoder_timestamp_merge_and_oneof() -> None:
    """The specialized Timestamp handler (r8: direct two-varint parse,
    no Message allocation) must keep the exact merge semantics of the
    generic path: concatenated occurrences MERGE (seconds from one,
    nanos from another), later oneof siblings clear it, unknown
    subfields skip."""
    import datetime as dt

    from protarrow_spark.conversion.distributed import compile_wire_to_row
    from protarrow_spark.proto.message import Message, parse, serialize
    from protarrow_spark.proto.model import TIMESTAMP, Field, Kind

    mt = MessageType(
        "t.TsWire",
        (
            Field("id", 1, Kind.INT64),
            Field("ts", 2, Kind.MESSAGE, message=TIMESTAMP),
            Field("alt", 3, Kind.STRING, oneof="p"),
            Field("when", 4, Kind.MESSAGE, message=TIMESTAMP, oneof="p"),
        ),
    )
    dec = compile_wire_to_row(mt, CFG)
    slow = row_builder(mt, CFG)

    def wire(**kw):
        m = Message(mt)
        for k, v in kw.items():
            setattr(m, k, v)
        return serialize(m)

    ts_a = Message(TIMESTAMP, seconds=100)
    ts_b = Message(TIMESTAMP, nanos=123_456_000)
    # merge: seconds from occurrence 1, nanos from occurrence 2
    merged = wire(id=1, ts=ts_a) + wire(ts=ts_b)
    assert dec(merged) == slow(parse(merged, mt))
    got = dec(merged)
    assert got[1] == dt.datetime(
        1970, 1, 1, 0, 1, 40, 123456, tzinfo=dt.timezone.utc
    )
    # oneof: timestamp member set, then string sibling wins
    w = wire(when=ts_a) + wire(alt="later")
    assert dec(w) == slow(parse(w, mt)) == (0, None, "later", None)
    # and the reverse: timestamp wins over the string
    w2 = wire(alt="early") + wire(when=ts_b)
    assert dec(w2) == slow(parse(w2, mt))
    assert dec(w2)[3] is not None and dec(w2)[2] is None
    # unknown subfield inside the Timestamp body skips cleanly
    body = serialize(ts_a) + bytes([(9 << 3) | 0, 7])  # field 9 varint
    raw = bytes([(2 << 3) | 2, len(body)]) + body
    assert dec(raw) == slow(parse(raw, mt))


def test_compiled_wire_decoder_oneof_last_wins() -> None:
    from protarrow_spark.conversion.distributed import (
        compile_row_to_wire,
        compile_wire_to_row,
    )
    from protarrow_spark.proto.model import Field, Kind

    mt = MessageType(
        "t.OneofWire2",
        (
            Field("id", 1, Kind.INT64),
            Field("a", 2, Kind.STRING, oneof="p"),
            Field("b", 3, Kind.INT64, oneof="p"),
            Field("m", 4, Kind.MESSAGE, message=fixtures.NESTED, oneof="p"),
        ),
    )
    enc = compile_row_to_wire(mt, CFG)
    dec = compile_wire_to_row(mt, CFG)
    slow = row_builder(mt, CFG)
    w_a = enc((1, "x", None, None))
    w_b = enc((1, None, 9, None))
    w_m = enc((1, None, None, (3, "n")))
    for wire in (w_a + w_b, w_b + w_m, w_m + w_a, w_a + w_m + w_b):
        assert dec(wire) == slow(parse(wire, mt))
    assert dec(w_a + w_b) == (1, None, 9, None)
    assert dec(w_m + w_a) == (1, "x", None, None)


def test_decode_permissive_nulls_corrupt_rows(spark):
    """on_error='null': malformed bytes -> all-null decoded columns,
    keep_cols pass through, healthy rows decode exactly; the default
    strict mode still raises."""
    import pyspark.sql.functions as F
    import pytest

    from protarrow_spark.config import ProtarrowSparkConfig
    from protarrow_spark.conversion.distributed import (
        decode_proto_bytes,
        encode_proto_bytes,
    )
    from protarrow_spark.queries.conversion import EVENT_MT

    cfg = ProtarrowSparkConfig()
    src = spark.createDataFrame(
        [(1, 10, "click", 1.5), (2, 20, "view", 2.5)],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_micros(F.lit(1_700_000_000_000_000)))
    wire = encode_proto_bytes(
        src.withColumn("k", F.col("event_id")), EVENT_MT, cfg, keep_cols=["k"]
    )
    corrupted = wire.withColumn(
        "proto",
        F.when(F.col("k") == 1, F.lit(b"\xff" * 11)).otherwise(F.col("proto")),
    )
    rows = {
        r.k: r
        for r in decode_proto_bytes(
            corrupted, "proto", EVENT_MT, cfg, keep_cols=["k"], on_error="null"
        ).collect()
    }
    assert rows[1].event_id is None and rows[1].event_type is None
    assert rows[2].event_id == 2 and rows[2].event_type == "view"
    assert rows[2].value == 2.5
    with pytest.raises(Exception):
        decode_proto_bytes(
            corrupted, "proto", EVENT_MT, cfg, keep_cols=["k"]
        ).collect()
    with pytest.raises(ValueError, match="on_error"):
        decode_proto_bytes(
            corrupted, "proto", EVENT_MT, cfg, on_error="skip"
        )


def test_encode_permissive_nulls_violating_rows(spark):
    """encode_proto_bytes(on_error='null'): a contract-violating row
    (uint32 out of range, wrong cell type) yields a null bytes cell
    with keep_cols intact; healthy rows encode exactly."""
    from protarrow_spark.config import ProtarrowSparkConfig
    from protarrow_spark.conversion.distributed import (
        decode_proto_bytes,
        encode_proto_bytes,
    )
    from protarrow_spark.proto.model import Field, Kind, MessageType

    mt = MessageType(
        "t.PermEnc",
        (Field("k", 1, Kind.INT64), Field("u", 2, Kind.UINT32)),
    )
    df = spark.createDataFrame(
        [(1, 7), (2, 2**32 + 5), (3, -4), (4, 4294967295)],
        "k long, u long",
    ).withColumn("src_k", F.col("k"))
    wire = encode_proto_bytes(
        df, mt, ProtarrowSparkConfig(), keep_cols=["src_k"], on_error="null"
    )
    rows = {r["src_k"]: r["proto"] for r in wire.collect()}
    assert rows[2] is None and rows[3] is None
    assert rows[1] is not None and rows[4] is not None
    back = decode_proto_bytes(
        wire, "proto", mt, ProtarrowSparkConfig(),
        keep_cols=["src_k"], on_error="null",
    )
    got = {r["src_k"]: (r["k"], r["u"]) for r in back.collect()}
    assert got[1] == (1, 7) and got[4] == (4, 4294967295)
    assert got[2] == (None, None) and got[3] == (None, None)


def test_encode_strict_raises_on_contract_violation(spark):
    """Default strict mode keeps the old kill-the-task contract."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from protarrow_spark.config import ProtarrowSparkConfig
    from protarrow_spark.conversion.distributed import encode_proto_bytes
    from protarrow_spark.proto.model import Field, Kind, MessageType

    mt = MessageType("t.StrictEnc", (Field("u", 1, Kind.UINT32),))
    df = spark.createDataFrame([(2**33,)], "u long")
    with pytest.raises((Py4JJavaError, Exception)):
        encode_proto_bytes(df, mt, ProtarrowSparkConfig()).collect()
