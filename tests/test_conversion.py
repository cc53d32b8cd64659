"""Conversion-layer tests: encode, decode, round-trip, special
semantics (mirrors the reference's ``tests/test_conversion.py``
strategy at unit scale; the full random-matrix harness lives in
``tests/test_roundtrip.py``)."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import (
    MessageExtractor,
    dataframe_to_messages,
    messages_to_dataframe,
    messages_to_rows,
    rows_to_messages,
)
from protarrow_spark.conversion.encode import DATE_SENTINEL
from protarrow_spark.proto import fixtures
from protarrow_spark.proto.message import Message
from protarrow_spark.proto.model import (
    DATE,
    DOUBLE_VALUE,
    DURATION,
    EMPTY,
    INT64_VALUE,
    STRING_VALUE,
    TIME_OF_DAY,
    TIMESTAMP,
    Field,
    Kind,
    MessageType,
    map_field,
)

UTC = datetime.timezone.utc
CFG = ProtarrowSparkConfig()

SIMPLE = MessageType(
    "t.Simple",
    (
        Field("id", 1, Kind.INT64),
        Field("name", 2, Kind.STRING),
        Field("score", 3, Kind.DOUBLE),
        Field("opt", 4, Kind.INT32, optional=True),
        Field("tags", 5, Kind.STRING, repeated=True),
        map_field("attrs", 6, Kind.STRING, Kind.INT64),
        Field("nested", 7, Kind.MESSAGE, message=fixtures.NESTED),
    ),
)


def _simple_messages() -> list[Message]:
    return [
        Message(
            SIMPLE,
            id=1,
            name="a",
            score=1.5,
            opt=0,
            tags=["x", "y"],
            attrs={"k": 7},
            nested=Message(fixtures.NESTED, nested_int=3, nested_text="n"),
        ),
        Message(SIMPLE, id=2),  # everything else default/absent
    ]


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def test_encode_rows_defaults_and_presence() -> None:
    rows = messages_to_rows(_simple_messages(), SIMPLE, CFG)
    full, empty = rows
    assert full == (1, "a", 1.5, 0, ["x", "y"], {"k": 7}, (3, "n"))
    # absent plain scalars -> defaults; absent presence fields -> None
    assert empty == (2, "", 0.0, None, [], {}, None)


def test_encode_dataframe_schema_and_values(spark) -> None:
    df = messages_to_dataframe(spark, _simple_messages(), SIMPLE, CFG)
    assert [f.name for f in df.schema.fields] == [
        "id", "name", "score", "opt", "tags", "attrs", "nested",
    ]
    out = {r["id"]: r for r in df.collect()}
    assert out[1]["nested"]["nested_int"] == 3
    assert out[2]["name"] == "" and out[2]["opt"] is None
    assert out[2]["tags"] == [] and out[2]["attrs"] == {}


def test_roundtrip_driver_side(spark) -> None:
    msgs = _simple_messages()
    df = messages_to_dataframe(spark, msgs, SIMPLE, CFG)
    back = dataframe_to_messages(df, SIMPLE, CFG)
    assert back == msgs


# ---------------------------------------------------------------------------
# WKT semantics
# ---------------------------------------------------------------------------

WKT_MSG = MessageType(
    "t.Wkt",
    (
        Field("ts", 1, Kind.MESSAGE, message=TIMESTAMP),
        Field("dur", 2, Kind.MESSAGE, message=DURATION),
        Field("d", 3, Kind.MESSAGE, message=DATE),
        Field("tod", 4, Kind.MESSAGE, message=TIME_OF_DAY),
        Field("empty", 5, Kind.MESSAGE, message=EMPTY),
        Field("wd", 6, Kind.MESSAGE, message=DOUBLE_VALUE),
        Field("wi", 7, Kind.MESSAGE, message=INT64_VALUE),
        Field("ws", 8, Kind.MESSAGE, message=STRING_VALUE),
    ),
)


def test_timestamp_truncates_nanos_to_micros() -> None:
    m = Message(WKT_MSG, ts=Message(TIMESTAMP, seconds=100, nanos=123_456_789))
    (row,) = messages_to_rows([m], WKT_MSG, CFG)
    assert row[0] == datetime.datetime(1970, 1, 1, 0, 1, 40, 123_456, tzinfo=UTC)
    back = rows_to_messages([row], WKT_MSG, CFG)[0]
    assert back.ts.seconds == 100 and back.ts.nanos == 123_456_000  # µs-truncated


def test_timestamp_long_nanos_lossless() -> None:
    cfg = ProtarrowSparkConfig(timestamp_type="long_nanos")
    m = Message(WKT_MSG, ts=Message(TIMESTAMP, seconds=-5, nanos=999_999_999))
    (row,) = messages_to_rows([m], WKT_MSG, cfg)
    assert row[0] == -5 * 1_000_000_000 + 999_999_999
    back = rows_to_messages([row], WKT_MSG, cfg)[0]
    assert back.ts == m.ts


def test_negative_duration_same_sign_normalization() -> None:
    m = Message(WKT_MSG, dur=Message(DURATION, seconds=-1, nanos=-500_000_000))
    (row,) = messages_to_rows([m], WKT_MSG, CFG)
    assert row[1] == datetime.timedelta(seconds=-1, microseconds=-500_000)
    back = rows_to_messages([row], WKT_MSG, CFG)[0]
    assert back.dur.seconds == -1 and back.dur.nanos == -500_000_000


def test_date_sentinel_roundtrip() -> None:
    unset = Message(WKT_MSG, d=Message(DATE))
    (row,) = messages_to_rows([unset], WKT_MSG, CFG)
    assert row[2] == DATE_SENTINEL
    back = rows_to_messages([row], WKT_MSG, CFG)[0]
    assert back.d.year == 0 and back.d.month == 0 and back.d.day == 0

    real = Message(WKT_MSG, d=Message(DATE, year=2024, month=2, day=29))
    (row2,) = messages_to_rows([real], WKT_MSG, CFG)
    assert row2[2] == datetime.date(2024, 2, 29)
    assert rows_to_messages([row2], WKT_MSG, CFG)[0].d == real.d


def test_time_of_day_nanos() -> None:
    tod = Message(TIME_OF_DAY, hours=13, minutes=30, seconds=5, nanos=42)
    m = Message(WKT_MSG, tod=tod)
    (row,) = messages_to_rows([m], WKT_MSG, CFG)
    assert row[3] == ((13 * 60 + 30) * 60 + 5) * 1_000_000_000 + 42
    assert rows_to_messages([row], WKT_MSG, CFG)[0].tod == tod


def test_wrappers_null_vs_default() -> None:
    m1 = Message(WKT_MSG, wd=Message(DOUBLE_VALUE), ws=Message(STRING_VALUE, value=""))
    (row,) = messages_to_rows([m1], WKT_MSG, CFG)
    assert row[5] == 0.0 and row[7] == ""  # set wrapper with default value
    m2 = Message(WKT_MSG)  # all wrappers absent
    (row2,) = messages_to_rows([m2], WKT_MSG, CFG)
    assert row2[5] is None and row2[6] is None and row2[7] is None
    back = rows_to_messages([row2], WKT_MSG, CFG)[0]
    assert not back.HasField("wd") and not back.HasField("ws")


def test_empty_message_presence() -> None:
    m = Message(WKT_MSG, empty=Message(EMPTY))
    (row,) = messages_to_rows([m], WKT_MSG, CFG)
    assert row[4] == ()
    back = rows_to_messages([row], WKT_MSG, CFG)[0]
    assert back.HasField("empty")
    absent = rows_to_messages(
        messages_to_rows([Message(WKT_MSG)], WKT_MSG, CFG), WKT_MSG, CFG
    )[0]
    assert not absent.HasField("empty")


# ---------------------------------------------------------------------------
# Enum / uint64 policies
# ---------------------------------------------------------------------------

ENUM_MSG = MessageType(
    "t.En",
    (
        Field("color", 1, Kind.ENUM, enum=fixtures.COLOR),
        Field("colors", 2, Kind.ENUM, repeated=True, enum=fixtures.COLOR),
        Field("big", 3, Kind.UINT64),
    ),
)


def test_enum_as_string_with_unknown_fallback() -> None:
    cfg = ProtarrowSparkConfig(enum_type="string")
    m = Message(ENUM_MSG, color=99, colors=[0, 2, 77])
    (row,) = messages_to_rows([m], ENUM_MSG, cfg)
    # unknown 99 renders as the first declared value
    assert row[0] == "COLOR_UNSPECIFIED"
    assert row[1] == ["COLOR_UNSPECIFIED", "GREEN", "COLOR_UNSPECIFIED"]
    back = rows_to_messages([row], ENUM_MSG, cfg)[0]
    assert back.color == 0 and back.colors == [0, 2, 0]  # fallback to 0


def test_enum_unknown_name_decodes_zero() -> None:
    cfg = ProtarrowSparkConfig(enum_type="string")
    back = rows_to_messages([("NOPE", [], 0)], ENUM_MSG, cfg)[0]
    assert back.color == 0


def test_uint64_decimal_policy(spark) -> None:
    big = 2**64 - 1
    m = Message(ENUM_MSG, big=big)
    (row,) = messages_to_rows([m], ENUM_MSG, CFG)
    assert row[2] == decimal.Decimal(big)
    df = messages_to_dataframe(spark, [m], ENUM_MSG, CFG)
    assert df.schema["big"].dataType == T.DecimalType(20, 0)
    assert dataframe_to_messages(df, ENUM_MSG, CFG)[0].big == big


def test_uint64_long_policy_wraps() -> None:
    cfg = ProtarrowSparkConfig(uint64_type="long")
    big = 2**64 - 1
    (row,) = messages_to_rows([Message(ENUM_MSG, big=big)], ENUM_MSG, cfg)
    assert row[2] == -1  # reinterpret
    assert rows_to_messages([row], ENUM_MSG, cfg)[0].big == big  # and back


# ---------------------------------------------------------------------------
# map_as_list / extractor / full matrix smoke
# ---------------------------------------------------------------------------


def test_map_as_list_roundtrip(spark) -> None:
    cfg = ProtarrowSparkConfig(map_as_list=True)
    msgs = _simple_messages()
    df = messages_to_dataframe(spark, msgs, SIMPLE, cfg)
    assert isinstance(df.schema["attrs"].dataType, T.ArrayType)
    assert dataframe_to_messages(df, SIMPLE, cfg) == msgs


def test_message_extractor_point_lookup(spark) -> None:
    msgs = _simple_messages()
    df = messages_to_dataframe(spark, msgs, SIMPLE, CFG)
    ex = MessageExtractor(SIMPLE, CFG)
    assert ex.read_dataframe_row(df, 1) == msgs[1]
    with pytest.raises(IndexError):
        ex.read_dataframe_row(df, 99)


def test_full_example_matrix_roundtrip(spark) -> None:
    mt = fixtures.EXAMPLE
    m = Message(
        mt,
        double_value=0.5,
        uint64_value=2**63 + 11,
        fixed64_value=2**64 - 3,
        sint32_value=-7,
        bytes_value=b"\x01\x02",
        string_values=["a", "b"],
        enum_value=3,
        timestamp_value=Message(TIMESTAMP, seconds=1_700_000_000, nanos=250_000),
        date_value=Message(DATE, year=2023, month=6, day=30),
        string_message_map={"k": Message(fixtures.NESTED, nested_int=1)},
        message_values=[Message(fixtures.NESTED, nested_text="t")],
    )
    df = messages_to_dataframe(spark, [m, Message(mt)], mt, CFG)
    back = dataframe_to_messages(df, mt, CFG)
    assert back[0] == m
    assert back[1] == Message(mt)
