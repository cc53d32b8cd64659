"""cast_dataframe (schema conformance) tests — reference behaviors
from ``cast_to_proto.py`` + ``tests/test_coverage.py:345-369``:
column reorder/drop, missing-column synthesis, default null-fill,
recursive casts, enum renderings, list-as-map both directions."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import cast_dataframe, dataframe_to_messages
from protarrow_spark.proto import fixtures
from protarrow_spark.proto.message import Message
from protarrow_spark.proto.model import (
    TIMESTAMP,
    Field,
    Kind,
    MessageType,
    map_field,
)

CFG = ProtarrowSparkConfig()

TARGET = MessageType(
    "t.Target",
    (
        Field("id", 1, Kind.INT64),
        Field("name", 2, Kind.STRING),
        Field("score", 3, Kind.DOUBLE),
        Field("opt", 4, Kind.INT32, optional=True),
        Field("color", 5, Kind.ENUM, enum=fixtures.COLOR),
        Field("tags", 6, Kind.STRING, repeated=True),
        map_field("attrs", 7, Kind.STRING, Kind.INT64),
        Field("nested", 8, Kind.MESSAGE, message=fixtures.NESTED),
        Field("ts", 9, Kind.MESSAGE, message=TIMESTAMP),
    ),
)


def test_reorder_drop_synthesize_and_cast(spark) -> None:
    # misshapen: wrong order, extra column, id as int, score as string,
    # missing: opt/color/tags/attrs/nested/ts
    df = spark.createDataFrame(
        [("0.5", 1, "x", "junk")], "score string, id int, name string, extra string"
    )
    out = cast_dataframe(df, TARGET, CFG)
    assert [f.name for f in out.schema.fields] == [
        "id", "name", "score", "opt", "color", "tags", "attrs", "nested", "ts",
    ]
    assert out.schema["id"].dataType == T.LongType()
    assert out.schema["score"].dataType == T.DoubleType()
    row = out.collect()[0]
    assert row["id"] == 1 and row["score"] == 0.5
    assert row["opt"] is None, "missing presence field -> null"
    assert row["color"] == 0, "missing plain enum -> default 0"
    assert row["tags"] == [] and row["attrs"] == {}
    assert row["nested"] is None and row["ts"] is None


def test_null_fill_non_presence_defaults(spark) -> None:
    df = spark.createDataFrame(
        [(None, None, None)],
        T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("name", T.StringType(), True),
                T.StructField("score", T.DoubleType(), True),
            ]
        ),
    )
    row = cast_dataframe(df, TARGET, CFG).collect()[0]
    assert row["id"] == 0 and row["name"] == "" and row["score"] == 0.0


def test_enum_number_to_name_and_back(spark) -> None:
    cfg = ProtarrowSparkConfig(enum_type="string")
    df = spark.createDataFrame([(2,), (99,)], "color int")
    rows = cast_dataframe(df, TARGET, cfg).select("color").collect()
    assert [r["color"] for r in rows] == ["GREEN", "COLOR_UNSPECIFIED"]

    df2 = spark.createDataFrame([("BLUE",), ("NOPE",)], "color string")
    rows2 = cast_dataframe(df2, TARGET, CFG).select("color").collect()
    assert [r["color"] for r in rows2] == [3, 0]


def test_array_and_map_value_casts(spark) -> None:
    df = spark.createDataFrame(
        [([1, 2], {"a": "10"})], "tags array<int>, attrs map<string,string>"
    )
    row = cast_dataframe(df, TARGET, CFG).collect()[0]
    assert row["tags"] == ["1", "2"]
    assert row["attrs"] == {"a": 10}


def test_list_as_map_source_to_map(spark) -> None:
    df = spark.createDataFrame(
        [([("k", 5)],)],
        T.StructType(
            [
                T.StructField(
                    "attrs",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("key", T.StringType()),
                                T.StructField("value", T.IntegerType()),
                            ]
                        )
                    ),
                )
            ]
        ),
    )
    row = cast_dataframe(df, TARGET, CFG).collect()[0]
    assert row["attrs"] == {"k": 5}


def test_map_source_to_list_as_map(spark) -> None:
    cfg = ProtarrowSparkConfig(map_as_list=True)
    df = spark.createDataFrame([({"k": 5},)], "attrs map<string,long>")
    out = cast_dataframe(df, TARGET, cfg)
    assert isinstance(out.schema["attrs"].dataType, T.ArrayType)
    assert out.collect()[0]["attrs"] == [("k", 5)]


def test_nested_struct_missing_subfield_and_null(spark) -> None:
    df = spark.createDataFrame(
        [((7,),), (None,)],
        T.StructType(
            [
                T.StructField(
                    "nested",
                    T.StructType([T.StructField("nested_int", T.IntegerType())]),
                    True,
                )
            ]
        ),
    )
    rows = cast_dataframe(df, TARGET, CFG).select("nested").collect()
    assert rows[0]["nested"]["nested_int"] == 7
    assert rows[0]["nested"]["nested_text"] == "", "missing subfield default-filled"
    assert rows[1]["nested"] is None, "null struct stays null (presence mask)"


def test_timestamp_cast_from_string(spark) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([("2024-01-02 03:04:05",)], "ts string")
    row = cast_dataframe(df, TARGET, CFG).collect()[0]
    assert row["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_cast_then_decode(spark) -> None:
    df = spark.createDataFrame(
        [(1, "a", 2), (2, "b", 0)], "id int, name string, color int"
    )
    msgs = dataframe_to_messages(cast_dataframe(df, TARGET, CFG), TARGET, CFG)
    assert msgs[0] == Message(
        TARGET, id=1, name="a", score=0.0, color=2, tags=[], attrs={}
    )


def test_cast_is_zero_shuffle_projection(spark) -> None:
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    plan = (
        cast_dataframe(df, TARGET, CFG)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_field_number_metadata_carried(spark) -> None:
    cfg = ProtarrowSparkConfig(field_number_key="PARQUET:field_id")
    df = spark.createDataFrame([(1,)], "id int")
    out = cast_dataframe(df, TARGET, cfg)
    assert out.schema["id"].metadata["PARQUET:field_id"] == 1
    assert out.schema["ts"].metadata["PARQUET:field_id"] == 9
