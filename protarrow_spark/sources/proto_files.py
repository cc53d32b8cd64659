"""Typed file sources for proto-shaped data.

The reference has no file readers — its tests feed line-delimited
proto-JSON through ``json_format.Parse`` (reference
``tests/test_conversion.py:99-105``) and its docs describe Kafka
proto-bytes ingest as an ecosystem pattern (``docs/faq.md:13-35``).
These sources make both first-class on Spark:

* :func:`read_proto_jsonl` — line-delimited proto-JSON with the
  derived schema applied AT THE SCAN (no inference pass, column
  pruning reaches the reader), conformed by the pure-Catalyst cast.
* :func:`read_proto_binary` — files of varint-length-delimited proto
  frames (the standard ``writeDelimitedTo`` stream layout), split per
  file on executors and decoded by the wire codec. Kafka-shaped
  ingest without a broker: the same ``decode_proto_bytes`` hot path.
* :func:`read_csv_typed` — header CSV conformed to a proto contract
  (string columns cast to descriptor types, missing fields
  synthesized, unknown columns dropped).

Scale notes: JSONL/CSV scans are Spark's native splittable readers —
pushdown and pruning come from Catalyst; the binary reader
parallelizes across files (one frame stream per file — matching the
format, which is not block-splittable).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion.cast import cast_dataframe
from protarrow_spark.conversion.distributed import decode_proto_bytes
from protarrow_spark.proto.model import MessageType
from protarrow_spark.schema import message_type_to_struct_type


def read_proto_jsonl(
    spark: SparkSession,
    path: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """Read line-delimited proto-JSON into the exact derived schema.

    The derived ``StructType`` is handed to the JSON scan (no schema
    inference job), then :func:`cast_dataframe` conforms the result —
    absent fields become proto defaults / nulls per presence rules,
    exactly as the reference's ``json_format.Parse`` + encode path
    would produce.

    Limitation (documented): proto-JSON 64-bit-as-string and
    base64-bytes renderings follow Spark's JSON coercion rules, not
    ``json_format``'s; numeric and nested fields round-trip exactly.
    """
    raw_schema = _lenient_json_schema(message_type_to_struct_type(mtype, config))
    raw = spark.read.schema(raw_schema).json(path)
    return cast_dataframe(raw, mtype, config)


def _lenient_json_schema(struct: T.StructType) -> T.StructType:
    """The scan schema: every leaf nullable (JSON may omit any field);
    structure (nesting, arrays, maps) is kept so pruning works."""
    def loosen(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, loosen(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(loosen(dt.elementType), True)
        if isinstance(dt, T.MapType):
            return T.MapType(dt.keyType, loosen(dt.valueType), True)
        return dt

    return loosen(struct)  # type: ignore[return-value]


def read_proto_binary(
    spark: SparkSession,
    path: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """Read varint-length-delimited proto frame files into typed
    columns (``writeDelimitedTo`` layout: each message prefixed by its
    varint byte length).

    Frames are split per file with one ``mapInPandas`` pass emitting a
    binary column, then decoded by the shared wire-codec hot path
    (:func:`decode_proto_bytes`) — the same plan shape as Kafka
    ingest, so a broker swap changes only the scan node.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def split_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            frames: list[bytes] = []
            for fpath, blob in zip(batch["path"].values, batch["content"].values):
                data = bytes(blob)
                pos = 0
                while pos < len(data):
                    length = 0
                    shift = 0
                    while True:
                        if pos >= len(data):
                            raise ValueError(
                                f"{fpath}: truncated varint length prefix at "
                                f"byte {pos}"
                            )
                        # Varints are at most 64 bits (10 bytes); unbounded
                        # continuation bits mean corrupt framing, not data.
                        if shift >= 64:
                            raise ValueError(
                                f"{fpath}: malformed varint (>10 continuation "
                                f"bytes) near byte {pos}"
                            )
                        b = data[pos]
                        pos += 1
                        length |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                    if pos + length > len(data):
                        raise ValueError(
                            f"{fpath}: frame of {length} bytes at offset {pos} "
                            f"overruns file end ({len(data)} bytes) — corrupt "
                            f"length prefix or truncated file"
                        )
                    frames.append(data[pos : pos + length])
                    pos += length
            yield pd.DataFrame({"proto": frames})

    framed = files.mapInPandas(split_frames, "proto binary")
    return decode_proto_bytes(framed, "proto", mtype, config)


def read_csv_typed(
    spark: SparkSession,
    path: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """Read a header CSV and conform it to the proto contract: every
    descriptor field cast to its exact type, unknown columns dropped,
    missing fields synthesized with proto defaults — the reference's
    ``cast_table`` semantics applied at the ingest edge.

    Only scalar fields can come from CSV (flat format); nested /
    repeated fields are synthesized as absent.
    """
    raw = spark.read.option("header", "true").csv(path)
    return cast_dataframe(raw, mtype, config)


def read_jsonl_typed(
    spark: SparkSession,
    path: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """Read JSON-lines (one object per line) and conform to the proto
    contract. Unlike :func:`read_proto_jsonl` (which parses proto-JSON
    notation field-by-field in Python), this uses Spark's native JSON
    reader with the contract's schema as the read schema — fully
    JVM-side, scan-parallel — then applies the cast for defaults and
    exact types. Missing fields synthesize as proto defaults, unknown
    fields are dropped by the read schema itself (never parsed)."""
    from protarrow_spark.schema import message_type_to_schema

    target = message_type_to_schema(mtype, config)
    raw = spark.read.schema(target).json(path)
    return cast_dataframe(raw, mtype, config)


def read_orc_typed(
    spark: SparkSession,
    path: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """Read ORC (Spark-bundled columnar format) and conform to the
    proto contract — same cast semantics as the parquet/CSV edges;
    ORC predicate pushdown and column pruning apply as with parquet."""
    raw = spark.read.orc(path)
    return cast_dataframe(raw, mtype, config)
